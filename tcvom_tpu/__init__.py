"""tcvom-tpu: TPU-native video object matting framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of TCVOM
(yunkezhang/TCVOM, "Attention-guided Temporally Coherent Video Object
Matting", ACMMM 2021): four trimap-based matting backbones (DIM, IndexNet,
GCA, FBA), the TAM temporal aggregation module as a fused windowed
cross-frame attention, data-parallel training over a TPU mesh, sliding
window video inference, and on-device evaluation metrics.

Everything here is a new TPU-first design: NHWC layouts, static shapes,
dense masked attention instead of dynamic gathers, and GSPMD sharding in
place of NCCL process groups.
"""

__version__ = "0.1.0"
