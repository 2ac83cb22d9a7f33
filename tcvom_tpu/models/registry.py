"""Model zoo registry: name -> constructor (reference FullModel.ARCH_DICT,
models/model.py:16-21, and get_VMN_models, models/VMN/__init__.py:11-29)."""
from __future__ import annotations

from tcvom_tpu.models.dim import DeepMatting, DIMDecoderVMN, DIMEncoder
from tcvom_tpu.models.fba import FBA, FBADecoderVMN, FBAEncoder
from tcvom_tpu.models.gca import GCA, GCADecoderVMN, GCAEncoder
from tcvom_tpu.models.index import (IndexMatting, IndexMattingDecoderVMN,
                                    IndexMattingEncoder)
from tcvom_tpu.models.vmn import VMN

ARCH_DICT = {
    "gca": GCA,
    "dim": DeepMatting,
    "fba": FBA,
    "index": IndexMatting,
}

TRIMAP_CHANNEL_DICT = {"gca": 3, "dim": 1, "index": 1, "fba": 8}

# FAM channel width at the OS=8 split per backbone (reference VMN_DIM.py:99,
# VMN_GCA.py:15, VMN_FBA.py:9, VMN_Index.py:10)
FAM_CHANNELS = {"dim": 256, "gca": 128, "fba": 256, "index": 32}

_VMN_PARTS = {
    "dim": (DIMEncoder, DIMDecoderVMN),
    "gca": (GCAEncoder, GCADecoderVMN),
    "fba": (FBAEncoder, FBADecoderVMN),
    "index": (IndexMattingEncoder, IndexMattingDecoderVMN),
}


def method_of(model_name: str) -> str:
    """'vmn_fba' -> 'fba', 'dim' -> 'dim' (reference models/model.py:49)."""
    return model_name[model_name.rfind("_") + 1:]


def build_model(model_name: str, agg_window: int = 7, agg_reduction: int = 1,
                freeze_backbone: bool = False, remat: bool = False):
    """Construct the (unbound) flax module for a model name.

    ``remat=True`` wraps the encoder in ``nn.remat`` (jax.checkpoint):
    encoder activations are recomputed during the backward pass instead of
    stored — the TPU-native way to trade ~1/3 extra FLOPs for the memory
    that lets larger per-chip batches fit (param paths are unchanged).
    """
    from flax import linen as nn

    if model_name.startswith("vmn"):
        method = method_of(model_name)
        enc_cls, dec_cls = _VMN_PARTS[method]
        if remat:
            enc_cls = nn.remat(enc_cls, static_argnums=(2,))
        return VMN(encoder=enc_cls(), decoder=dec_cls(),
                   fam_channels=FAM_CHANNELS[method],
                   agg_window=agg_window, agg_reduction=agg_reduction,
                   freeze_backbone=freeze_backbone)
    return ARCH_DICT[model_name]()
