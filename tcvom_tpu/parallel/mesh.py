"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's NCCL process-group machinery (train_ddp.py:199-204, 270-280;
utils/utils.py:41-59).

Design: a 1-D ``data`` mesh (optionally x ``space`` for sharding the H axis
of 1080p activations at inference). Under jit + GSPMD:

- gradient all-reduce (DDP buckets)      -> automatic from sharded batch
- SyncBatchNorm stat all-reduce          -> automatic: BN reduces over the
                                            global (sharded) batch axis
- scalar loss all-reduce (reduce_tensor) -> jnp.mean of a sharded scalar
- DistributedSampler                     -> process-strided host loader
- barriers                               -> not needed (single controller)
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(devices: Sequence[Any] | None = None, space: int = 1) -> Mesh:
    """1-D data mesh over all devices, or 2-D (data, space) when ``space``>1
    to co-shard the image height axis for very large frames."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % space == 0, (n, space)
    arr = np.array(devices).reshape(n // space, space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh, ndim: int, space_axis: int | None = None
                   ) -> NamedSharding:
    """Shard dim 0 over 'data' (and optionally one spatial dim over 'space')."""
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    if space_axis is not None and mesh.shape[SPACE_AXIS] > 1:
        spec[space_axis] = SPACE_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch pytree with dim-0 sharded over 'data'.

    Multi-process: each process passes its PER-PROCESS batch slice (the
    loader's shard) and the global array is assembled across processes —
    the analog of DDP's per-rank batches. ``jax.device_put`` would instead
    treat the local array as the full global value, silently feeding every
    process the wrong samples."""
    multiproc = jax.process_count() > 1

    def put(x):
        s = batch_sharding(mesh, np.ndim(x))
        if multiproc:
            return jax.make_array_from_process_local_data(s, np.asarray(x))
        return jax.device_put(x, s)
    return jax.tree.map(put, batch)


def local_data(x) -> np.ndarray:
    """Fetch this process's slice of a global batch-sharded array (the
    addressable shards, concatenated along dim 0) — for host-side output
    like image dumps, where the reference wrote rank-0's local batch."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        shards = sorted(x.addressable_shards,
                        key=lambda sh: sh.index[0].start or 0)
        return np.concatenate([np.asarray(sh.data) for sh in shards], axis=0)
    return np.asarray(x)


def pad_shard_batch(batch, mesh: Mesh, space_axis: int | None = None):
    """Pad dim 0 up to a multiple of the data-axis size (repeating the last
    sample) and shard over 'data' (and optionally one spatial dim over
    'space' — the H axis of 1080p activations; GSPMD inserts the conv
    halos). Returns (device batch, real batch size).

    The multi-device inference tools use this where the reference used
    nn.DataParallel scatter/gather (pred_vmn.py:85) — every chip computes
    a slice of the batch; callers slice outputs back to the real size.
    """
    n = mesh.shape[DATA_AXIS]
    b = int(next(iter(jax.tree.leaves(batch))).shape[0])
    pad = (-b) % n
    if pad:
        batch = jax.tree.map(
            lambda x: np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], 0),
            batch)

    def put(x):
        sa = space_axis if space_axis is not None and np.ndim(x) > space_axis \
            else None
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x), sa))

    return jax.tree.map(put, batch), b


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/state) over the mesh. In
    multi-process, every process passes the same host values (same seed /
    same checkpoint) and the global replicated arrays are assembled from
    the identical local copies."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
