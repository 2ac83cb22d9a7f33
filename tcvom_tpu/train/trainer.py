"""Unified training driver over the three reference trainers
(train_ddp.py, train_single_ddp.py, pretrain_ddp.py).

TPU-native structure: one jitted ``train_step`` over a ``Mesh('data')`` —
the sharded batch makes XLA insert the gradient all-reduces (the DDP
bucket equivalent) and synchronize BatchNorm statistics (the SyncBatchNorm
equivalent) automatically; no process groups, no barriers.

Loss mixes:
- video (train_ddp.py:61):   L1 + L2 + L3 + 0.5*L_dt + 0.25*L_att
- single (train_single_ddp.py:66, pretrain_ddp.py:65): L1 + L2 + L3
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from tcvom_tpu.models import full_model as FM
from tcvom_tpu.models import registry
from tcvom_tpu.train.state import TrainState

# Decoder submodules that belong to the feature-extraction half (frozen
# together with the encoder under FREEZE_BACKBONE; reference sets them to
# eval() and keeps them out of the optimizer: VMN_DIM.py:102-108 etc.)
_FROZEN_DECODER_PREFIXES = {
    "dim": ("dconv6", "dconv5", "dconv4"),
    "gca": ("layer1", "layer2", "gca"),
    "fba": ("ppm", "up1_0", "up1_1"),
    "index": ("decoder_layer6", "decoder_layer5", "decoder_layer4"),
}


def trainable_mask(params, model_name: str, freeze_backbone: bool):
    """True for params the optimizer should update (the reference's
    requires_grad filtering, train_ddp.py:285-291)."""
    method = registry.method_of(model_name)
    frozen_dec = _FROZEN_DECODER_PREFIXES.get(method, ())

    def decide(path_tuple) -> bool:
        if not freeze_backbone:
            return True
        path = "/".join(str(getattr(p, "key", p)) for p in path_tuple)
        if path.startswith("encoder/"):
            return False
        if path.startswith("decoder/"):
            sub = path[len("decoder/"):]
            if any(sub.startswith(pref) for pref in frozen_dec):
                return False
        return True

    return jax.tree_util.tree_map_with_path(lambda p, _: decide(p), params)


def make_lr_schedule(strategy: str, base_lr: float, total_iters: int):
    """'poly' (power 0.9) or 'const' (reference utils/utils.py:185-202)."""
    if strategy == "poly":
        return optax.polynomial_schedule(init_value=base_lr, end_value=0.0,
                                         power=0.9, transition_steps=total_iters)
    if strategy == "const":
        return lambda _: base_lr
    raise ValueError(strategy)


def make_optimizer(name: str, lr_schedule, weight_decay: float, mask=None):
    """adam/adamw/sgd with torch-compatible weight-decay placement
    (OPT_DICT, utils/utils.py:193-197)."""
    if name == "adam":
        # torch Adam: L2 term added to the gradient before the moments
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_learning_rate(lr_schedule))
    elif name == "adamw":
        tx = optax.adamw(lr_schedule, weight_decay=weight_decay)
    elif name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(lr_schedule))
    else:
        raise ValueError(name)
    if mask is not None:
        tx = optax.masked(tx, mask)
    return tx


LOSS_WEIGHTS_VMD = {"L1": 1.0, "L2": 1.0, "L3": 1.0, "L_dt": 0.5, "L_att": 0.25}
LOSS_WEIGHTS_SINGLE = {"L1": 1.0, "L2": 1.0, "L3": 1.0}


class MattingTrainer:
    """Builds the model + optimizer and exposes jitted train/eval steps.

    ``driver`` selects the task wrapper: 'vmd' (FullModel_VMD) or 'single'
    (FullModel — used by both the single-frame baseline trainer and the
    TAM pretrain trainer).
    """

    def __init__(self, task_cfg: FM.TaskConfig, driver: str,
                 optimizer: str = "adam", lr_strategy: str = "const",
                 base_lr: float = 5e-4, weight_decay: float = 1e-4,
                 total_iters: int = 100_000, remat: bool = False,
                 compute_dtype=None):
        """``compute_dtype=jnp.bfloat16`` enables mixed-precision training:
        master weights, optimizer moments, and BN/EMA statistics stay f32;
        params and the batch are cast to bf16 inside the step so the
        forward/backward run on bf16 MXU paths (grads return f32 through
        the cast's VJP). No loss scaling — bf16 keeps f32's exponent range.
        Numerics guard: tools/validate_bf16_train.py."""
        self.cfg = task_cfg
        self.driver = driver
        self.compute_dtype = compute_dtype
        self.module = registry.build_model(
            task_cfg.model, agg_window=task_cfg.agg_window,
            agg_reduction=task_cfg.agg_reduction,
            freeze_backbone=task_cfg.freeze_backbone, remat=remat)
        self.lr_schedule = make_lr_schedule(lr_strategy, base_lr, total_iters)
        self._opt_name = optimizer
        self._weight_decay = weight_decay
        self.loss_weights = (LOSS_WEIGHTS_VMD if driver == "vmd"
                             else LOSS_WEIGHTS_SINGLE)
        self._forward = FM.forward_vmd if driver == "vmd" else FM.forward_single
        self.tx = None  # built at init_state (needs params for the mask)

    # -- initialization ----------------------------------------------------
    def init_state(self, key, sample_batch) -> TrainState:
        a = sample_batch["a"]
        b, s, h, w = a.shape[:4]
        cin = 3 + self.cfg.trimap_channels
        if self.cfg.is_vmn:
            x = jnp.zeros((b, s, h, w, cin))
            masks = jnp.ones((b, s, h, w, 1))
            extras = ((jnp.zeros((b, s, h, w, 3)), jnp.zeros((b, s, h, w, 2)))
                      if self.cfg.method == "fba" else None)
            variables = jax.jit(lambda: self.module.init(
                {"params": key, "dropout": key}, x, masks, extras=extras,
                train=False))()
        else:
            x = jnp.zeros((b, h, w, cin))
            extras = ((jnp.zeros((b, h, w, 3)), jnp.zeros((b, h, w, 2)))
                      if self.cfg.method == "fba" else None)
            variables = jax.jit(lambda: self.module.init(
                {"params": key, "dropout": key}, x, extras=extras,
                train=False))()
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        mask = trainable_mask(params, self.cfg.model, self.cfg.freeze_backbone)
        self.tx = make_optimizer(self._opt_name, self.lr_schedule,
                                 self._weight_decay, mask)
        opt_state = self.tx.init(params)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          model_state=model_state, opt_state=opt_state)

    # -- steps ---------------------------------------------------------------
    def _cast_compute(self, tree):
        """Float leaves -> compute dtype (identity when compute_dtype=None)."""
        if self.compute_dtype is None:
            return tree
        cd = self.compute_dtype
        return jax.tree.map(
            lambda a: a.astype(cd)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: TrainState, batch, rng):
        # False (not []) when the model has no mutable collections (e.g.
        # FBA: GroupNorm only) — flax returns a bare output then
        mutable_keys = list(state.model_state.keys()) or False
        batch = self._cast_compute(batch)
        f32_state = state.model_state

        def loss_fn(params):
            variables = {"params": self._cast_compute(params),
                         **self._cast_compute(f32_state)}
            losses, aux, new_state = self._forward(
                self.module, variables, rng, batch, self.cfg, train=True,
                mutable=mutable_keys)
            total = sum(self.loss_weights[k] * v for k, v in losses.items())
            return total, (losses, new_state)

        (total, (losses, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if self.compute_dtype is not None and new_state is not None:
            # updated BN/EMA stats come back in compute dtype; restore the
            # f32 master dtype (the moments themselves were computed from
            # bf16 batch stats — pinned by the train numerics guard)
            new_state = jax.tree.map(
                lambda new, old: new.astype(old.dtype), new_state, f32_state)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": total, **losses,
                   "lr": self.lr_schedule(state.step)}
        if new_state is None:        # no mutable collections in this model
            new_state = state.model_state
        return TrainState(step=state.step + 1, params=new_params,
                          model_state=new_state, opt_state=new_opt), metrics

    @functools.partial(jax.jit, static_argnums=0)
    def vis_step(self, state: TrainState, batch, rng):
        """Forward returning the visualization tensors for the periodic
        image dumps (reference write_image, train_ddp.py:27-38, 99-100)."""
        _, aux, _ = self._forward(self.module, state.variables, rng, batch,
                                  self.cfg, train=False)
        pre = aux["pre"]
        return {"pre": {"scaled_imgs": pre["scaled_imgs"],
                        "trimasks": pre["trimasks"],
                        "scaled_gts": pre["scaled_gts"]},
                "alphas": aux["alphas"], "comps": aux["comps"],
                "Fs": aux["Fs"], "Bs": aux["Bs"]}

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, state: TrainState, batch, rng):
        losses, aux, _ = self._forward(self.module, state.variables, rng,
                                       batch, self.cfg, train=False)
        total = sum(self.loss_weights[k] * v for k, v in losses.items())
        return {"loss": total, **losses}, aux["alphas"]

    @functools.partial(jax.jit, static_argnums=0)
    def val_dt_step(self, state: TrainState, batch, rng):
        """Validation L_dt indicator on PNG-quantized alphas — the on-device
        equivalent of the reference's /dev/shm PNG round-trip
        (train_ddp.py:102-169). S=3 at validation: L_dt uses frames 1..S-2
        against the center's neighbors via alpha differences.

        Also returns the center-frame (pred, tri-vis, gt) tensors so the
        caller can write the per-epoch visual triplets the reference's
        validate() saved (train_ddp.py:129-138)."""
        losses, aux, _ = self._forward(self.module, state.variables, rng,
                                       batch, self.cfg, train=False)
        alphas = jnp.round(aux["alphas"] * 255.0) / 255.0
        gts = aux["pre"]["scaled_gts"]
        tm = aux["pre"]["trimasks"]
        from tcvom_tpu.ops.losses import l1_mask
        s = alphas.shape[1]
        c = s // 2
        terms = [l1_mask(alphas[:, c] - alphas[:, c + d],
                         gts[:, c] - gts[:, c + d], tm[:, c])
                 for d in (-1, 1) if 0 <= c + d < s]
        tris_vis = jnp.where(tm[:, c] > 0.5, 128.0 / 255.0, gts[:, c])
        return sum(terms) / len(terms), (alphas[:, c], tris_vis, gts[:, c])
