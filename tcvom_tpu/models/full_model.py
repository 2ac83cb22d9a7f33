"""Task-level wrappers: on-device preprocessing, trimap synthesis, loss
stacks and the train/eval forward drivers.

Functional re-design of reference models/model.py (FullModel :15-246,
FullModel_VMD :248-357, EvalModel :359-453). Composition
(img = fg*a + bg*(1-a)), BGR->RGB flip, normalization and random-width
trimap generation all happen on-device inside the jitted step, exactly like
the reference runs them inside forward on the GPU.

Tensors are ``[B, S, H, W, C]`` float32 in [0, 255], BGR channel order
(straight from the cv2-based loader).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from tcvom_tpu.models import registry
from tcvom_tpu.ops import losses as L
from tcvom_tpu.ops.distance import trimap_transform
from tcvom_tpu.ops.image import avg_pool, dilate_by_radius, unfold

IMG_SCALE = 1.0 / 255.0
IMG_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMG_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    model: str                    # e.g. 'vmn_fba', 'dim'
    agg_window: int = 7
    agg_reduction: int = 1
    freeze_backbone: bool = False
    dilate_radius: int | None = None   # fixed trimap dilation; None = random
    eps: float = 0.0                   # alpha snapping for pretrain (1e-2)
    att_thres: float = 0.3
    label_smooth: float = 0.2
    fba_loss_normalize: bool = True

    @property
    def method(self) -> str:
        return registry.method_of(self.model)

    @property
    def trimap_channels(self) -> int:
        return registry.TRIMAP_CHANNEL_DICT[self.method]

    @property
    def is_vmn(self) -> bool:
        return self.model.startswith("vmn")


# ---------------------------------------------------------------------------
# Preprocessing (reference models/model.py:54-92)
# ---------------------------------------------------------------------------

def make_trimap(key: jax.Array, alpha: jnp.ndarray, cfg: TaskConfig
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """alpha: [B, S, H, W, 1] in [0,1]. Returns (trimap encoding
    [B, S, H, W, trimap_channels], trimask [B, S, H, W, 1] dilated unknown
    region). Random per-sample dilation radius 0..25 unless fixed."""
    b = alpha.shape[0]
    if cfg.eps > 0:
        alpha = jnp.where(alpha < cfg.eps, 0.0, alpha)
        alpha = jnp.where(alpha > 1 - cfg.eps, 1.0, alpha)
    trimask = ((alpha > 0) & (alpha < 1.0)).astype(alpha.dtype)
    if cfg.dilate_radius is None:
        radius = jax.random.randint(key, (b,), 0, 26)
        trimap = dilate_by_radius(trimask, radius, max_radius=25)
    else:
        # static radius: separable two-pass dilation
        trimap = dilate_by_radius(trimask, int(cfg.dilate_radius))

    tc = cfg.trimap_channels
    if tc == 1:
        tri = jnp.where(trimap > 0.5, 128.0 * IMG_SCALE, alpha)
        return tri, trimap
    if tc == 3:
        tri1 = jnp.where(trimap > 0.5, 1.0, 2.0 * alpha).astype(jnp.int32)
        tri3 = jax.nn.one_hot(tri1[..., 0], 3, dtype=alpha.dtype)
        return tri3, trimap
    if tc == 8:
        tri1 = jnp.where(trimap > 0.5, 255.0, alpha)
        t2f = (tri1 == 1.0).astype(alpha.dtype)
        t2b = (tri1 == 0.0).astype(alpha.dtype)
        tri2 = jnp.concatenate([t2b, t2f], axis=-1)
        transformed = trimap_transform(tri2)
        return jnp.concatenate([transformed, tri2], axis=-1), trimap
    raise ValueError(tc)


def preprocess(key: jax.Array, a, fg, bg, cfg: TaskConfig):
    """Compose, normalize and synthesize trimaps (models/model.py:82-92).
    Runs under stop_gradient like the reference's ``torch.no_grad()`` block
    (model.py:84) — no gradients flow into data synthesis (and the EDT's
    iterative min-plus machinery never enters the backward graph)."""
    scaled_gts = a * IMG_SCALE
    scaled_fgs = fg[..., ::-1] * IMG_SCALE        # BGR -> RGB
    scaled_bgs = bg[..., ::-1] * IMG_SCALE
    scaled_imgs = scaled_fgs * scaled_gts + scaled_bgs * (1.0 - scaled_gts)
    tris, trimasks = make_trimap(key, scaled_gts, cfg)
    imgs = (scaled_imgs - IMG_MEAN) / IMG_STD
    return jax.lax.stop_gradient(
        dict(scaled_imgs=scaled_imgs, scaled_fgs=scaled_fgs,
             scaled_bgs=scaled_bgs, scaled_gts=scaled_gts,
             tris=tris, trimasks=trimasks, imgs=imgs))


def preprocess_eval(img, tri, cfg: TaskConfig):
    """EvalModel preprocessing from real trimap images
    (models/model.py:360-387). img/tri in [0,255], img BGR.

    Contract (same as the reference): ``tri`` must be a hard uint8-origin
    trimap whose fg/bg pixels are exactly 255/0 — the 8-channel (fba) path
    derives the fg/bg planes by exact equality on tri/255 like the
    reference's ``trimap[:, 1:2] == 1`` (models/model.py:371-376). An
    anti-aliased or rescaled trimap would silently classify near-fg/bg
    pixels as unknown; threshold it to {0, 128, 255} before calling."""
    scaled_imgs = img[..., ::-1] * IMG_SCALE
    imgs = (scaled_imgs - IMG_MEAN) / IMG_STD
    scaled_tris = tri * IMG_SCALE
    trimask = ((scaled_tris > 0) & (scaled_tris < 1)).astype(jnp.float32)
    if cfg.dilate_radius is not None:
        # static radius: separable two-pass dilation
        trimask = dilate_by_radius(trimask, int(cfg.dilate_radius))
    tc = cfg.trimap_channels
    if tc == 1:
        tris = scaled_tris
    elif tc == 3:
        tri1 = jnp.where(trimask > 0.5, 1.0, 2.0 * scaled_tris).astype(jnp.int32)
        tris = jax.nn.one_hot(tri1[..., 0], 3, dtype=jnp.float32)
    elif tc == 8:
        t2f = (scaled_tris == 1.0).astype(jnp.float32)
        t2b = (scaled_tris == 0.0).astype(jnp.float32)
        tri2 = jnp.concatenate([t2b, t2f], axis=-1)
        tris = jnp.concatenate([trimap_transform(tri2), tri2], axis=-1)
    return dict(scaled_imgs=scaled_imgs, tris=tris, trimasks=trimask, imgs=imgs)


# ---------------------------------------------------------------------------
# Losses (reference models/model.py:94-197, 286-345)
# ---------------------------------------------------------------------------

def single_image_losses(cfg, preds, pre, start, end):
    """Per-frame L_alpha / L_comp / L_grad for non-FBA methods
    (models/model.py:94-127). Returns losses + refined alphas and comps
    with endpoints zeroed."""
    gts, fgs, bgs, imgs = (pre["scaled_gts"], pre["scaled_fgs"],
                           pre["scaled_bgs"], pre["scaled_imgs"])
    tm = pre["trimasks"]
    s = preds.shape[1]
    l_alpha, l_comp, l_grad = [], [], []
    alphas = [None] * s
    comps = [None] * s
    for c in range(start, end):
        mask = tm[:, c]
        refine = jnp.where(mask > 0.5, preds[:, c], gts[:, c])
        comp = fgs[:, c] * refine + bgs[:, c] * (1.0 - refine)
        alphas[c] = refine
        comps[c] = comp
        l_alpha.append(L.l1_mask(refine, gts[:, c], mask))
        if cfg.method != "gca":
            l_comp.append(L.l1_mask(comp, imgs[:, c], mask))
            l_grad.append(L.l1_grad(refine, gts[:, c], mask))
    loss_a = sum(l_alpha) / len(l_alpha)
    if cfg.method == "gca":
        loss_c = jnp.zeros_like(loss_a)
        loss_g = jnp.zeros_like(loss_a)
    else:
        loss_c = sum(l_comp) / len(l_comp)
        loss_g = sum(l_grad) / len(l_grad)
    zero_a = jnp.zeros_like(alphas[start])
    zero_c = jnp.zeros_like(comps[start])
    for i in range(s):
        if alphas[i] is None:
            alphas[i] = zero_a
            comps[i] = zero_c
    alphas = jnp.clip(jnp.stack(alphas, 1), 0, 1)
    comps = jnp.clip(jnp.stack(comps, 1), 0, 1)
    return loss_a, loss_c, loss_g, alphas, comps


def fba_single_image_losses(cfg, preds, pre, start, end):
    """FBA composite losses (models/model.py:129-197): preds [B,S,H,W,7].
    Returns (L_alpha_comp, L_lap, L_grad, alphas, comps, Fs, Bs)."""
    gts, fgs, bgs, imgs = (pre["scaled_gts"], pre["scaled_fgs"],
                           pre["scaled_bgs"], pre["scaled_imgs"])
    tm = pre["trimasks"]
    nrm = cfg.fba_loss_normalize
    s = preds.shape[1]
    alpha_p = preds[..., 0:1]
    f_p = preds[..., 1:4]
    b_p = preds[..., 4:7]
    l_ac, l_lap, l_grad = [], [], []
    alphas, comps, fs, bs = [None] * s, [None] * s, [None] * s, [None] * s
    for c in range(start, end):
        mask = tm[:, c] > 0.5
        refine = jnp.where(mask, alpha_p[:, c], gts[:, c])
        cf = jnp.where(mask, f_p[:, c], fgs[:, c])
        cb = jnp.where(mask, b_p[:, c], bgs[:, c])
        alphas[c] = refine
        comps[c] = cf * refine + cb * (1.0 - refine)
        fs[c], bs[c] = cf, cb

        l_a1 = L.l1_mask(refine, gts[:, c], normalize=nrm)
        ac = cf * gts[:, c] + cb * (1.0 - gts[:, c])
        l_acomp = L.l1_mask(ac, imgs[:, c], normalize=nrm)
        fbc = fgs[:, c] * refine + bgs[:, c] * (1.0 - refine)
        l_fbc = L.l1_mask(fbc, imgs[:, c], normalize=nrm)
        l_fb1 = (L.l1_mask(cf, fgs[:, c], normalize=nrm)
                 + L.l1_mask(cb, bgs[:, c], normalize=nrm))
        l_ac.append(l_a1 + l_acomp + 0.25 * (l_fbc + l_fb1))

        l_ag = L.l1_grad(refine, gts[:, c], normalize=nrm)
        l_excl = L.exclusion_loss(cf, cb, level=3, normalize=nrm)
        l_grad.append(l_ag + 0.25 * l_excl)

        l_alap = L.lap_loss(refine, gts[:, c], normalize=nrm)
        l_flap = L.lap_loss(cf, fgs[:, c], normalize=nrm)
        l_blap = L.lap_loss(cb, bgs[:, c], normalize=nrm)
        l_lap.append(l_alap + 0.25 * (l_flap + l_blap))
    loss_ac = sum(l_ac) / len(l_ac)
    loss_lap = sum(l_lap) / len(l_lap)
    loss_g = sum(l_grad) / len(l_grad)
    zeros = {k: jnp.zeros_like(v[start]) for k, v in
             (("a", alphas), ("c", comps), ("f", fs), ("b", bs))}
    for i in range(s):
        if alphas[i] is None:
            alphas[i], comps[i] = zeros["a"], zeros["c"]
            fs[i], bs[i] = zeros["f"], zeros["b"]
    return (loss_ac, loss_lap, loss_g, jnp.stack(alphas, 1),
            jnp.stack(comps, 1), jnp.stack(fs, 1), jnp.stack(bs, 1))


def attention_loss(cfg, attb, attf, small_mask, scaled_gts, tam_os: int = 8):
    """L_att: BCE supervision of the FAM logits (models/model.py:286-321).

    attb/attf: [B, S-2, h, w, window^2] raw logits; small_mask
    [B, S-2, h, w, 1]; scaled_gts [B, S, H, W, 1].
    """
    b, s = scaled_gts.shape[0], scaled_gts.shape[1]
    win = cfg.agg_window
    eps_smooth = 1.0 - cfg.label_smooth
    terms = []
    for c in range(1, s - 1):
        j = c - 1
        bgt = avg_pool(scaled_gts[:, c - 1], tam_os, tam_os)
        fgt = avg_pool(scaled_gts[:, c + 1], tam_os, tam_os)
        cgt = avg_pool(scaled_gts[:, c], tam_os, tam_os)
        m = small_mask[:, j]                                  # [B, h, w, 1]
        cnt = jnp.sum(m)

        def bce_term(logits, neighbor_gt):
            # labels over the window neighborhood, zero-padded like F.unfold
            ngt = unfold(neighbor_gt, win)[..., 0]            # [B, h, w, P]
            lbl = (jnp.abs(cgt - ngt) < cfg.att_thres).astype(logits.dtype) * eps_smooth
            bce = jnp.maximum(logits, 0) - logits * lbl + jnp.log1p(
                jnp.exp(-jnp.abs(logits)))
            denom = jnp.maximum(cnt * win * win, 1.0)
            return jnp.sum(bce * m) / denom

        loss = 0.5 * (bce_term(attb[:, j], bgt) + bce_term(attf[:, j], fgt))
        terms.append(jnp.where(cnt > 0, loss, 0.0))
    return sum(terms) / len(terms)


def temporal_loss(cfg, alphas, gts, trimasks, fs=None, bs=None,
                  scaled_fgs=None, scaled_bgs=None):
    """L_dt temporal coherence for S>=5 (models/model.py:326-345)."""
    s = alphas.shape[1]

    def dt(pred, gt, normalize=True):
        terms = []
        for c in range(1, s - 2):
            dadt = pred[:, c] - pred[:, c + 1]
            dgdt = gt[:, c] - gt[:, c + 1]
            terms.append(L.l1_mask(dadt, dgdt, trimasks[:, c], normalize=normalize))
        return sum(terms) / len(terms)

    if s < 5:
        return jnp.zeros(())
    if cfg.method == "fba":
        nrm = cfg.fba_loss_normalize
        out = dt(alphas, gts, nrm)
        out = out + 0.25 * (dt(fs, scaled_fgs, nrm) + dt(bs, scaled_bgs, nrm))
        return out
    return dt(alphas, gts)


# ---------------------------------------------------------------------------
# Forward drivers
# ---------------------------------------------------------------------------

def _model_inputs(pre, cfg: TaskConfig):
    return jnp.concatenate([pre["imgs"], pre["tris"]], axis=-1)


def _fba_extras(pre, cfg: TaskConfig):
    return (pre["scaled_imgs"], pre["tris"][..., -2:])


def forward_single(module, variables, key, batch, cfg: TaskConfig,
                   train: bool, mutable=False):
    """FullModel forward (models/model.py:199-246): non-VMN archs run the
    center frame only; VMN archs (the TAM-pretrain configuration,
    pretrain_ddp.py) run the full temporal module over all frames with the
    trimap masks, supervising frames 1..S-2 — but WITHOUT the video-only
    L_att/L_dt terms (model.py:214-219 vs FullModel_VMD).
    Returns (losses dict, aux dict[, new state])."""
    a, fg, bg = batch["a"], batch["fg"], batch["bg"]
    s = a.shape[1]
    c = s // 2
    kp, kd = jax.random.split(key)
    pre = preprocess(kp, a, fg, bg, cfg)

    inputs = _model_inputs(pre, cfg)
    if cfg.is_vmn:
        extras = _fba_extras(pre, cfg) if cfg.method == "fba" else None
        out = module.apply(variables, inputs, pre["trimasks"], extras=extras,
                           train=train, mutable=mutable,
                           rngs={"dropout": kd} if train else None)
        if mutable:
            (preds, _, _, _), new_state = out
        else:
            (preds, _, _, _), new_state = out, None
        start, end = 1, s - 1
    else:
        extras = None
        if cfg.method == "fba":
            ex = _fba_extras(pre, cfg)
            extras = (ex[0][:, c], ex[1][:, c])
        out = module.apply(variables, inputs[:, c], extras=extras, train=train,
                           mutable=mutable,
                           rngs={"dropout": kd} if train else None)
        if mutable:
            pred_c, new_state = out
        else:
            pred_c, new_state = out, None
        preds = jnp.zeros(a.shape[:2] + pred_c.shape[1:], pred_c.dtype)
        preds = preds.at[:, c].set(pred_c)
        start, end = c, c + 1

    if cfg.method == "fba":
        l1, l2, l3, alphas, comps, fs, bs = fba_single_image_losses(
            cfg, preds, pre, start, end)
    else:
        l1, l2, l3, alphas, comps = single_image_losses(cfg, preds, pre,
                                                        start, end)
        fs, bs = pre["scaled_fgs"], pre["scaled_bgs"]
    losses = {"L1": l1, "L2": l2, "L3": l3}
    aux = dict(pre=pre, alphas=alphas, comps=comps, Fs=fs, Bs=bs)
    return losses, aux, new_state


def forward_vmd(module, variables, key, batch, cfg: TaskConfig,
                train: bool, mutable=False):
    """FullModel_VMD forward: full video loss stack
    (models/model.py:258-357)."""
    a, fg, bg = batch["a"], batch["fg"], batch["bg"]
    s = a.shape[1]
    kp, kd = jax.random.split(key)
    pre = preprocess(kp, a, fg, bg, cfg)

    inputs = _model_inputs(pre, cfg)
    extras = _fba_extras(pre, cfg) if cfg.method == "fba" else None
    out = module.apply(variables, inputs, pre["trimasks"], extras=extras,
                       train=train, mutable=mutable,
                       rngs={"dropout": kd} if train else None)
    if mutable:
        (preds, attb, attf, small_mask), new_state = out
    else:
        (preds, attb, attf, small_mask), new_state = out, None

    if cfg.method == "fba":
        l1, l2, l3, alphas, comps, fs, bs = fba_single_image_losses(
            cfg, preds, pre, 1, s - 1)
    else:
        l1, l2, l3, alphas, comps = single_image_losses(cfg, preds, pre, 1, s - 1)
        fs, bs = pre["scaled_fgs"], pre["scaled_bgs"]

    l_att = attention_loss(cfg, attb, attf, small_mask, pre["scaled_gts"])
    l_dt = temporal_loss(cfg, alphas, pre["scaled_gts"], pre["trimasks"],
                         fs, bs, pre["scaled_fgs"], pre["scaled_bgs"])
    losses = {"L1": l1, "L2": l2, "L3": l3, "L_dt": l_dt, "L_att": l_att}
    aux = dict(pre=pre, alphas=alphas, comps=comps, Fs=fs, Bs=bs)
    return losses, aux, new_state


def forward_eval(module, variables, imgs, tris, cfg: TaskConfig):
    """EvalModel forward from real trimaps (models/model.py:389-453).

    imgs: [B, S, H, W, 3] BGR 0-255; tris: [B, S, H, W, 1] 0-255.
    Returns alphas [B, S, H, W, 1] (and F, B for FBA) with gt trimap values
    pasted outside the unknown region.
    """
    s = imgs.shape[1]
    c = s // 2
    pre = preprocess_eval(imgs, tris, cfg)
    inputs = jnp.concatenate([pre["imgs"], pre["tris"]], axis=-1)

    if not cfg.is_vmn:
        extras = None
        if cfg.method == "fba":
            extras = (pre["scaled_imgs"][:, c], pre["tris"][:, c, ..., -2:])
        pred_c = module.apply(variables, inputs[:, c], extras=extras, train=False)
        preds = jnp.zeros(imgs.shape[:2] + pred_c.shape[1:], pred_c.dtype)
        preds = preds.at[:, c].set(pred_c)
        start, end = c, c + 1
    else:
        extras = ((pre["scaled_imgs"], pre["tris"][..., -2:])
                  if cfg.method == "fba" else None)
        preds, _, _, _ = module.apply(variables, inputs, pre["trimasks"],
                                      extras=extras, train=False)
        start, end = 1, s - 1

    tm = pre["trimasks"]
    gt_tri = tris * IMG_SCALE
    outs_a = []
    if cfg.method == "fba":
        outs_f, outs_b = [], []
    for i in range(s):
        if start <= i < end:
            mask = tm[:, i] > 0.5
            outs_a.append(jnp.where(mask, preds[:, i, ..., 0:1], gt_tri[:, i]))
            if cfg.method == "fba":
                outs_f.append(jnp.where(mask, preds[:, i, ..., 1:4],
                                        pre["scaled_imgs"][:, i]))
                outs_b.append(jnp.where(mask, preds[:, i, ..., 4:7],
                                        pre["scaled_imgs"][:, i]))
        else:
            outs_a.append(jnp.zeros_like(gt_tri[:, i]))
            if cfg.method == "fba":
                z3 = jnp.zeros_like(pre["scaled_imgs"][:, i])
                outs_f.append(z3)
                outs_b.append(z3)
    alphas = jnp.stack(outs_a, 1)
    if cfg.method == "fba":
        return alphas, jnp.stack(outs_f, 1), jnp.stack(outs_b, 1)
    return alphas
