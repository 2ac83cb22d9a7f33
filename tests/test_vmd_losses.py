"""Golden tests for the VMD attention-supervision and temporal losses
against torch re-derivations of the reference semantics
(models/model.py:286-345)."""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tcvom_tpu.models.full_model import TaskConfig, attention_loss, temporal_loss


def torch_att_loss(attb, attf, small_mask, gts, window, tam_os=8,
                   thres=0.3, smooth=0.2):
    """Reference L_att (model.py:286-321): attb/attf [B, S-2, w^2, h, w]."""
    bce = torch.nn.BCEWithLogitsLoss(reduction="mean")
    B, S = gts.shape[:2]
    H = gts.shape[-2] // tam_os
    W = gts.shape[-1] // tam_os
    terms = []
    for c in range(1, S - 1):
        bgt = F.avg_pool2d(gts[:, c - 1], tam_os, stride=tam_os)
        fgt = F.avg_pool2d(gts[:, c + 1], tam_os, stride=tam_os)
        cgt = F.avg_pool2d(gts[:, c], tam_os, stride=tam_os)
        m = small_mask[:, c - 1].reshape(B, -1).bool()
        if m.float().sum() == 0:
            terms.append(torch.zeros(()))
            continue
        b = attb[:, c - 1].reshape(B, -1, H * W).permute(1, 0, 2)
        f = attf[:, c - 1].reshape(B, -1, H * W).permute(1, 0, 2)
        cb, cf = b[:, m], f[:, m]
        bgt_u = F.unfold(bgt, window, padding=window // 2).reshape(
            B, -1, H * W).permute(1, 0, 2)[:, m]
        fgt_u = F.unfold(fgt, window, padding=window // 2).reshape(
            B, -1, H * W).permute(1, 0, 2)[:, m]
        cgt_m = cgt.reshape(B, 1, H * W).permute(1, 0, 2)[:, m]
        dcb = ((cgt_m - bgt_u).abs() < thres).float() * (1 - smooth)
        dcf = ((cgt_m - fgt_u).abs() < thres).float() * (1 - smooth)
        terms.append((bce(cb, dcb) + bce(cf, dcf)) / 2.0)
    return sum(terms) / len(terms)


def test_attention_loss_matches_reference(rng):
    B, S, H, W, win = 2, 3, 32, 32, 3
    h = w = H // 8
    gts = rng.rand(B, S, H, W, 1).astype(np.float32)
    attb = rng.randn(B, S - 2, h, w, win * win).astype(np.float32)
    attf = rng.randn(B, S - 2, h, w, win * win).astype(np.float32)
    mask = (rng.rand(B, S - 2, h, w, 1) > 0.4).astype(np.float32)
    # reference zeroes logits outside the mask; match that precondition
    attb = attb * mask
    attf = attf * mask

    cfg = TaskConfig(model="vmn_dim", agg_window=win)
    got = float(attention_loss(cfg, jnp.asarray(attb), jnp.asarray(attf),
                               jnp.asarray(mask), jnp.asarray(gts)))

    t_gts = torch.from_numpy(np.moveaxis(gts, -1, 2).copy())
    # torch layout [B, S-2, w^2, h, w]
    t_attb = torch.from_numpy(np.moveaxis(attb, -1, 2).copy())
    t_attf = torch.from_numpy(np.moveaxis(attf, -1, 2).copy())
    t_mask = torch.from_numpy(np.moveaxis(mask, -1, 2).copy())
    want = float(torch_att_loss(t_attb, t_attf, t_mask, t_gts, win))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_temporal_loss_matches_reference(rng):
    B, S, H, W = 2, 5, 16, 16
    alphas = rng.rand(B, S, H, W, 1).astype(np.float32)
    gts = rng.rand(B, S, H, W, 1).astype(np.float32)
    tm = (rng.rand(B, S, H, W, 1) > 0.4).astype(np.float32)
    cfg = TaskConfig(model="vmn_dim")
    got = float(temporal_loss(cfg, jnp.asarray(alphas), jnp.asarray(gts),
                              jnp.asarray(tm)))
    # reference _dtSSD (model.py:326-333)
    eps = 1.001e-5
    terms = []
    for c in range(1, S - 2):
        d = np.abs((alphas[:, c] - alphas[:, c + 1]) - (gts[:, c] - gts[:, c + 1]))
        res = d * tm[:, c]
        safe = np.clip(np.sum(tm[:, c] > eps), eps, tm[:, c].size + 1)
        terms.append(np.sum(res) / safe)
    want = float(sum(terms) / len(terms))
    np.testing.assert_allclose(got, want, rtol=1e-5)
