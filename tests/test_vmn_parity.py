"""End-to-end VMN (TAM) parity vs the reference's temporal model: random
reference weights converted through utils.convert must reproduce the
reference VMN forward (preds + raw attention logits) on our batched/dense
implementation."""
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

# the reference VMN module imports torchvision.utils but never uses it in
# forward; stub it (torchvision is not installed here)
if "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")
    tv.utils = types.ModuleType("torchvision.utils")
    tv.utils.save_image = lambda *a, **k: None
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.utils"] = tv.utils

sys.path.insert(0, "/root/reference")

from tcvom_tpu.models import registry
from tcvom_tpu.utils.convert import convert_state_dict, merge_variables

H = W = 64
S = 3


@pytest.mark.slow
def test_vmn_dim_parity(rng, monkeypatch):
    from models.VMN import get_VMN_models
    # the reference FAM scatters onto torch.cuda.current_device()
    # (VMN_model.py:47,54); route it to CPU for the golden run
    monkeypatch.setattr(torch.cuda, "current_device", lambda: "cpu")
    torch.manual_seed(0)
    ref = get_VMN_models(arch="vmn_dim", agg_window=3)
    ref.eval()   # NB: the reference VMN.train() override returns None

    imgs = rng.randn(1, S, 4, H, W).astype(np.float32)
    mask = (rng.rand(1, S, 1, H, W) > 0.3).astype(np.float32)

    t_imgs = [torch.from_numpy(imgs[:, i:i + 1]) for i in range(S)]
    # the reference wrapper passes [B, 1, 1, H, W] per frame (split along S
    # keeps the dim) and VMN.forward squeezes dim 1
    t_masks = [torch.from_numpy(mask[:, i:i + 1]) for i in range(S)]
    with torch.no_grad():
        preds, attb, attf, small_mask = ref(t_imgs, t_masks)
    want_pred = preds[1].numpy()
    # reference logits layout: [B, window^2, H*W] (VMN_model.py:47-49)
    want_attb = attb[1].numpy().reshape(1, 9, H // 8, W // 8)

    name = "vmn_dim"
    module = registry.build_model(name, agg_window=3)
    variables, unmatched = convert_state_dict(name, ref.state_dict())
    assert not unmatched, unmatched[:8]

    x = jnp.asarray(np.moveaxis(imgs, 2, -1))
    m = jnp.asarray(np.moveaxis(mask, 2, -1))
    key = jax.random.PRNGKey(0)
    init_vars = jax.jit(lambda: module.init(
        {"params": key, "dropout": key}, x, m, train=False))()
    merged, missing, unexpected = merge_variables(init_vars, variables)
    assert not missing and not unexpected, (missing[:5], unexpected[:5])

    out, lb, lf, sm = jax.jit(
        lambda v: module.apply(v, x, m, train=False))(merged)
    got_pred = np.moveaxis(np.asarray(out)[:, 1], -1, 1)
    np.testing.assert_allclose(got_pred, want_pred, atol=3e-4)

    got_attb = np.moveaxis(np.asarray(lb)[:, 0], -1, 1)  # [B, w*w, h, w]
    np.testing.assert_allclose(got_attb, want_attb, atol=3e-4)


def _one_hot_trimap(rng, n, h, w):
    """Plausible 3-ch one-hot trimap (bg, unknown, fg) like the GCA input."""
    tri = np.zeros((n, 3, h, w), np.float32)
    tri[:, 1, h // 4: h // 2, w // 4: 3 * w // 4] = 1
    tri[:, 2, h // 2:, :] = 1
    tri[:, 0] = 1 - tri[:, 1] - tri[:, 2]
    return tri


def _vmn_roundtrip(name, ref, imgs, mask, extras_np=None, atol=3e-4,
                   monkeypatch=None):
    """Shared body: run the reference VMN on per-frame lists, our VMN on the
    batched [B, S, ...] layout with converted weights, and diff center-frame
    preds + raw attention logits (reference models/VMN/VMN_model.py:83-113)."""
    if monkeypatch is not None:
        monkeypatch.setattr(torch.cuda, "current_device", lambda: "cpu")
    ref.eval()
    s = imgs.shape[1]
    t_imgs = [torch.from_numpy(imgs[:, i:i + 1]) for i in range(s)]
    t_masks = [torch.from_numpy(mask[:, i:i + 1]) for i in range(s)]
    t_extras = None
    if extras_np is not None:
        t_extras = [[torch.from_numpy(e[:, i]) for e in extras_np]
                    for i in range(s)]
    with torch.no_grad():
        preds, attb, attf, _ = ref(t_imgs, t_masks, extras=t_extras)
    want_pred = preds[1].numpy()
    h8, w8 = H // 8, W // 8
    want_attb = attb[1].numpy().reshape(1, -1, h8, w8)

    module = registry.build_model(name, agg_window=3)
    variables, unmatched = convert_state_dict(name, ref.state_dict())
    assert not unmatched, unmatched[:8]

    x = jnp.asarray(np.moveaxis(imgs, 2, -1))
    m = jnp.asarray(np.moveaxis(mask, 2, -1))
    extras = None
    if extras_np is not None:
        extras = tuple(jnp.asarray(np.moveaxis(e, 2, -1)) for e in extras_np)
    key = jax.random.PRNGKey(0)
    init_vars = jax.jit(lambda: module.init(
        {"params": key, "dropout": key}, x, m, extras=extras,
        train=False))()
    merged, missing, unexpected = merge_variables(init_vars, variables)
    assert not missing and not unexpected, (missing[:5], unexpected[:5])

    out, lb, lf, sm = jax.jit(lambda v: module.apply(
        v, x, m, extras=extras, train=False))(merged)
    got_pred = np.moveaxis(np.asarray(out)[:, 1], -1, 1)
    np.testing.assert_allclose(got_pred, want_pred, atol=atol)
    got_attb = np.moveaxis(np.asarray(lb)[:, 0], -1, 1)
    # logits can be huge under random init (gca reaches ~1e11 through the
    # un-normalized decoder features), so allow a relative tolerance too
    np.testing.assert_allclose(got_attb, want_attb, atol=atol, rtol=1e-4)


@pytest.mark.slow
def test_vmn_gca_parity(rng, monkeypatch):
    """vmn_gca: second GCA block inside the extract half
    (reference models/VMN/VMN_GCA.py:27-34)."""
    from models.VMN import get_VMN_models
    torch.manual_seed(0)
    ref = get_VMN_models(arch="vmn_gca", agg_window=3)

    imgs = rng.randn(1, S, 6, H, W).astype(np.float32)
    for i in range(S):
        imgs[:, i, 3:] = _one_hot_trimap(rng, 1, H, W)
    mask = imgs[:, :, 4:5].copy()          # unknown channel as FAM mask
    _vmn_roundtrip("vmn_gca", ref, imgs, mask, atol=5e-4,
                   monkeypatch=monkeypatch)


@pytest.mark.slow
def test_vmn_fba_parity(rng, monkeypatch):
    """vmn_fba (the flagship): PPM+conv_up1 extract split and the
    (img, two_chan_trimap) extras plumbing (reference VMN_FBA.py:6-59)."""
    from models.VMN import get_VMN_models
    torch.manual_seed(0)
    ref = get_VMN_models(arch="vmn_fba", agg_window=3)

    imgs = rng.randn(1, S, 11, H, W).astype(np.float32)
    mask = (rng.rand(1, S, 1, H, W) > 0.3).astype(np.float32)
    img = rng.rand(1, S, 3, H, W).astype(np.float32)
    two = (rng.rand(1, S, 2, H, W) > 0.5).astype(np.float32)
    _vmn_roundtrip("vmn_fba", ref, imgs, mask, extras_np=(img, two),
                   atol=5e-4, monkeypatch=monkeypatch)


@pytest.mark.slow
def test_vmn_index_parity(rng, monkeypatch):
    """vmn_index: decoder_layer6..4 extract split at OS=8 and the 32-ch FAM
    (reference VMN_Index.py:7-29; our XLA fallback path, C % 128 != 0)."""
    from models.VMN import get_VMN_models
    torch.manual_seed(0)
    ref = get_VMN_models(arch="vmn_index", agg_window=3)

    imgs = rng.randn(1, S, 4, H, W).astype(np.float32)
    mask = (rng.rand(1, S, 1, H, W) > 0.3).astype(np.float32)
    _vmn_roundtrip("vmn_index", ref, imgs, mask, atol=3e-4,
                   monkeypatch=monkeypatch)
