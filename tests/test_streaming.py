"""Streaming sliding-window pipeline must match the batch EvalModel path."""
import numpy as np

import jax
import jax.numpy as jnp

from tcvom_tpu.infer.predict import StreamingPredictor
from tcvom_tpu.models import full_model as FM
from tcvom_tpu.models import registry

H = W = 64


def test_streaming_matches_forward_eval(rng):
    name = "vmn_dim"
    cfg = FM.TaskConfig(model=name, agg_window=3)
    module = registry.build_model(name, agg_window=3)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 3, H, W, 4))
    masks = jnp.ones((1, 3, H, W, 1))
    variables = jax.jit(lambda: module.init(
        {"params": key, "dropout": key}, x, masks, train=False))()

    imgs = rng.randint(0, 256, (1, 3, H, W, 3)).astype(np.float32)
    tri = np.zeros((1, 3, H, W, 1), np.float32)
    tri[:, :, 20:50, 10:60] = 128.0
    tri[:, :, 30:40, 25:45] = 255.0

    want = jax.jit(lambda v: FM.forward_eval(
        module, v, jnp.asarray(imgs), jnp.asarray(tri), cfg))(variables)
    want_center = np.asarray(want)[0, 1]      # frame 1's matte

    sp = StreamingPredictor(module, variables, cfg)
    state, o0 = sp.step(None, imgs[:, 0], tri[:, 0])
    state, o1 = sp.step(state, imgs[:, 1], tri[:, 1])   # matte for frame 0
    state, o2 = sp.step(state, imgs[:, 2], tri[:, 2])   # matte for frame 1
    last = sp.flush(state)                               # matte for frame 2
    assert o0 is None and o1 is not None and last is not None

    got_center = np.asarray(o2)[0]
    np.testing.assert_allclose(got_center, want_center, atol=1e-5)


def test_streaming_matches_forward_eval_fba(rng):
    """Flagship vmn_fba: streaming must match the batch EvalModel path —
    covers the FBA extras plumbing (raw image + 2ch trimap), the decoder
    tail and the (alpha, F, B) output pasting."""
    name = "vmn_fba"
    cfg = FM.TaskConfig(model=name, agg_window=3)
    module = registry.build_model(name, agg_window=3)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 3, H, W, 11))
    masks = jnp.ones((1, 3, H, W, 1))
    extras = (jnp.zeros((1, 3, H, W, 3)), jnp.zeros((1, 3, H, W, 2)))
    variables = jax.jit(lambda: module.init(
        {"params": key, "dropout": key}, x, masks, extras=extras,
        train=False))()

    imgs = rng.randint(0, 256, (1, 3, H, W, 3)).astype(np.float32)
    tri = np.zeros((1, 3, H, W, 1), np.float32)
    tri[:, :, 20:50, 10:60] = 128.0
    tri[:, :, 30:40, 25:45] = 255.0

    want = jax.jit(lambda v: FM.forward_eval(
        module, v, jnp.asarray(imgs), jnp.asarray(tri), cfg))(variables)
    want_alpha = np.asarray(want[0])[0, 1]    # frame 1's alpha
    want_f = np.asarray(want[1])[0, 1]

    sp = StreamingPredictor(module, variables, cfg)
    state, _ = sp.step(None, imgs[:, 0], tri[:, 0])
    state, _ = sp.step(state, imgs[:, 1], tri[:, 1])
    state, o2 = sp.step(state, imgs[:, 2], tri[:, 2])   # matte for frame 1
    alpha, f, b = o2
    # GroupNorm's data-dependent statistics reassociate differently
    # between the one-graph batch path and the per-frame streaming graphs
    np.testing.assert_allclose(np.asarray(alpha)[0], want_alpha, atol=5e-4)
    np.testing.assert_allclose(np.asarray(f)[0], want_f, atol=5e-4)


def test_streaming_fgbg_false_matches_alpha(rng):
    """fgbg=False (the wild-folder matte path) returns just alpha, equal
    to the (alpha, F, B) run's alpha — dropping F/B is dead-code
    elimination, never a numerics change."""
    name = "vmn_fba"
    cfg = FM.TaskConfig(model=name, agg_window=3)
    module = registry.build_model(name, agg_window=3)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 3, H, W, 11))
    masks = jnp.ones((1, 3, H, W, 1))
    extras = (jnp.zeros((1, 3, H, W, 3)), jnp.zeros((1, 3, H, W, 2)))
    variables = jax.jit(lambda: module.init(
        {"params": key, "dropout": key}, x, masks, extras=extras,
        train=False))()

    imgs = rng.randint(0, 256, (1, 3, H, W, 3)).astype(np.float32)
    tri = np.zeros((1, 3, H, W, 1), np.float32)
    tri[:, :, 20:50, 10:60] = 128.0
    tri[:, :, 30:40, 25:45] = 255.0

    def run(fgbg):
        sp = StreamingPredictor(module, variables, cfg, fgbg=fgbg)
        state, _ = sp.step(None, imgs[:, 0], tri[:, 0])
        state, o = sp.step(state, imgs[:, 1], tri[:, 1])
        return o

    full = run(True)
    alpha_only = run(False)
    assert not isinstance(alpha_only, tuple)
    np.testing.assert_array_equal(np.asarray(alpha_only),
                                  np.asarray(full[0]))


def test_streaming_quantize_byte_exact(rng):
    """quantize=True (the wild-folder matte path) fuses the trimap paste
    and PNG quantization into the decode jit on channel-squeezed tensors;
    its uint8 [B, H, W] output must equal np.uint8(clip(alpha)*255) of the
    f32 path byte for byte (jnp.floor matches numpy's truncation)."""
    name = "vmn_fba"
    cfg = FM.TaskConfig(model=name, agg_window=3)
    module = registry.build_model(name, agg_window=3)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 3, H, W, 11))
    masks = jnp.ones((1, 3, H, W, 1))
    extras = (jnp.zeros((1, 3, H, W, 3)), jnp.zeros((1, 3, H, W, 2)))
    variables = jax.jit(lambda: module.init(
        {"params": key, "dropout": key}, x, masks, extras=extras,
        train=False))()

    imgs = rng.randint(0, 256, (1, 3, H, W, 3)).astype(np.float32)
    tri = np.zeros((1, 3, H, W, 1), np.float32)
    tri[:, :, 20:50, 10:60] = 128.0
    tri[:, :, 30:40, 25:45] = 255.0

    def run(quantize):
        sp = StreamingPredictor(module, variables, cfg, fgbg=False,
                                quantize=quantize)
        state, _ = sp.step(None, imgs[:, 0], tri[:, 0])
        state, o = sp.step(state, imgs[:, 1], tri[:, 1])
        return o

    alpha_f32 = np.asarray(run(False))            # [1, H, W, 1] f32
    alpha_u8 = np.asarray(run(True))              # [1, H, W] u8
    assert alpha_u8.dtype == np.uint8 and alpha_u8.shape == (1, H, W)
    want = np.uint8(np.clip(alpha_f32[..., 0], 0, 1) * 255)
    np.testing.assert_array_equal(alpha_u8, want)
