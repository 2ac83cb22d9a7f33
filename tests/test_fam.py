"""FAM dense attention vs a direct numpy re-derivation of the reference
semantics (per-pixel window gather, masked softmax/scatter)."""
import math

import numpy as np

import jax.numpy as jnp

from tcvom_tpu.ops.fam import fam_attention


def reference_fam(q, k, mask, window):
    """Literal (slow) semantics: for every unknown pixel, dot q against the
    window-neighborhood of k (zero outside the frame), softmax over the
    window, weighted-sum k; zeros elsewhere. q,k: [B,H,W,C]; mask [B,H,W]."""
    b, h, w, c = q.shape
    r = window // 2
    out = np.zeros_like(q)
    logits = np.zeros((b, h, w, window * window), q.dtype)
    kp = np.pad(k, [(0, 0), (r, r), (r, r), (0, 0)])
    for bi in range(b):
        for y in range(h):
            for x in range(w):
                if mask[bi, y, x] <= 0:
                    continue
                neigh = kp[bi, y:y + window, x:x + window, :].reshape(-1, c)
                lg = neigh @ q[bi, y, x] / math.sqrt(c)
                logits[bi, y, x] = lg
                att = np.exp(lg - lg.max())
                att /= att.sum()
                out[bi, y, x] = att @ neigh
    return out, logits


def test_fam_matches_reference_semantics(rng):
    b, h, w, c, win = 2, 6, 7, 8, 3
    q = rng.randn(b, h, w, c).astype(np.float32)
    k = rng.randn(b, h, w, c).astype(np.float32)
    mask = (rng.rand(b, h, w) > 0.4).astype(np.float32)
    want_out, want_lg = reference_fam(q, k, mask, win)
    got_out, got_lg = fam_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(mask)[..., None], win)
    np.testing.assert_allclose(np.asarray(got_lg), want_lg, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_out), want_out, atol=1e-5)


def test_fam_window1(rng):
    # window == 1: attention collapses to k itself inside the mask
    q = rng.randn(1, 4, 4, 4).astype(np.float32)
    k = rng.randn(1, 4, 4, 4).astype(np.float32)
    mask = np.ones((1, 4, 4, 1), np.float32)
    out, lg = fam_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(mask), 1)
    np.testing.assert_allclose(np.asarray(out), k, atol=1e-6)


def test_fam_grad_finite(rng):
    import jax
    b, h, w, c, win = 1, 4, 4, 4, 3
    q = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, h, w, 1) > 0.5).astype(np.float32))

    def f(q, k):
        o, lg = fam_attention(q, k, mask, win)
        return jnp.sum(o ** 2) + jnp.sum(lg ** 2)

    gq, gk = jax.grad(f, argnums=(0, 1))(q, k)
    assert np.all(np.isfinite(np.asarray(gq)))
    assert np.all(np.isfinite(np.asarray(gk)))
