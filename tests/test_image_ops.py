"""Golden tests for image primitives against torch CPU functional ops."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tcvom_tpu.ops import image as I


def nchw(x_nhwc):
    return torch.from_numpy(np.moveaxis(x_nhwc, -1, 1).copy())


def to_nhwc(t):
    return np.moveaxis(t.numpy(), 1, -1)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("size", [(7, 9), (16, 16), (3, 5)])
def test_resize_bilinear(rng, align, size):
    x = rng.rand(2, 8, 10, 3).astype(np.float32)
    want = to_nhwc(F.interpolate(nchw(x), size=size, mode="bilinear", align_corners=align))
    got = np.asarray(I.resize_bilinear(jnp.asarray(x), size, align_corners=align))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("size", [(4, 5), (16, 20), (8, 10)])
def test_resize_nearest(rng, size):
    x = rng.rand(2, 8, 10, 3).astype(np.float32)
    want = to_nhwc(F.interpolate(nchw(x), size=size, mode="nearest"))
    got = np.asarray(I.resize_nearest(jnp.asarray(x), size))
    np.testing.assert_allclose(got, want, atol=0)


def test_avg_max_pool(rng):
    x = rng.rand(2, 8, 8, 3).astype(np.float32)
    want = to_nhwc(F.avg_pool2d(nchw(x), 2, 2))
    got = np.asarray(I.avg_pool(jnp.asarray(x), 2, 2))
    np.testing.assert_allclose(got, want, atol=1e-6)

    want = to_nhwc(F.max_pool2d(nchw(x), 3, 1, 1))
    got = np.asarray(I.max_pool(jnp.asarray(x), 3, 1, 1))
    np.testing.assert_allclose(got, want, atol=0)


def test_max_pool_argmax_2x2_roundtrip(rng):
    x = rng.rand(2, 8, 10, 4).astype(np.float32)
    xt = nchw(x)
    want, want_idx = F.max_pool2d(xt, 2, 2, return_indices=True)
    pooled, idx = I.max_pool_argmax_2x2(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(pooled), to_nhwc(want), atol=0)

    # unpool roundtrip must match torch MaxUnpool2d
    y = rng.rand(*want.shape).astype(np.float32)
    want_up = F.max_unpool2d(torch.from_numpy(y), want_idx, 2, 2)
    got_up = I.max_unpool_2x2(jnp.asarray(np.moveaxis(y, 1, -1)), idx)
    np.testing.assert_allclose(np.asarray(got_up), to_nhwc(want_up), atol=0)


def test_max_pool_argmax_3x3s2(rng):
    x = rng.rand(2, 9, 11, 4).astype(np.float32)
    want, want_idx = F.max_pool2d(nchw(x), 3, 2, 1, return_indices=True)
    pooled, idx = I.max_pool_argmax(jnp.asarray(x), 3, 2, 1)
    np.testing.assert_allclose(np.asarray(pooled), to_nhwc(want), atol=0)
    np.testing.assert_array_equal(np.asarray(idx), to_nhwc(want_idx))


@pytest.mark.parametrize("s", [1, 2, 3, 6])
def test_adaptive_avg_pool(rng, s):
    x = rng.rand(2, 13, 17, 3).astype(np.float32)
    want = to_nhwc(F.adaptive_avg_pool2d(nchw(x), s))
    got = np.asarray(I.adaptive_avg_pool(jnp.asarray(x), s))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_unfold_matches_torch(rng):
    x = rng.rand(2, 6, 7, 3).astype(np.float32)
    k = 3
    want = F.unfold(nchw(x), k, padding=k // 2)  # [B, C*k*k, L]
    b, h, w, c = x.shape
    want = want.reshape(b, c, k * k, h * w).numpy()
    got = np.asarray(I.unfold(jnp.asarray(x), k))  # [B, H, W, k*k, C]
    got = np.moveaxis(got.reshape(b, h * w, k * k, c), (1, 2, 3), (3, 2, 1))
    np.testing.assert_allclose(got, want, atol=0)


def test_pixel_shuffle(rng):
    x = rng.rand(2, 4, 5, 12).astype(np.float32)
    want = to_nhwc(F.pixel_shuffle(nchw(x), 2))
    got = np.asarray(I.pixel_shuffle(jnp.asarray(x), 2))
    np.testing.assert_allclose(got, want, atol=0)


def test_grid_sample_bilinear(rng):
    img = rng.rand(2, 8, 10, 3).astype(np.float32)
    # random pixel coords incl. out-of-bounds
    coords = (rng.rand(2, 6, 7, 2).astype(np.float32) * 14 - 2)
    h, w = 8, 10
    # torch: normalize to [-1, 1] with align_corners=True
    gx = 2 * coords[..., 0] / (w - 1) - 1
    gy = 2 * coords[..., 1] / (h - 1) - 1
    grid = torch.from_numpy(np.stack([gx, gy], axis=-1))
    want = to_nhwc(F.grid_sample(nchw(img), grid, mode="bilinear", align_corners=True))
    got = np.asarray(I.grid_sample(jnp.asarray(img), jnp.asarray(coords)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_image_gradient(rng):
    x = rng.rand(2, 5, 6, 1).astype(np.float32)
    xt = nchw(x)
    dy = xt[:, :, 1:, :] - xt[:, :, :-1, :]
    dx = xt[:, :, :, 1:] - xt[:, :, :, :-1]
    dy = F.pad(dy, (0, 0, 0, 1))
    dx = F.pad(dx, (0, 1, 0, 0))
    gx, gy = I.image_gradient(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gx), to_nhwc(dx), atol=0)
    np.testing.assert_allclose(np.asarray(gy), to_nhwc(dy), atol=0)


def test_dilate_by_radius(rng):
    m = (rng.rand(3, 16, 16, 1) > 0.95).astype(np.float32)
    radii = np.array([0, 3, 7], np.int32)
    got = np.asarray(I.dilate_by_radius(jnp.asarray(m), jnp.asarray(radii), max_radius=10))
    for i, r in enumerate(radii):
        want = F.max_pool2d(torch.from_numpy(np.moveaxis(m[i:i+1], -1, 1)),
                            kernel_size=int(r) * 2 + 1, stride=1, padding=int(r))
        np.testing.assert_allclose(got[i], to_nhwc(want)[0], atol=0)


def test_dilate_by_radius_static(rng):
    """Static-int radius takes the separable two-pass path — same Chebyshev
    ball as the iterated per-sample loop and torch max_pool2d."""
    m = (rng.rand(2, 16, 20, 1) > 0.9).astype(np.float32)
    for r in (1, 5, 12):
        got = np.asarray(I.dilate_by_radius(jnp.asarray(m), r))
        want = F.max_pool2d(torch.from_numpy(np.moveaxis(m, -1, 1)),
                            kernel_size=2 * r + 1, stride=1, padding=r)
        np.testing.assert_allclose(got, to_nhwc(want), atol=0)
    np.testing.assert_array_equal(np.asarray(I.dilate_by_radius(jnp.asarray(m), 0)), m)


def test_conv_transpose_torch_parity(rng):
    from tcvom_tpu.models.layers import conv_transpose_torch
    x = rng.rand(2, 5, 6, 3).astype(np.float32)
    wt = rng.rand(3, 4, 4, 4).astype(np.float32)  # torch [in, out, kh, kw]
    want = to_nhwc(F.conv_transpose2d(nchw(x), torch.from_numpy(wt), stride=2, padding=1))
    k_hwio = np.transpose(wt, (2, 3, 0, 1))
    got = np.asarray(conv_transpose_torch(jnp.asarray(x), jnp.asarray(k_hwio), 2, 1))
    np.testing.assert_allclose(got, want, atol=1e-5)
