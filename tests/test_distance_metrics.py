"""Tests for the on-device EDT / trimap transform and metric kernels."""
import cv2
import numpy as np
import torch

import jax.numpy as jnp

from tcvom_tpu.ops import distance as D
from tcvom_tpu.ops import metrics as M
from tcvom_tpu.ops.image import coords_grid, grid_sample


def test_edt_matches_opencv(rng):
    seed = (rng.rand(40, 56) > 0.98)
    seed[0, 0] = True  # ensure nonempty
    # cv2.distanceTransform: distance to nearest ZERO pixel; invert
    src = np.uint8((~seed) * 255)
    want = cv2.distanceTransform(src, cv2.DIST_L2, 0) ** 2
    got = np.asarray(D.edt_squared(jnp.asarray(seed)))
    np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-4)


def test_edt_truncated_semantics(rng):
    """Truncated EDT (column pass truncated too): exact wherever the true
    distance is <= truncate, and >= truncate^2 everywhere else — on a grid
    tall/wide enough that both passes actually hit their radius caps."""
    h, w, t = 300, 360, 64
    seed = np.zeros((h, w), bool)
    seed[10, 20] = seed[250, 300] = seed[140, 10] = True
    src = np.uint8((~seed) * 255)
    want = cv2.distanceTransform(src, cv2.DIST_L2, 0).astype(np.float64) ** 2
    got = np.asarray(D.edt_squared(jnp.asarray(seed), chunk=t, truncate=t))
    inside = want <= t ** 2
    np.testing.assert_allclose(got[inside], want[inside], atol=1e-2,
                               rtol=1e-4)
    assert np.all(got[~inside] >= t ** 2 * (1 - 1e-6))


def test_edt_empty_seed():
    seed = np.zeros((16, 16), bool)
    got = np.asarray(D.edt_squared(jnp.asarray(seed)))
    # capped at _BIG: large enough that exp(-d2/(2*sigma^2)) underflows to 0
    assert np.all(got >= 1e6)
    assert np.all(np.exp(-got / (2 * (0.16 * 320.0) ** 2)) == 0.0)


def test_trimap_transform_matches_reference_formula(rng):
    tri2 = np.zeros((24, 24, 2), np.float32)
    tri2[2:5, 3:9, 0] = 1
    tri2[15:20, 10:12, 1] = 1
    got = np.asarray(D.trimap_transform(jnp.asarray(tri2)))
    L = 320.0
    for k in range(2):
        src = np.uint8((1 - tri2[..., k]) * 255)
        dt = cv2.distanceTransform(src, cv2.DIST_L2, 0).astype(np.float64)
        for j, s in enumerate((0.02, 0.08, 0.16)):
            want = np.exp(-dt ** 2 / (2 * (s * L) ** 2))
            np.testing.assert_allclose(got[..., 3 * k + j], want, atol=1e-4)


def test_basic_metrics(rng):
    a = rng.rand(16, 16).astype(np.float32)
    g = rng.rand(16, 16).astype(np.float32)
    m = rng.rand(16, 16) > 0.4
    np.testing.assert_allclose(float(M.sad(jnp.asarray(a), jnp.asarray(g), jnp.asarray(m))),
                               np.mean(np.abs(a[m] - g[m])), rtol=1e-5)
    np.testing.assert_allclose(float(M.mse(jnp.asarray(a), jnp.asarray(g), jnp.asarray(m))),
                               np.mean((a[m] - g[m]) ** 2), rtol=1e-5)
    np.testing.assert_allclose(float(M.ssda(jnp.asarray(a), jnp.asarray(g), jnp.asarray(m))),
                               np.sqrt(np.sum((a[m] - g[m]) ** 2)), rtol=1e-5)
    ha = rng.rand(16, 16).astype(np.float32)
    hg = rng.rand(16, 16).astype(np.float32)
    want = np.sqrt(np.sum((((a - ha) - (g - hg))[m]) ** 2))
    np.testing.assert_allclose(
        float(M.dtssd(jnp.asarray(a), jnp.asarray(g), jnp.asarray(m),
                      jnp.asarray(ha), jnp.asarray(hg))), want, rtol=1e-5)


def test_messddt_matches_torch_gridsample(rng):
    h, w = 12, 14
    a = rng.rand(h, w).astype(np.float32)
    g = rng.rand(h, w).astype(np.float32)
    ha = rng.rand(h, w).astype(np.float32)
    hg = rng.rand(h, w).astype(np.float32)
    m = rng.rand(h, w) > 0.3
    flow = (rng.rand(h, w, 2).astype(np.float32) - 0.5) * 6
    flow[rng.rand(h, w) > 0.8] = np.nan

    fix, org, valid = M.messddt(jnp.asarray(a), jnp.asarray(g), jnp.asarray(m),
                                jnp.asarray(ha), jnp.asarray(hg), jnp.asarray(flow))

    # torch reference computation (utils/utils.py:90-123 semantics)
    import torch.nn.functional as F
    at = torch.from_numpy(a)[None, None]
    gt = torch.from_numpy(g)[None, None]
    hat = torch.from_numpy(ha)[None, None]
    hgt = torch.from_numpy(hg)[None, None]
    ft = torch.from_numpy(np.moveaxis(flow, -1, 0).copy())[None]
    nan = torch.isnan(ft)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords = torch.from_numpy(np.stack([xs, ys])[None].astype(np.float32))
    ft[nan] = 0
    fc = coords + ft
    mask = (~nan[:, :1]) & torch.from_numpy(m)[None, None]
    gx = 2 * fc[:, 0] / (w - 1) - 1
    gy = 2 * fc[:, 1] / (h - 1) - 1
    grid = torch.stack([gx, gy], dim=-1)
    pgt = F.grid_sample(hgt, grid, mode="bilinear", align_corners=True)
    pa = F.grid_sample(hat, grid, mode="bilinear", align_corners=True)
    err = torch.abs((at[mask] - gt[mask]) - (pa[mask] - pgt[mask]))
    err2 = torch.abs((at[mask] - gt[mask]) ** 2 - (pa[mask] - pgt[mask]) ** 2)
    np.testing.assert_allclose(float(fix), float(err.sum()), rtol=1e-4)
    np.testing.assert_allclose(float(org), float(err2.sum()), rtol=1e-4)
    assert int(valid) == int(mask.sum())


def test_edt_row_pass_pallas_matches_bruteforce(rng):
    """The fused Pallas row pass (interpret mode) is bit-exact against the
    brute-force parabolic min-plus within the truncation radius — multiple
    tiles in both grid axes, tail padding in rows and columns."""
    from tcvom_tpu.ops.edt_pallas import edt_row_pass_fused

    t = 32
    for r, w in [(200, 300), (130, 70)]:
        g2 = np.where(rng.rand(r, w) < 0.05, 0.0,
                      rng.randint(0, 3000, (r, w))).astype(np.float32)
        got = np.asarray(edt_row_pass_fused(jnp.asarray(g2), trunc=t,
                                            interpret=True))
        pad = np.pad(g2, ((0, 0), (t, t)), constant_values=1e7)
        want = np.min(np.stack(
            [pad[:, d: d + w] + (t - d) ** 2 for d in range(2 * t + 1)]),
            axis=0)
        np.testing.assert_array_equal(got, want)


def test_edt_squared_pallas_route_matches_xla(rng):
    """edt_squared with the kernel route forced on equals the XLA chunked
    row pass wherever the true distance is inside the radius (outside it
    both paths only promise >= trunc^2)."""
    h, w, t = 96, 160, 32
    seed = rng.rand(2, h, w) < 0.002
    seed[1, h // 2, w // 2] = True
    want = np.asarray(D.edt_squared(jnp.asarray(seed), chunk=t, truncate=t,
                                    use_pallas=False))
    import unittest.mock as mock
    from tcvom_tpu.ops import edt_pallas as EP
    orig = EP.edt_row_pass_fused
    with mock.patch.object(
            EP, "edt_row_pass_fused",
            lambda g2, trunc: orig(g2, trunc, interpret=True)):
        got = np.asarray(D.edt_squared(jnp.asarray(seed), chunk=t,
                                       truncate=t, use_pallas=True))
    inside = want <= t ** 2
    np.testing.assert_array_equal(got[inside], want[inside])
    assert np.all(got[~inside] >= t ** 2 * (1 - 1e-6))
