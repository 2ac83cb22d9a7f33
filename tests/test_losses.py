"""Golden tests for the loss library (numpy/torch-derived expectations)."""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tcvom_tpu.ops import losses as L


def test_l1_mask_normalized(rng):
    x = rng.rand(2, 8, 8, 1).astype(np.float32)
    y = rng.rand(2, 8, 8, 1).astype(np.float32)
    m = (rng.rand(2, 8, 8, 1) > 0.5).astype(np.float32)
    want = np.sum(np.abs(x - y) * m) / np.clip(np.sum(m > 1.001e-5), 1.001e-5, x.size + 1)
    got = float(L.l1_mask(jnp.asarray(x), jnp.asarray(y), jnp.asarray(m)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # no-mask variants
    np.testing.assert_allclose(float(L.l1_mask(jnp.asarray(x), jnp.asarray(y))),
                               np.mean(np.abs(x - y)), rtol=1e-5)
    np.testing.assert_allclose(
        float(L.l1_mask(jnp.asarray(x), jnp.asarray(y), normalize=False)),
        np.sum(np.abs(x - y)), rtol=1e-5)


def test_l1_mask_empty_mask_safe(rng):
    x = rng.rand(1, 4, 4, 1).astype(np.float32)
    y = x.copy()
    m = np.zeros_like(x)
    got = float(L.l1_mask(jnp.asarray(x), jnp.asarray(y), jnp.asarray(m)))
    assert np.isfinite(got) and got == 0.0


def test_l1_grad(rng):
    x = rng.rand(1, 6, 6, 1).astype(np.float32)
    y = rng.rand(1, 6, 6, 1).astype(np.float32)
    eps = 1.001e-5

    def grad_mag(a):
        dy = np.diff(a, axis=1, append=0)
        dy[:, -1] = 0
        dx = np.diff(a, axis=2, append=0)
        dx[:, :, -1] = 0
        return np.sqrt(dx ** 2 + dy ** 2 + eps)

    want = np.mean(np.abs(grad_mag(x) - grad_mag(y)))
    got = float(L.l1_grad(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_exclusion_loss_matches_torch(rng):
    x = rng.rand(2, 16, 16, 3).astype(np.float32)
    y = rng.rand(2, 16, 16, 3).astype(np.float32)
    eps = 1.001e-5

    def tgrad(img):
        dy = img[:, :, 1:, :] - img[:, :, :-1, :]
        dx = img[:, :, :, 1:] - img[:, :, :, :-1]
        return F.pad(dx, (0, 1, 0, 0)), F.pad(dy, (0, 0, 0, 1))

    i1 = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    i2 = torch.from_numpy(np.moveaxis(y, -1, 1).copy())
    gx_l, gy_l = [], []
    for _ in range(3):
        gx1, gy1 = tgrad(i1)
        gx2, gy2 = tgrad(i2)
        ax = 2.0 * gx1.abs().mean() / (gx2.abs().mean() + eps)
        ay = 2.0 * gy1.abs().mean() / (gy2.abs().mean() + eps)
        gx1s, gy1s = torch.sigmoid(gx1) * 2 - 1, torch.sigmoid(gy1) * 2 - 1
        gx2s, gy2s = torch.sigmoid(gx2 * ax) * 2 - 1, torch.sigmoid(gy2 * ay) * 2 - 1
        gx_l.append((((gx1s ** 2) * (gx2s ** 2)).mean(dim=(1, 2, 3)) + eps) ** 0.25)
        gy_l.append((((gy1s ** 2) * (gy2s ** 2)).mean(dim=(1, 2, 3)) + eps) ** 0.25)
        i1 = F.avg_pool2d(i1, 2, 2)
        i2 = F.avg_pool2d(i2, 2, 2)
    want = float((sum(gx_l) / 3.0).mean() + (sum(gy_l) / 3.0).mean())
    got = float(L.exclusion_loss(jnp.asarray(x), jnp.asarray(y), level=3))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_lap_loss_matches_torch(rng):
    x = rng.rand(2, 64, 64, 1).astype(np.float32)
    y = rng.rand(2, 64, 64, 1).astype(np.float32)

    kernel = torch.tensor([[1., 4., 6., 4., 1.],
                           [4., 16., 24., 16., 4.],
                           [6., 24., 36., 24., 6.],
                           [4., 16., 24., 16., 4.],
                           [1., 4., 6., 4., 1.]]) / 256.0

    def conv_g(img, k):
        img = F.pad(img, (2, 2, 2, 2), mode="reflect")
        return F.conv2d(img, k.repeat(img.shape[1], 1, 1, 1), groups=img.shape[1])

    def pyramid(img):
        cur, pyr = img, []
        for _ in range(5):
            filt = conv_g(cur, kernel)
            down = filt[:, :, ::2, ::2]
            b, c, h, w = down.shape
            up = torch.zeros(b, c, h * 2, w * 2)
            up[:, :, ::2, ::2] = down
            up = conv_g(up, 4 * kernel)
            pyr.append(cur - up)
            cur = down
        return pyr

    i1 = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    i2 = torch.from_numpy(np.moveaxis(y, -1, 1).copy())
    want = sum((2 ** lvl) * (a - b).abs().sum()
               for lvl, (a, b) in enumerate(zip(pyramid(i1), pyramid(i2))))
    want = float(want) / y.size
    got = float(L.lap_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4)
