"""Guided-contextual-attention core vs a direct torch per-sample
re-derivation of the reference semantics (dynamic-kernel conv2d correlate,
conv_transpose2d reconstruct — models/GCA/ops.py:106-229)."""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tcvom_tpu.ops.gca_attention import (extract_patches_reflect,
                                         guided_attention_core,
                                         overlap_add_stride2_k4)


def torch_patches(x, kernel=3, stride=1):
    left = (kernel - stride + 1) // 2
    right = (kernel - stride) // 2
    x = F.pad(x, (left, right, left, right), mode="reflect")
    p = x.unfold(2, kernel, stride).unfold(3, kernel, stride)
    return p  # [B, C, nh, nw, k, k]


def torch_gca_core(fd, alpha, unknown):
    """fd [B,Cf,h,w]; alpha [B,Ca,2h,2w]; unknown [B,1,h,w] -> [B,Ca,2h,2w]."""
    b, cf, h, w = fd.shape
    ca = alpha.shape[1]
    n = h * w

    aw = torch_patches(alpha, 4, 2).permute(0, 2, 3, 4, 5, 1)
    aw = aw.contiguous().view(b, h, w, -1).view(b, n, 4, 4, ca).permute(0, 1, 4, 2, 3)

    wk = torch_patches(fd, 3, 1).permute(0, 2, 3, 4, 5, 1)
    wk = wk.contiguous().view(b, h, w, -1).view(b, n, 3, 3, cf).permute(0, 1, 4, 2, 3)

    um = unknown.mean(dim=[2, 3])
    km = 1 - um
    s_un = torch.clamp(torch.sqrt(um / km), 0.1, 10)
    s_kn = torch.clamp(torch.sqrt(km / um), 0.1, 10)

    m = torch_patches(unknown, 3, 1).permute(0, 2, 3, 4, 5, 1)
    m = m.contiguous().view(b, h, w, -1).view(b, n, 3, 3)
    mm = (m.mean(dim=(2, 3), keepdim=True) > 0).float()  # [B, N, 1, 1]

    self_mask = F.one_hot(torch.arange(n).view(h, w), num_classes=n)
    self_mask = self_mask.permute(2, 0, 1).view(1, n, h, w).float() * (-1e4)

    ys = []
    for i in range(b):
        wi = wk[i]
        wi_n = wi / torch.clamp_min(
            torch.sqrt((wi ** 2).sum(dim=(1, 2, 3), keepdim=True)), 1e-4)
        xi = F.pad(fd[i:i + 1], (1, 1, 1, 1), mode="reflect")
        yi = F.conv2d(xi, wi_n)                                   # [1, N, h, w]
        mmi = mm[i:i + 1]
        yi = yi * (s_un[i, 0] * (mmi > 0).float() + s_kn[i, 0] * (mmi <= 0).float())
        yi = yi + self_mask * mmi
        yi = F.softmax(yi, dim=1)
        yi = F.conv_transpose2d(yi, aw[i], stride=2, padding=1) / 4.0
        ys.append(yi)
    return torch.cat(ys, dim=0)


def test_overlap_add_matches_conv_transpose(rng):
    b, h, w, ca = 2, 5, 6, 3
    att = rng.rand(b, h, w, h * w).astype(np.float32)
    ker = rng.rand(b, h * w, ca, 4, 4).astype(np.float32)
    want = []
    for i in range(b):
        yi = torch.from_numpy(np.moveaxis(att[i], -1, 0)[None].copy())
        want.append(F.conv_transpose2d(yi, torch.from_numpy(ker[i]), stride=2, padding=1))
    want = torch.cat(want).numpy()
    z = np.einsum("bhwn,bnckv->bhwkvc", att, ker.reshape(b, h * w, ca, 4, 4))
    got = np.asarray(overlap_add_stride2_k4(jnp.asarray(z.astype(np.float32))))
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), want, atol=1e-4)


def test_gca_core_matches_torch(rng):
    b, cf, ca, h, w = 2, 6, 8, 6, 8
    fd = rng.randn(b, h, w, cf).astype(np.float32)
    alpha = rng.randn(b, 2 * h, 2 * w, ca).astype(np.float32)
    unknown = (rng.rand(b, h, w, 1) > 0.5).astype(np.float32)

    want = torch_gca_core(
        torch.from_numpy(np.moveaxis(fd, -1, 1).copy()),
        torch.from_numpy(np.moveaxis(alpha, -1, 1).copy()),
        torch.from_numpy(np.moveaxis(unknown, -1, 1).copy())).numpy()

    got = np.asarray(guided_attention_core(
        jnp.asarray(fd), jnp.asarray(alpha), jnp.asarray(unknown)))
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), want, atol=2e-4)


def test_extract_patches_order(rng):
    x = rng.rand(1, 4, 5, 2).astype(np.float32)
    got = np.asarray(extract_patches_reflect(jnp.asarray(x), 3, 1))  # [B,N,9,C]
    want = torch_patches(torch.from_numpy(np.moveaxis(x, -1, 1).copy()), 3, 1)
    want = want.permute(0, 2, 3, 4, 5, 1).contiguous().view(1, 20, 9, 2).numpy()
    np.testing.assert_allclose(got, want, atol=0)
