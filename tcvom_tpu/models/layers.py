"""Shared Flax layer primitives for the matting backbones.

Design notes (TPU-first):
- everything is NHWC; conv kernels are HWIO (converter transposes torch's
  OIHW).
- normalization-statistics mutation lives in flax mutable collections:
  ``batch_stats`` for BatchNorm and ``spectral`` for spectral-norm power
  iteration vectors, replacing torch's in-forward buffer writes
  (reference models/GCA/ops.py:25-45).
- BatchNorm computed under jit over a sharded batch is synchronized across
  the data mesh automatically by GSPMD — the reference needed explicit
  SyncBatchNorm conversion (train_ddp.py:272).
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def BatchNorm(name: str | None = None, momentum: float = 0.9,
              epsilon: float = 1e-5,
              scale_init: Callable = nn.initializers.ones) -> nn.BatchNorm:
    """BatchNorm2d factory with torch defaults (momentum 0.1 -> flax 0.9,
    eps 1e-5). Call with (x, use_running_average=not train). A factory (not
    a wrapper module) keeps param paths flat: <name>/{scale,bias,mean,var}."""
    return nn.BatchNorm(momentum=momentum, epsilon=epsilon,
                        scale_init=scale_init, name=name)


def Conv(features: int, kernel_size, strides: int = 1, padding=0,
         dilation: int = 1, groups: int = 1, use_bias: bool = True,
         kernel_init: Callable = nn.initializers.xavier_uniform(),
         name: str | None = None) -> nn.Conv:
    """Plain conv2d factory, NHWC/HWIO, torch-style integer padding.
    A factory keeps param paths flat: <name>/{kernel,bias}."""
    ks = kernel_size if isinstance(kernel_size, tuple) else (
        kernel_size, kernel_size)
    pad = padding
    if isinstance(pad, int):
        pad = [(pad, pad), (pad, pad)]
    return nn.Conv(features, ks, strides=(strides, strides), padding=pad,
                   kernel_dilation=(dilation, dilation),
                   feature_group_count=groups, use_bias=use_bias,
                   kernel_init=kernel_init, name=name)


def ws_standardize(kernel: jnp.ndarray) -> jnp.ndarray:
    """Weight standardization (reference models/FBA/layers_WS.py:13-23):
    re-center and divide by the per-output-channel std (unbiased, +1e-12
    inside the sqrt, +1e-5 outside).

    Always computed in f32, cast back to the kernel dtype: the transform
    is a cancellation (w - mean) and its VJP a projection — in bf16 the
    projection leaks a mean-direction residual that dominates the true
    gradient signal of every WS conv (measured: encoder grad cosines
    ~0.03-0.16 vs f32 under the bf16 train recipe). The weight tensors are
    tiny, so the f32 round-trip is free next to the conv itself."""
    k32 = kernel.astype(jnp.float32)
    mean = jnp.mean(k32, axis=(0, 1, 2), keepdims=True)
    w = k32 - mean
    var = jnp.var(w.reshape(-1, kernel.shape[-1]), axis=0, ddof=1)
    std = jnp.sqrt(var + 1e-12) + 1e-5
    return (w / std[None, None, None, :]).astype(kernel.dtype)


class RawConvParams(nn.Module):
    """Parameter container with nn.Conv's layout (<name>/{kernel, bias})
    for code paths that consume the kernel tensor directly (the subpixel
    weight-transformed decoder tail). Calling it returns (kernel, bias)."""
    features: int
    in_features: int
    kernel_size: tuple[int, int] = (3, 3)
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init,
                            (*self.kernel_size, self.in_features,
                             self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return kernel, bias


class RawBatchNorm(nn.Module):
    """BatchNorm with flax-matching semantics and raw access; supports
    applying the affine to phase-packed channels (eval). Param layout
    matches nn.BatchNorm ({scale, bias} + batch_stats {mean, var})."""
    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, y, train: bool = False, phases: int = 1):
        f = self.features
        scale = self.param("scale", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((f,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((f,), jnp.float32))
        if train:
            assert phases == 1
            axes = tuple(range(y.ndim - 1))
            mean = jnp.mean(y, axes)
            var = jnp.mean(jnp.square(y), axes) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        add = bias - mean * inv
        if phases > 1:
            inv, add = jnp.tile(inv, phases), jnp.tile(add, phases)
        return y * inv.astype(y.dtype) + add.astype(y.dtype)


class SNConvRaw(nn.Module):
    """SNConv with raw kernel access (param/spectral layout identical to
    SNConv: {kernel_bar, bias} + spectral {u, v}); ``kernel_only=True``
    returns the spectrally-normalized kernel (+bias) for weight-transformed
    packed paths instead of applying the conv."""
    features: int
    in_features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: int = 1
    padding: int = 1
    use_bias: bool = False
    transpose: bool = False
    kernel_init: Callable = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(self, x=None, train: bool = False, update_sn=None,
                 kernel_only: bool = False):
        ks = self.kernel_size
        kernel = self.param("kernel_bar", self.kernel_init,
                            (*ks, self.in_features, self.features))
        if self.transpose:
            height = self.in_features
            wmat = jnp.transpose(kernel, (2, 3, 0, 1)).reshape(height, -1)
        else:
            height = self.features
            wmat = jnp.transpose(kernel, (3, 2, 0, 1)).reshape(height, -1)

        u = self.variable("spectral", "u",
                          lambda: _l2n(jax.random.normal(
                              self.make_rng("params") if
                              self.is_initializing() else
                              jax.random.PRNGKey(0), (height,))))
        v = self.variable("spectral", "v",
                          lambda: _l2n(jax.random.normal(jax.random.fold_in(
                              self.make_rng("params"), 1) if
                              self.is_initializing() else
                              jax.random.PRNGKey(1), (wmat.shape[1],))))
        do_update = train if update_sn is None else update_sn
        if do_update and not self.is_initializing():
            wd = jax.lax.stop_gradient(wmat)
            v_new = _l2n(wd.T @ u.value)
            u_new = _l2n(wd @ v_new)
            u.value = u_new
            v.value = v_new
        uu = jax.lax.stop_gradient(u.value)
        vv = jax.lax.stop_gradient(v.value)
        sigma = uu @ (wmat @ vv)
        w = kernel / sigma
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        if kernel_only:
            return w, bias
        if self.transpose:
            y = conv_transpose_torch(x, w, self.strides, self.padding)
        else:
            y = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype),
                window_strides=(self.strides, self.strides),
                padding=[(self.padding, self.padding)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias
        return y


class RawNormParams(nn.Module):
    """Norm-parameter container (<name>/{scale, bias}); returns them."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class WSConv(nn.Module):
    """Weight-standardized conv (FBA; reference models/FBA/layers_WS.py:6-23).

    The kernel is re-centered and divided by its per-output-channel std
    (unbiased, +1e-12 inside the sqrt, +1e-5 outside) in every forward.
    """
    features: int
    kernel_size: int | tuple[int, int]
    strides: int = 1
    padding: int | str = 0
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        ks = self.kernel_size if isinstance(self.kernel_size, tuple) else (
            self.kernel_size, self.kernel_size)
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (*ks, in_ch, self.features))
        w = ws_standardize(kernel)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(self.strides, self.strides),
            padding=pad, rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


def _l2n(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


def conv_transpose_torch(x: jnp.ndarray, kernel: jnp.ndarray, stride: int,
                         padding: int) -> jnp.ndarray:
    """torch ``ConvTranspose2d`` forward with kernel ``[kh, kw, in, out]``.

    Implemented as input-dilated convolution with the spatially-flipped
    kernel: out = (H-1)*stride - 2*padding + kh.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    flipped = kernel[::-1, ::-1, :, :]
    return jax.lax.conv_general_dilated(
        x, flipped.astype(x.dtype), window_strides=(1, 1),
        padding=[(kh - 1 - padding, kh - 1 - padding),
                 (kw - 1 - padding, kw - 1 - padding)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class SNConv(nn.Module):
    """Conv2d wrapped in spectral normalization (GCA; reference
    models/GCA/ops.py:12-80).

    Stores ``kernel_bar`` as the trainable weight plus power-iteration
    vectors ``u``/``v`` in the ``spectral`` collection. In training mode one
    power iteration updates u, v (on the stop-gradiented weight, like
    torch's .data writes); sigma = u·W·v is differentiable w.r.t. the
    weight in both modes.
    """
    features: int
    kernel_size: int | tuple[int, int]
    strides: int = 1
    padding: int | str = 0
    use_bias: bool = False
    transpose: bool = False   # ConvTranspose2d(k=4, s=2, p=1) variant
    kernel_init: Callable = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(self, x, train: bool = False, update_sn: bool | None = None):
        ks = self.kernel_size if isinstance(self.kernel_size, tuple) else (
            self.kernel_size, self.kernel_size)
        in_ch = x.shape[-1]
        if self.transpose:
            # torch ConvTranspose2d weight is [in, out, kh, kw] and spectral
            # norm flattens with height = dim0 = in_ch. We store [kh, kw,
            # in, out] and flatten to match torch's view(in, -1).
            kernel = self.param("kernel_bar", self.kernel_init,
                                (*ks, in_ch, self.features))  # [kh, kw, in, out]
            height = in_ch
            wmat = jnp.transpose(kernel, (2, 3, 0, 1)).reshape(height, -1)
        else:
            kernel = self.param("kernel_bar", self.kernel_init,
                                (*ks, in_ch, self.features))
            height = self.features
            wmat = jnp.transpose(kernel, (3, 2, 0, 1)).reshape(height, -1)

        u = self.variable("spectral", "u",
                          lambda: _l2n(jax.random.normal(self.make_rng("params") if
                                                         self.is_initializing() else
                                                         jax.random.PRNGKey(0), (height,))))
        v = self.variable("spectral", "v",
                          lambda: _l2n(jax.random.normal(jax.random.fold_in(
                              self.make_rng("params"), 1) if self.is_initializing() else
                              jax.random.PRNGKey(1), (wmat.shape[1],))))

        do_update = train if update_sn is None else update_sn
        if do_update and not self.is_initializing():
            wd = jax.lax.stop_gradient(wmat)
            v_new = _l2n(wd.T @ u.value)
            u_new = _l2n(wd @ v_new)
            u.value = u_new
            v.value = v_new
        uu = jax.lax.stop_gradient(u.value)
        vv = jax.lax.stop_gradient(v.value)
        sigma = uu @ (wmat @ vv)
        w = kernel / sigma

        if self.transpose:
            pad = self.padding if isinstance(self.padding, int) else 1
            y = conv_transpose_torch(x, w, self.strides, pad)
        else:
            pad = self.padding
            if isinstance(pad, int):
                pad = [(pad, pad), (pad, pad)]
            y = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), window_strides=(self.strides, self.strides),
                padding=pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class ConvTranspose(nn.Module):
    """Plain ConvTranspose2d(kernel=4, stride=2, padding=1) — torch semantics."""
    features: int
    kernel_size: int = 4
    strides: int = 2
    padding: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (k, k, in_ch, self.features))
        y = conv_transpose_torch(x, kernel, self.strides, self.padding)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class _GroupNorm(nn.Module):
    """GroupNorm with one-pass moments (E[x], E[x^2] in a single read of
    the activation). flax's nn.GroupNorm lowers to ~3 full HBM passes —
    measured 1.9 ms per call on FBA's [136,240,2048] conv5 at 1080p.

    The moment reduce keeps the channel dim and folds [C] -> [G] on the
    tiny per-channel sums afterwards: reducing the within-group slice of
    the minor (lane) dim directly makes XLA emit a lane-crossing
    reduction that reads at ~160 GB/s on v5e, while the channel-keeping
    reduce streams at 650-890 GB/s — measured 0.83 vs 0.21 ms on conv5
    at 1080p. (A fused Pallas moments kernel was prototyped and lost to
    the XLA channel-keeping reduce at every production shape.)

    Statistics in float32 regardless of input dtype. Param layout
    matches nn.GroupNorm ({scale, bias})."""
    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        g = self.num_groups
        xf = x.astype(jnp.float32)
        axes = tuple(range(1, x.ndim - 1))
        s1 = jnp.sum(xf, axis=axes)                   # [N, C] — lane dim
        s2 = jnp.sum(xf * xf, axis=axes)              # kept: fast reduce
        cnt = x.size // x.shape[0] // g               # elements per group
        m1 = s1.reshape(-1, g, c // g).sum(-1) / cnt  # [N, G]
        m2 = s2.reshape(-1, g, c // g).sum(-1) / cnt
        inv = jax.lax.rsqrt(jnp.maximum(m2 - m1 * m1, 0.0) + self.epsilon)
        bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (g, 1)
        xg = xf.reshape(x.shape[:-1] + (g, c // g))
        y = ((xg - m1.reshape(bshape)) * inv.reshape(bshape)).reshape(x.shape)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)


def GroupNorm32(name: str | None = None) -> _GroupNorm:
    """GroupNorm(32) factory (FBA's `norm`, models/FBA/layers_WS.py:26)."""
    return _GroupNorm(num_groups=32, epsilon=1e-5, name=name)
