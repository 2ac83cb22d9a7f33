#!/usr/bin/env python
"""A/B the FBA decoder-tail formulations on the attached TPU at 1080p
bf16 production shapes: reference-shaped vs 16-pack fast vs the
production path (16-pack + batched border-ring stitching). Delta-timed
with a device-side fori_loop (tunnel-safe; see tools/bench_fam.py)."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax, jax.numpy as jnp, numpy as np
from jax import lax

_CACHE = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from tcvom_tpu.models import fba as FBA
from tcvom_tpu.ops import subpixel as sp

K = 30

def bench(make_f, label):
    def body(i, acc):
        out = make_f(i)
        return acc + sum(jnp.sum(l.astype(jnp.float32))
                         for l in jax.tree.leaves(out))
    g = jax.jit(lambda: lax.fori_loop(0, K, body, jnp.float32(0)))
    np.asarray(g())
    t0 = time.perf_counter(); np.asarray(g()); t1 = time.perf_counter()
    np.asarray(g()); t2 = time.perf_counter()
    t = min(t1 - t0, t2 - t1) / K
    print(f"{label}: {t*1e3:.2f} ms", flush=True)
    return t

rng = np.random.RandomState(0)
dt = jnp.bfloat16
h4 = jnp.asarray(rng.randn(1, 272, 480, 256), dt)
skip2 = jnp.asarray(rng.randn(1, 544, 960, 64), dt)
parts = tuple(jnp.asarray(rng.randn(1, 1088, 1920, c), dt) for c in (3, 3, 2))
ex1 = jnp.concatenate(parts, -1)
p = dict(w3=jnp.asarray(rng.randn(3,3,320,64)*0.05, dt),
         b3=jnp.asarray(rng.randn(64)*0.1, dt),
         gn_scale=jnp.asarray(rng.rand(64)+0.5, dt),
         gn_bias=jnp.asarray(rng.randn(64)*0.1, dt),
         w40=jnp.asarray(rng.randn(3,3,72,32)*0.05, dt),
         b40=jnp.asarray(rng.randn(32)*0.1, dt),
         w41=jnp.asarray(rng.randn(3,3,32,16)*0.05, dt),
         b41=jnp.asarray(rng.randn(16)*0.1, dt),
         w42=jnp.asarray(rng.randn(1,1,16,7)*0.05, dt),
         b42=jnp.asarray(rng.randn(7)*0.1, dt))

def pert(t, i):
    return t + i.astype(t.dtype) * jnp.asarray(1e-6, t.dtype)

def parts_i(i):
    return (pert(parts[0], i), parts[1], parts[2])

bench(lambda i: FBA._fba_tail_slow(pert(h4, i), skip2, pert(ex1, i), p),
      "reference-shaped tail")
bench(lambda i: FBA._fba_tail_fast16(pert(h4, i), skip2, parts_i(i), p)[0],
      "16-pack fast tail (no ring)")
bench(lambda i: FBA._fba_tail(pert(h4, i), skip2, parts_i(i), p),
      "16-pack + batched ring strips (production)")
