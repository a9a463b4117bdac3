"""Measure the XLA texel-gather bound behind the textured-tier ceiling
(re-landed round 5 — the round-3/4 original died with that VM's disk).

BASELINE.md's textured derivation rests on two measured claims:
  1. a deferred XLA row gather costs ~2.4-3 cycles/fetch, invariant to
     coherence/layout/table size (round 3, 7 formulations);
  2. the bilinear 4-tap epilogue costs ~4x the single tap (round 4's
     "measure, don't assert" item, VERDICT r3 #7).
This microbench re-measures both on-chip so the derivation stays
current: a (6*dim*dim, 3) f32 texel table (the skybox layout
render/skybox.py packs), M = 480*280*10 fetches (the bench textured
workload's per-frame count), single-tap vs 4-tap-with-lerp vs a
no-gather control (same index math, contiguous rows).

Timing uses bench.py's hardened slope method; indices are perturbed by
the camera-time input so the tunnel's (executable, input values) result
cache never replays.

Usage: python scratch/gather_4tap.py [dim=256]
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import bench

dim = int(sys.argv[1]) if len(sys.argv) > 1 else 256
T = 6 * dim * dim
M = 480 * 280 * 10  # bench textured tier: one sky fetch per AA sample

key = jax.random.PRNGKey(0)
table = jax.random.uniform(key, (T, 3), jnp.float32)
base_idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, T - dim - 2,
                              jnp.int32)
wu = jax.random.uniform(jax.random.PRNGKey(2), (M,), jnp.float32)
wv = jax.random.uniform(jax.random.PRNGKey(3), (M,), jnp.float32)
jax.block_until_ready((table, base_idx, wu, wv))


def perturb(t):
    # fresh input values each timed frame (tunnel result cache)
    return (base_idx + (t * 997.0).astype(jnp.int32)) % (T - dim - 2)


@jax.jit
def tap1(table, t):
    idx = perturb(t)
    return table[idx].sum(axis=0), jnp.uint32(M)


@jax.jit
def tap4(table, t):
    i00 = perturb(t)
    c00, c01 = table[i00], table[i00 + 1]
    c10, c11 = table[i00 + dim], table[i00 + dim + 1]
    u = wu[:, None]
    v = wv[:, None]
    c = (c00 * (1 - u) + c01 * u) * (1 - v) + (c10 * (1 - u) + c11 * u) * v
    return c.sum(axis=0), jnp.uint32(4 * M)


@jax.jit
def control(table, t):
    # identical index math + (M, 3) elementwise + reduction, NO gather
    idx = perturb(t)
    c = table[0][None, :] * idx.astype(jnp.float32)[:, None]
    return c.sum(axis=0), jnp.uint32(M)


series = bench.TimeSeries(jnp.float32, base=3000.0, step=0.73)
print(f"table ({T}, 3) f32 = {T * 12 / 1e6:.1f} MB, M={M} fetches", flush=True)
results = {}
for name, fn in (("control", control), ("tap1", tap1), ("tap4", tap4)):
    sec, _, pers = bench._throughput(fn, table, series, n_small=4,
                                     n_big=16, repeats=3)
    results[name] = sec
    print(f"{name:>7}: {sec * 1e3:7.3f} ms "
          f"(runs {[round(p * 1e3, 3) for p in pers]})", flush=True)

g1 = results["tap1"] - results["control"]
g4 = results["tap4"] - results["control"]
ghz = 0.94  # v5e ~940 MHz
print(f"single-tap gather: {g1 / M * 1e9:.2f} ns/fetch "
      f"= {g1 / M * 1e9 * ghz:.2f} cycles/fetch", flush=True)
print(f"4-tap bilinear:    {g4 / (4 * M) * 1e9:.2f} ns/fetch "
      f"({g4 / max(g1, 1e-12):.2f}x the single tap)", flush=True)
