"""Roofline accounting for the 10240² knot-spectrum Fisher-metric apply.

Measures on the v5e:
  1. achieved streaming bandwidth (elementwise scale, read+write) at
     10240² f32 — the practical HBM roofline for this shape,
  2. one 2-D Hartley at 10240² (the split-real four-step einsum path),
  3. the full CFM+Poisson metric apply (the bench.py headline row),

and derives bytes/apply for the metric from the pass structure of the
implementation, so BENCHMARKS.md can state achieved GB/s vs the
~820 GB/s v5e peak.  Run: python probes/roofline_10240.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import jax
import numpy as np
from jax import numpy as jnp
from jax import random

import nifty_tpu as nt
from nifty_tpu.ops.fft import hartley

N = 10240
NPIX = N * N


def floor_s(n=10):
    f = jax.jit(lambda x: x + 1)
    z = jnp.zeros(())
    float(f(z))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(z))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain_time(f, z0, iters=8, reps=3):
    fl = floor_s()

    @jax.jit
    def run(z):
        def body(i, z):
            out = f(z)
            s = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out)) * 1e-20
            return jax.tree_util.tree_map(lambda q: q * 0.5 + s, z)

        z = jax.lax.fori_loop(0, iters, body, z)
        return sum(jnp.sum(l * 0) for l in jax.tree_util.tree_leaves(z))

    float(run(z0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(z0))
        ts.append((time.perf_counter() - t0 - fl) / iters)
    return max(float(np.median(ts)), 1e-9)


x = jnp.asarray(np.random.default_rng(0).standard_normal((N, N)), jnp.float32)

# 1. streaming bandwidth: one read + one write pass
t_copy = chain_time(lambda z: z * 1.000001, x, iters=16)
bw = 2 * 4 * NPIX / t_copy
print(f"elementwise scale 10240^2: {t_copy*1e3:.3f} ms  -> {bw/1e9:.0f} GB/s "
      f"achieved streaming ({bw/820e9*100:.0f}% of 820 GB/s)", flush=True)

# 2. one full 2-D Hartley
t_h = chain_time(lambda z: hartley(z) * (1.0 / NPIX), x, iters=8)
print(f"hartley 10240^2: {t_h*1e3:.3f} ms  "
      f"(= {t_h/t_copy:.1f} copy-passes)", flush=True)

# 3. the metric apply: exactly bench.py's 10240 row machinery (model and
# position ride as jit *arguments* — closures would serialize ~GB of
# literals into the remote-compile payload)
import bench

lh, pos, tangent = bench.build_likelihood((N, N), n_mode_knots=64)
t_m = bench.time_apply(lh, pos, tangent)
print(f"metric apply 10240^2 knots64: {t_m*1e3:.3f} ms", flush=True)
print(f"  = {t_m/t_h:.2f} hartleys;  4 transforms (jvp: H, H^-1; vjp: "
      f"H^-T, H^-T) predict {4*t_h/t_m*100:.0f}% of the apply", flush=True)
print(f"  elementwise residue: {(t_m-4*t_h)*1e3:.2f} ms = "
      f"{(t_m-4*t_h)/t_copy:.1f} copy-passes", flush=True)
