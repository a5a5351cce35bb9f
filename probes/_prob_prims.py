"""Measure the remaining permutation-network primitives on TPU:
P1: per-vreg sublane gather sweep over a (R,128) buffer (fori_loop)
P2: (128,128) tile transposes + (T,128,128)<->(128,T,128) swapaxes relayout
P3: lane cumsum via upper-tri matmul (MXU)
"""

import sys
import time

import jax
import numpy as np
from jax import numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 1664, 128
T = R // 128


def timeprog(run, args, reps, label):
    t0 = time.perf_counter()
    try:
        np.asarray(run(*args))
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
        return
    print(f"{label}: compile {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        ts.append(time.perf_counter() - t0)
    t = (np.median(ts) - 0.030) / reps
    print(f"{label}: {t*1e6:.2f} us/pass ({t/(R*L)*1e9:.3f} ns/elem)", flush=True)


def p1_vreg_gather(reps=256):
    def kernel(x_ref, idx_ref, out_ref):
        idx = idx_ref[:]

        def outer(k, buf):
            parts = [
                jnp.take_along_axis(
                    buf[8 * v : 8 * v + 8], idx[8 * v : 8 * v + 8], axis=0
                )
                for v in range(R // 8)
            ]
            return jnp.concatenate(parts, axis=0)

        out_ref[:] = jax.lax.fori_loop(0, reps, outer, x_ref[:])

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, L)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 8, (R, L)), jnp.int32)
    timeprog(run, (x, idx), reps, "P1 vreg-gather full (R,128)")


def p2_transpose(reps=512):
    def kernel(x_ref, out_ref):
        def body(i, x):
            x3 = x.reshape(T, 128, L)
            xt = jnp.swapaxes(x3, 1, 2)  # per-tile (128,128) transpose
            y = jnp.swapaxes(xt, 0, 1)  # relayout (T,128,L)->(128,T,L)
            z = jnp.swapaxes(y, 0, 1)
            return jnp.swapaxes(z, 1, 2).reshape(R, L)

        out_ref[:] = jax.lax.fori_loop(0, reps, body, x_ref[:])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, L)), jnp.float32)
    timeprog(run, (x,), reps, "P2 2x tile-transpose + 2x relayout")


def p3_cumsum(reps=1024):
    def kernel(x_ref, tri_ref, out_ref):
        tri = tri_ref[:]

        def body(i, x):
            c = jax.lax.dot_general(
                x, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return c * 1e-3

        out_ref[:] = jax.lax.fori_loop(0, reps, body, x_ref[:])

    @jax.jit
    def run(x, tri):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, tri)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, L)), jnp.float32)
    tri = jnp.asarray(np.triu(np.ones((L, L), np.float32)))
    timeprog(run, (x, tri), reps, "P3 lane-cumsum tri-matmul")


if __name__ == "__main__":
    which = sys.argv[1:] or ["1", "2", "3"]
    if "1" in which:
        p1_vreg_gather()
    if "2" in which:
        p2_transpose()
    if "3" in which:
        p3_cumsum()
