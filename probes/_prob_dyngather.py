"""Measure tpu.dynamic_gather (per-lane sublane gather) cost vs operand
height N, via Pallas take_along_axis.  One program per N, chained inside
the kernel grid to get a stable per-call time.

python probes/_prob_dyngather.py [N ...]
"""

import sys
import time
from functools import partial

import jax
import numpy as np
from jax import numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make(N, L, reps):
    def kernel(x_ref, idx_ref, out_ref):
        x = x_ref[:]
        idx = idx_ref[:]
        acc = jnp.take_along_axis(x, idx, axis=0)
        for _ in range(reps - 1):
            # serial dependency: reuse gathered result as next operand
            acc = jnp.take_along_axis(acc, idx, axis=0)
        out_ref[:] = acc

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, L), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    return run


def main():
    Ns = [int(a) for a in sys.argv[1:]] or [8, 128, 512, 2048]
    L = 128
    rng = np.random.default_rng(0)
    for N in Ns:
        reps = max(1, min(64, (1 << 22) // (N * L)))
        x = jnp.asarray(rng.standard_normal((N, L)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, N, size=(N, L)), jnp.int32)
        run = make(N, L, reps)
        t0 = time.perf_counter()
        try:
            out = np.asarray(run(x, idx))
        except Exception as e:
            print(f"N={N}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue
        print(f"N={N}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=0)
        for _ in range(reps - 1):
            ref = np.take_along_axis(ref, np.asarray(idx), axis=0)
        err = np.abs(out - ref).max()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(run(x, idx))
            ts.append(time.perf_counter() - t0)
        per_call = np.median(ts) / reps
        per_elem = per_call / (N * L) * 1e9
        print(
            f"N={N}: err={err:.1e} reps={reps} {per_call*1e6:.1f} us/gather"
            f" ({per_elem:.3f} ns/elem)",
            flush=True,
        )


if __name__ == "__main__":
    main()
