"""dynamic_gather cost model: per-lane sublane gather (axis 0) at several
operand heights N, and per-sublane lane gather (axis 1).  Each case is one
Pallas program with an internal fori_loop of serial gathers so the device
time dominates the ~30 ms tunnel roundtrip."""

import sys
import time

import jax
import numpy as np
from jax import numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_prog(N, L, axis, reps):
    def kernel(x_ref, idx_ref, out_ref):
        idx = idx_ref[:]

        def body(i, x):
            return jnp.take_along_axis(x, idx, axis=axis)

        out_ref[:] = jax.lax.fori_loop(0, reps, body, x_ref[:])

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
    cases = [
        ("ax0 N=256", 256, 128, 0, 4096),
        ("ax0 N=2048", 2048, 128, 0, 512),
        ("ax1 512x128", 512, 128, 1, 2048),
    ]
    rng = np.random.default_rng(0)
    for name, N, L, axis, reps in cases:
        x = jnp.asarray(rng.standard_normal((N, L)), jnp.float32)
        hi = N if axis == 0 else L
        idx = jnp.asarray(rng.integers(0, hi, (N, L)), jnp.int32)
        run = gather_prog(N, L, axis, reps)
        t0 = time.perf_counter()
        try:
            np.asarray(run(x, idx))
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        print(f"{name}: compile+run {time.perf_counter()-t0:.0f}s", flush=True)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(run(x, idx))
            ts.append(time.perf_counter() - t0)
        t = (np.median(ts) - 0.030) / reps  # subtract ~30ms roundtrip floor
        print(
            f"{name}: {t*1e6:.2f} us/gather, {t/ (N*L) * 1e9:.3f} ns/elem",
            flush=True,
        )


if __name__ == "__main__":
    main()
