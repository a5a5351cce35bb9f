"""Is Mosaic compile cost per-program or per-process?  Compile the same
trivial kernel twice (cold, warm-process new-shape) and a lane-shuffle
kernel, timing each."""

import time

import jax
import numpy as np
from jax import numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def trivial(N):
    def kernel(x_ref, out_ref):
        out_ref[:] = x_ref[:] * 2.0

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.zeros((N, 128), jnp.float32)
    t0 = time.perf_counter()
    np.asarray(run(x))
    print(f"trivial N={N}: {time.perf_counter()-t0:.0f}s", flush=True)


def shuffle(N, reps):
    def kernel(x_ref, i_ref, out_ref):
        idx = i_ref[:]

        def body(i, x):
            return jnp.take_along_axis(x, idx, axis=1)

        out_ref[:] = jax.lax.fori_loop(0, reps, body, x_ref[:])

    @jax.jit
    def run(x, i):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, i)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, 128)), jnp.float32)
    i = jnp.asarray(rng.integers(0, 128, (N, 128)), jnp.int32)
    t0 = time.perf_counter()
    np.asarray(run(x, i))
    print(f"shuffle N={N}: compile {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(run(x, i))
        ts.append(time.perf_counter() - t0)
    t = (np.median(ts) - 0.030) / reps
    print(f"shuffle N={N}: {t*1e6:.2f} us/pass ({t/(N*128)*1e9:.3f} ns/elem)",
          flush=True)


trivial(8)
trivial(16)
shuffle(1664, 1024)
