"""XLA (non-Pallas) take_along_axis cost on TPU for (R, 128) layouts:
does XLA:TPU vectorize per-lane (axis 0) and per-row (axis 1) gathers?
Fast compiles — safe to run in foreground."""

import time
from functools import partial

import jax
import numpy as np
from jax import numpy as jnp


def timeit(fn, *args, reps=512, label=""):
    @jax.jit
    def chain(a, b):
        def body(i, x):
            return fn(x, b)

        x = jax.lax.fori_loop(0, reps, body, a)
        return jnp.sum(x * 0)

    t0 = time.perf_counter()
    float(chain(*args))
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(chain(*args))
        ts.append(time.perf_counter() - t0)
    t = (np.median(ts) - 0.030) / reps
    n = args[0].size
    print(
        f"{label}: {t*1e6:.2f} us ({t/n*1e9:.3f} ns/elem)  [compile {comp:.0f}s]",
        flush=True,
    )


rng = np.random.default_rng(0)
R, L = 1664, 128
x = jnp.asarray(rng.standard_normal((R, L)), jnp.float32)
idx0 = jnp.asarray(rng.integers(0, R, (R, L)), jnp.int32)
idx1 = jnp.asarray(rng.integers(0, L, (R, L)), jnp.int32)

timeit(lambda x, i: jnp.take_along_axis(x, i, axis=0), x, idx0,
       label="xla taa axis0 (1664,128)")
timeit(lambda x, i: jnp.take_along_axis(x, i, axis=1), x, idx1,
       label="xla taa axis1 (1664,128)")

# flat arbitrary gather baseline at same size
xf = x.ravel()
idxf = jnp.asarray(rng.integers(0, R * L, (R * L,)), jnp.int32)
timeit(lambda x, i: x[i].reshape(R, L).ravel(), xf, idxf,
       label="xla flat gather 213k")

# static permutation as gather (the unsort op)
perm = jnp.asarray(rng.permutation(R * L).astype(np.int32))
timeit(lambda x, i: x[i], xf, perm, label="xla flat perm 213k")
