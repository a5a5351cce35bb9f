"""Probe 6: large-grid knot-path component costs (4096^2 / 10240^2)."""
import sys
import time

import jax
import numpy as np
from jax import numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
K = 16
SHAPE = (N, N)
CORE = (N // 2 + 1, N // 2 + 1)

from nifty_tpu.models.correlated_field import (  # noqa: E402
    _mirror_unfold,
    _pwl_relu_features,
    _rel_log_k_grid,
)
from nifty_tpu.ops.fft import hartley  # noqa: E402


def chain(f, proto, k=K):
    @jax.jit
    def prog(c0):
        def body(i, c):
            out = f(jax.tree_util.tree_map(lambda a: a * (1 + 1e-30), c))
            return jax.tree_util.tree_map(
                lambda a, b: a * 0.5 + b * 1e-30, c, out
            )

        c = jax.lax.fori_loop(0, k, body, proto)
        return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(c))

    float(prog(proto))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(prog(proto))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / k


def report(name, f, proto):
    t = chain(f, proto)
    print(f"{name:50s} {t * 1e3:9.3f} ms", flush=True)


xfull = jnp.asarray(np.random.randn(*SHAPE).astype(np.float32))
report("hartley (one 2-D transform)", lambda c: hartley(c) * (1.0 / N), xfull)

knots = jnp.linspace(0.0, 10.0, 64)
coef = jnp.asarray(np.random.randn(64).astype(np.float32))


def knot_fwd(c):
    x, nz = _rel_log_k_grid(SHAPE, (1.0 / N, 1.0 / N), core=True)
    ln = c["slope"] * x + _pwl_relu_features(x, knots, coef * (1 + c["slope"] * 1e-30))
    spec = jnp.where(nz, jnp.exp(ln), 0.0)
    return {"slope": jnp.sum(spec) * 1e-30}


report("knot amplitude fwd (core, incl. x+exp+reduce)", knot_fwd, {"slope": jnp.zeros(())})


def pwl_transpose_probe(c):
    x, nz = _rel_log_k_grid(SHAPE, (1.0 / N, 1.0 / N), core=True)

    def f(co):
        return jnp.sum(_pwl_relu_features(x, knots, co) * (1 + c["s"] * 1e-30))

    g = jax.grad(f)(coef)
    return {"s": jnp.sum(g) * 1e-30}


report("pwl transpose (grad wrt coef)", pwl_transpose_probe, {"s": jnp.zeros(())})

xcore = jnp.asarray(np.random.randn(*CORE).astype(np.float32))
report("mirror_unfold core->full", lambda c: _mirror_unfold(c, SHAPE)[:: 2, :: 2][: CORE[0], : CORE[1]] * 1.0, xcore)
