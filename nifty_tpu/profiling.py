"""Profiling sugar: timings, call counting, and XLA cost analysis.

TPU-native counterpart of the reference's profiling helpers
(``nifty/cl/sugar.py:606,699,823`` exec_time / operator-tree profiles and
``nifty/cl/operators/counting_operator.py``): instead of timing an eager
operator tree node-by-node, measure the jitted forward/JVP/VJP programs
and read XLA's own cost model (FLOPs, bytes accessed) from the compiled
executable — the numbers that actually govern TPU wall-time.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Mapping, Optional

import jax
import numpy as np
from jax import numpy as jnp

from .logger import logger

__all__ = ["CountingCall", "cost_analysis", "exec_time"]


def _timeit(f, *args, n=3):
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def exec_time(fn: Callable, primals, *, n: int = 3, verbose: bool = True):
    """Median wall-times of the jitted forward, JVP, and VJP of `fn`.

    Returns a dict ``{"forward": s, "jvp": s, "vjp": s, "compile": s}``.
    """
    t0 = time.perf_counter()
    fwd = jax.jit(fn)
    out = jax.block_until_ready(fwd(primals))
    compile_s = time.perf_counter() - t0

    res = {"compile": compile_s, "forward": _timeit(fwd, primals, n=n)}

    jvp = jax.jit(lambda p, t: jax.jvp(fn, (p,), (t,))[1])
    tangent = jax.tree_util.tree_map(jnp.ones_like, primals)
    res["jvp"] = _timeit(jvp, primals, tangent, n=n)

    def _vjp(p, ct):
        _, pull = jax.vjp(fn, p)
        return pull(ct)

    ct = jax.tree_util.tree_map(jnp.ones_like, out)
    vjp = jax.jit(_vjp)
    res["vjp"] = _timeit(vjp, primals, ct, n=n)
    if verbose:
        logger.info(
            "exec_time: compile %.3fs | forward %.3es | jvp %.3es | vjp %.3es"
            % (res["compile"], res["forward"], res["jvp"], res["vjp"])
        )
    return res


def cost_analysis(fn: Callable, primals) -> Mapping[str, float]:
    """XLA's cost model for the compiled `fn`: FLOPs, bytes accessed,
    transcendentals — the roofline inputs for the target hardware."""
    lowered = jax.jit(fn).lower(primals)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    keys = ("flops", "bytes accessed", "transcendentals")
    return {k: float(ca.get(k, 0.0)) for k in keys} | {
        "raw": dict(ca) if hasattr(ca, "items") else ca
    }


class CountingCall:
    """Wrap a callable and count invocations of its forward/JVP/VJP —
    the trace-time analogue of the reference's ``CountingOperator``:
    under ``jit`` each Python-level call corresponds to one inlined
    application in the compiled program, so the counts report how often a
    (sub)model appears per CG step / KL evaluation.
    """

    def __init__(self, fn: Callable, name: str = "op"):
        self.fn = fn
        self.name = name
        self.n_apply = 0
        self.n_jvp = 0
        self.n_vjp = 0

    def __call__(self, x, *args, **kwargs):
        # classify by trace type: JVPTracer → forward-mode pass
        leaves = jax.tree_util.tree_leaves(x)
        from jax._src.interpreters.ad import JVPTracer

        if any(isinstance(l, JVPTracer) for l in leaves):
            self.n_jvp += 1
        else:
            self.n_apply += 1
        return self.fn(x, *args, **kwargs)

    def reset(self):
        self.n_apply = self.n_jvp = self.n_vjp = 0

    def report(self) -> str:
        return (
            f"CountingCall({self.name}): apply={self.n_apply} "
            f"jvp={self.n_jvp}"
        )

    def __repr__(self):
        return self.report()
