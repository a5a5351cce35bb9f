"""Probing utilities: online statistics and operator diagonals.

jax-native counterparts of ``nifty/cl/probing.py``: a Welford
:class:`StatCalculator` for streaming mean/variance, stochastic
(Hutchinson) and exact probing of the diagonal of a linear map, and the
posterior-sample probe used to build CG preconditioners
(``approximation2endo``-style diagonal estimates).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax import numpy as jnp
from jax import random
from jax.tree_util import tree_map

from .utils.tree import random_like

__all__ = [
    "StatCalculator",
    "probe_diagonal",
    "probe_with_posterior_samples",
]


class StatCalculator:
    """Streaming (Welford) mean/variance over pytrees
    (reference: ``nifty/cl/probing.py:24``)."""

    def __init__(self):
        self._count = 0
        self._mean = None
        self._m2 = None

    def add(self, value):
        self._count += 1
        if self._mean is None:
            self._mean = tree_map(jnp.asarray, value)
            self._m2 = tree_map(jnp.zeros_like, self._mean)
            return
        delta = tree_map(jnp.subtract, value, self._mean)
        self._mean = tree_map(
            lambda m, d: m + d / self._count, self._mean, delta
        )
        delta2 = tree_map(jnp.subtract, value, self._mean)
        self._m2 = tree_map(
            lambda m2, d, d2: m2 + d * d2, self._m2, delta, delta2
        )

    @property
    def mean(self):
        if self._count == 0:
            raise RuntimeError("no samples added")
        return self._mean

    @property
    def var(self):
        if self._count < 2:
            raise RuntimeError("need at least two samples for a variance")
        return tree_map(lambda m2: m2 / (self._count - 1), self._m2)


def probe_diagonal(
    op: Callable,
    proto,
    key=None,
    *,
    n_probes: int = 0,
):
    """Diagonal of the linear map `op` on arrays/pytrees shaped like
    `proto`.

    With ``n_probes == 0`` the diagonal is computed *exactly* by basis
    probing (cost = one `op` application per element — use for small
    operators); otherwise by the Hutchinson estimator with Rademacher
    probes (cost = `n_probes` applications).  Reference:
    ``nifty/cl/probing.py:112``."""
    if n_probes <= 0:
        flat, unravel = jax.flatten_util.ravel_pytree(
            tree_map(jnp.zeros_like, proto)
        )
        n = flat.size

        def one(i):
            e = unravel(flat.at[i].set(1.0))
            r = op(e)
            return jax.flatten_util.ravel_pytree(r)[0][i]

        diag = jax.lax.map(one, jnp.arange(n))
        return unravel(diag)

    if key is None:
        raise ValueError("stochastic probing needs a PRNG `key`")
    stat = StatCalculator()
    for i in range(n_probes):
        key, sk = random.split(key)
        probe = tree_map(
            lambda p: random.rademacher(
                random.fold_in(sk, 0), p.shape, dtype=jnp.result_type(p)
            ),
            tree_map(jnp.asarray, proto),
        )
        stat.add(tree_map(jnp.multiply, probe, op(probe)))
    return stat.mean


def probe_with_posterior_samples(
    draw_sample: Callable,
    post_op: Optional[Callable],
    n_probes: int,
    key,
):
    """Mean/variance of (a function of) posterior samples drawn by
    `draw_sample(key)` (reference: ``nifty/cl/probing.py:74``)."""
    stat = StatCalculator()
    for _ in range(n_probes):
        key, sk = random.split(key)
        s = draw_sample(sk)
        stat.add(s if post_op is None else post_op(s))
    return stat.mean, (stat.var if n_probes > 1 else None)
