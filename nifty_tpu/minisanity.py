"""Residual sanity diagnostics: per-key reduced χ² tables.

Behavioral parity with ``nifty/re/minisanity.py``; independent
implementation.
"""

from __future__ import annotations

import pprint
from typing import Any, NamedTuple

from jax import numpy as jnp
from jax.tree_util import tree_map

from .evi import Samples
from .utils.tree import Vector, get_map

__all__ = ["ChiSqStats", "minisanity", "reduced_residual_stats"]


class ChiSqStats(NamedTuple):
    mean: Any
    reduced_chisq: Any
    ndof: Any


def _leaf_stats(x):
    ndof = x.size if jnp.isrealobj(x) else 2 * x.size
    mean = jnp.sum(x) / x.size
    rchisq = jnp.vdot(x, x).real / ndof
    return mean, rchisq, ndof


def reduced_residual_stats(position_or_samples, func=None, *, map="vmap"):
    """Sample-averaged mean, reduced χ², and #dof for every leaf of
    `func(x)` (or `x`)."""
    map = get_map(map)
    if not isinstance(position_or_samples, Samples) or len(position_or_samples) == 0:
        if isinstance(position_or_samples, Samples):
            position_or_samples = position_or_samples.pos
        batched = tree_map(lambda x: x[jnp.newaxis, ...], position_or_samples)
    else:
        batched = position_or_samples.samples
    if func is not None:
        batched = map(func)(batched)

    per_sample = map(_leaf_stats)

    def stats(leaf_batch):
        m, rx, nd = per_sample(leaf_batch)
        return ChiSqStats(
            jnp.array([jnp.mean(m), jnp.std(m)]),
            jnp.array([jnp.mean(rx), jnp.std(rx)]),
            nd[0],
        )

    return tree_map(stats, batched)


def _pretty(tree, *, _indent=0, _key="") -> str:
    if isinstance(tree, Vector):
        return _pretty(tree.tree, _indent=_indent)
    if isinstance(tree, dict):
        msg = ""
        for k, v in tree.items():
            key = _key + "/" * bool(_key) + str(k)
            if isinstance(v, dict):
                msg += _pretty(v, _indent=_indent, _key=key)
            else:
                msg += "  " * _indent + f"{key:24s}::"
                sub = _pretty(v, _indent=_indent + 1)
                msg += (" " + sub.lstrip()) if len(sub.splitlines()) == 1 else "\n" + sub
        return msg
    if isinstance(tree, (tuple, list)):
        msg = "(\n"
        for v in tree:
            msg += _pretty(v, _indent=_indent + 1)
        return msg + ")\n"
    return "  " * _indent + pprint.pformat(tree) + "\n"


def minisanity(position_or_samples, func=None, *, map="vmap"):
    """Reduced-χ² statistics plus a pretty-printable table."""
    stat_tree = reduced_residual_stats(position_or_samples, func=func, map=map)

    def fmt(x):
        rsq, m = x.reduced_chisq, x.mean
        return (
            f"reduced Chi²:{float(rsq[0]):8.2}±{float(rsq[1]):8.2}"
            f", avg:{float(m[0]):+9.2}±{float(m[1]):8.2}"
            f", #dof:{int(x.ndof):7d}"
        )

    ps = tree_map(fmt, stat_tree, is_leaf=lambda l: isinstance(l, ChiSqStats))
    return stat_tree, _pretty(ps)
