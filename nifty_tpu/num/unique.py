"""Tolerant uniqueness of sub-arrays — the dedup machinery behind
multi-grid stencil compression.

Behavioral counterpart of the reference's ``nifty/re/num/unique.py``
(`unique`, `amend_unique`, `amend_unique_`); independent implementation:
the host-side `unique` quantizes with a stable two-pass
representative-matching loop, and the traced `amend_unique_` uses masked
first-slot insertion so it jits with static shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import numpy as np
from jax import numpy as jnp

__all__ = ["unique", "amend_unique", "amend_unique_"]


def _reduce_axes(ndim: int, axis: int):
    axis = int(np.arange(ndim)[axis])
    return axis, tuple(a for a in range(ndim) if a != axis)


def unique(
    ar,
    *,
    return_inverse: bool = False,
    axis: int = -1,
    atol: float = 1e-10,
    rtol: float = 1e-5,
):
    """Approximately unique sub-arrays of `ar` along `axis`.

    Efficient when the number of distinct sub-arrays is small: each pass
    picks the first unmatched sub-array as a representative and absorbs
    everything within ``atol + rtol·|x|`` of it.
    """
    if not isinstance(axis, int):
        raise TypeError(f"`axis` must be int; got {type(axis)!r}")
    ar = np.asarray(ar)
    axis, ra = _reduce_axes(ar.ndim, axis)
    n = ar.shape[axis]
    inverse = np.full(n, -1, dtype=int)
    reps = []
    remaining = np.ones(n, dtype=bool)
    while remaining.any():
        i = int(np.nonzero(remaining)[0][0])
        rep = np.take(ar, (i,), axis=axis)
        reps.append(rep)
        close = np.zeros(n, dtype=bool)
        cand = np.take(ar, np.nonzero(remaining)[0], axis=axis)
        close[remaining] = np.all(
            np.abs(rep - cand) <= (atol + rtol * np.abs(cand)), axis=ra
        )
        inverse[close] = len(reps) - 1
        remaining &= ~close
    uniqs = np.concatenate(reps, axis=axis)
    if return_inverse:
        assert np.all(inverse >= 0)
        return uniqs, inverse
    return uniqs


def amend_unique(ar, el, *, axis: int = -1, atol: float = 1e-10, rtol: float = 1e-5):
    """Append `el` to `ar` along `axis` unless an approximately equal
    sub-array already exists; returns ``(array, index)``."""
    if not isinstance(axis, int):
        raise TypeError(f"`axis` must be int; got {type(axis)!r}")
    ar = np.asarray(ar)
    axis, ra = _reduce_axes(ar.ndim, axis)
    el_e = np.expand_dims(np.asarray(el), axis=axis)
    close = np.all(np.abs(ar - el_e) <= (atol + rtol * np.abs(el_e)), axis=ra)
    hits = np.nonzero(close)[0]
    if hits.size:
        return ar, int(hits[0])
    return np.concatenate((ar, el_e), axis=axis), ar.shape[axis]


@partial(jax.jit, static_argnames=("axis",))
def amend_unique_(ar, el, *, axis: int = -1, atol: float = 1e-10, rtol: float = 1e-5):
    """Traced variant with static shapes: `ar` is a fixed-capacity buffer
    whose free slots hold NaN; `el` fills the first free slot unless an
    approximately equal entry exists.  Returns ``(buffer, index)``."""
    if not isinstance(axis, int):
        raise TypeError(f"`axis` must be int; got {type(axis)!r}")
    axis_, ra = _reduce_axes(jnp.ndim(ar), axis)
    el_e = jnp.expand_dims(el, axis=axis_)
    close = jnp.all(jnp.abs(ar - el_e) <= (atol + rtol * jnp.abs(el_e)), axis=ra)
    missing = -(1 << 31)
    free = jnp.nonzero(
        jnp.all(jnp.isnan(ar), axis=ra), size=1, fill_value=missing
    )[0][0]
    found = jnp.any(close)
    fill = jnp.where(found, jnp.full_like(el_e, jnp.nan), el_e)
    ar = ar.at[(slice(None),) * axis_ + (free,)].set(
        jnp.squeeze(fill, axis=axis_)
    )
    idx = jnp.nonzero(close, size=1, fill_value=missing)[0][0]
    return ar, jnp.where(found, idx, free)
