"""Small shared helpers (reference analogue: ``nifty/re/misc.py``)."""

from functools import partial
from typing import Callable, Optional

import jax
import numpy as np
from jax import numpy as jnp

__all__ = [
    "conditional_call",
    "conditional_raise",
    "hvp",
    "interpolate",
    "wrap",
    "wrap_left",
]


def wrap(call: Callable, name) -> Callable:
    """Adapt `call` to act on `x[name]` of a dict-like input."""

    def named_call(x, *args, **kwargs):
        return call(x[name], *args, **kwargs)

    return named_call


def wrap_left(call: Callable, name) -> Callable:
    """Adapt `call` so its output is wrapped in a dict under `name`."""

    def named_call(*args, **kwargs):
        return {name: call(*args, **kwargs)}

    return named_call


def hvp(f, primals, tangents):
    """Hessian-vector product of scalar function `f`."""
    return jax.jvp(jax.grad(f), primals, tangents)[1]


def interpolate(
    xmin=-7.0, xmax=7.0, *, num: int = 1400
) -> Callable:
    """Decorator: replace an expensive pointwise function by linear
    interpolation on a tabulated grid (reference: ``nifty/re/misc.py:82``)."""

    def decorator(f):
        xs = np.linspace(xmin, xmax, num)
        ys = jnp.asarray(f(xs))
        xs = jnp.asarray(xs)

        def interpolated(x):
            return jnp.interp(x, xs, ys)

        return interpolated

    return decorator


def _raise(exception):
    raise exception


def conditional_raise(condition, exception):
    """Raise `exception` from within jitted code when `condition` is true."""

    def maybe_raise(c):
        if c:
            raise exception

    jax.debug.callback(maybe_raise, condition)


def conditional_call(condition, call, *args):
    jax.lax.cond(condition, lambda a: jax.debug.callback(call, *a), lambda a: None, args)
