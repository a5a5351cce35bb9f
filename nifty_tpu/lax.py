"""Thin shims over ``jax.lax`` control flow with a Python-fallback switch.

Setting ``DISABLE_CONTROL_FLOW_PRIM = True`` routes ``cond`` /
``while_loop`` / ``fori_loop`` through plain Python so kernels (NUTS in
particular) can be stepped through with a debugger.  Mirrors the debug
facility of ``nifty/re/lax.py``; independent implementation.
"""

from __future__ import annotations

from jax import lax

DISABLE_CONTROL_FLOW_PRIM = False

__all__ = ["cond", "while_loop", "fori_loop"]


def cond(pred, true_fun, false_fun, *operands):
    if DISABLE_CONTROL_FLOW_PRIM:
        return true_fun(*operands) if bool(pred) else false_fun(*operands)
    return lax.cond(pred, true_fun, false_fun, *operands)


def while_loop(cond_fun, body_fun, init_val):
    if DISABLE_CONTROL_FLOW_PRIM:
        val = init_val
        while bool(cond_fun(val)):
            val = body_fun(val)
        return val
    return lax.while_loop(cond_fun, body_fun, init_val)


def fori_loop(lower, upper, body_fun, init_val):
    if DISABLE_CONTROL_FLOW_PRIM:
        val = init_val
        for i in range(int(lower), int(upper)):
            val = body_fun(i, val)
        return val
    return lax.fori_loop(lower, upper, body_fun, init_val)
