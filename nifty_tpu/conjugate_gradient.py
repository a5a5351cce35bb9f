"""Conjugate gradient on pytrees.

Two variants with identical convergence semantics:

* :func:`cg` — host-side loop; cheap per-iteration Python logic, lets the
  caller stop early.  Each matrix-vector product is still a jitted device
  computation.
* :func:`static_cg` — the TPU-native default: the whole solve is one
  ``lax.while_loop`` inside ``jit``; no host↔device synchronization per
  iteration.  When the operand tree is sharded over a mesh, the ``vdot``
  reductions lower to ``psum`` collectives over ICI, so the same code is
  the distributed CG.

Convergence criteria (absdelta on the CG energy, residual norm, miniter /
maxiter, curvature guards, periodic residual recomputation) mirror the
reference (``nifty/re/conjugate_gradient.py:77-215,217-450``); independent
implementation.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
from jax import numpy as jnp
from jax import lax
from jax.tree_util import Partial, tree_map

from .logger import logger
from .utils.tree import norm as tree_norm
from .utils.tree import result_type, size, tree_axpy, vdot, where, zeros_like

__all__ = ["CGResults", "cg", "static_cg"]

N_RESET = 20  # recompute the residual exactly every N iterations


class CGResults(NamedTuple):
    x: Any
    nit: Any
    nfev: Any
    info: Any
    success: Any


def _cg_defaults(j, absdelta, resnorm, tol, atol, miniter, maxiter, norm_ord):
    norm_ord = 2 if norm_ord is None else norm_ord
    maxiter_fallback = 20 * size(j)  # SciPy NewtonCG heuristic
    if miniter is None:
        miniter = min(6, maxiter if maxiter is not None else maxiter_fallback)
    if maxiter is None:
        maxiter = max(min(200, maxiter_fallback), miniter)
    if absdelta is None and resnorm is None:
        resnorm = jnp.maximum(tol * tree_norm(j, ord=norm_ord), atol)
    return absdelta, resnorm, miniter, maxiter, norm_ord


def cg(
    mat: Callable,
    j,
    x0=None,
    *,
    absdelta=None,
    resnorm=None,
    norm_ord=None,
    tol: float = 1e-5,
    atol: float = 0.0,
    miniter: Optional[int] = None,
    maxiter: Optional[int] = None,
    name: Optional[str] = None,
    _raise_nonposdef: bool = True,
    **_ignored,
) -> CGResults:
    """Solve `mat(x) = j` for positive-definite `mat` with a host loop."""
    absdelta, resnorm, miniter, maxiter, norm_ord = _cg_defaults(
        j, absdelta, resnorm, tol, atol, miniter, maxiter, norm_ord
    )
    dtp = result_type(j)
    eps = 6.0 * jnp.finfo(dtp).eps
    tiny = 6.0 * jnp.finfo(dtp).tiny

    if x0 is None:
        pos = zeros_like(j)
        r = tree_map(jnp.negative, j)
        energy = 0.0
        nfev = 0
    else:
        pos = x0
        r = tree_map(jnp.subtract, mat(pos), j)
        energy = float(jnp.real(vdot(tree_map(lambda a, b: (a - b) / 2, r, j), pos)))
        nfev = 1
    d = r
    gamma_prev = float(jnp.real(vdot(r, r)))
    if gamma_prev == 0.0:
        return CGResults(x=pos, info=0, nit=0, nfev=nfev, success=True)

    info = -1
    i = 0
    for i in range(1, maxiter + 1):
        q = mat(d)
        nfev += 1
        curv = float(jnp.real(vdot(d, q)))
        if curv == 0.0:
            if _raise_nonposdef:
                raise ValueError(f"{name or 'CG'}: zero curvature")
            info = 0
            break
        if curv < 0.0:
            if _raise_nonposdef:
                raise ValueError(f"{name or 'CG'}: negative curvature")
            if i == 1:
                # fall back to a short gradient step along -j
                pos = tree_map(lambda x: (gamma_prev / (-curv)) * (-x), j)
            info = 0
            break
        alpha = gamma_prev / curv
        pos = tree_axpy(-alpha, d, pos)
        if i % N_RESET == 0:
            r = tree_map(jnp.subtract, mat(pos), j)
            nfev += 1
        else:
            r = tree_axpy(-alpha, q, r)
        gamma = float(jnp.real(vdot(r, r)))
        if 0.0 <= gamma <= tiny:
            info = 0
            break
        if resnorm is not None:
            rn = float(tree_norm(r, ord=norm_ord))
            if name is not None:
                logger.info(f"{name}: CG it {i} resnorm {rn:.3e}")
            if rn < resnorm and i >= miniter:
                info = 0
                break
        new_energy = float(
            jnp.real(vdot(tree_map(lambda a, b: (a - b) / 2, r, j), pos))
        )
        energy_diff = energy - new_energy
        if energy_diff < -eps * abs(new_energy):
            if _raise_nonposdef:
                raise ValueError(f"{name or 'CG'}: energy increased")
            info = i
            break
        if absdelta is not None and energy_diff < absdelta and i >= miniter:
            info = 0
            break
        energy = new_energy
        beta = max(0.0, gamma / gamma_prev)
        d = tree_axpy(beta, d, r)
        gamma_prev = gamma
    info = i if info == -1 else info
    return CGResults(x=pos, info=info, nit=i, nfev=nfev, success=info == 0)


def static_cg(
    mat: Callable,
    j,
    x0=None,
    *,
    absdelta=None,
    resnorm=None,
    norm_ord=None,
    tol: float = 1e-5,
    atol: float = 0.0,
    miniter: Optional[int] = None,
    maxiter: Optional[int] = None,
    name: Optional[str] = None,
    _raise_nonposdef: bool = False,
    **_ignored,
) -> CGResults:
    """Fully-jittable CG: one `lax.while_loop`, no host synchronization.

    Negative/zero curvature and energy increases terminate the loop with
    the best iterate found; `info` encodes the termination cause (0 =
    converged, >0 = stopped at iteration `info`, -1 = failure when
    `_raise_nonposdef`).
    """
    absdelta, resnorm, miniter, maxiter, norm_ord = _cg_defaults(
        j, absdelta, resnorm, tol, atol, miniter, maxiter, norm_ord
    )
    dtp = result_type(j)
    eps = 6.0 * jnp.finfo(dtp).eps
    tiny = 6.0 * jnp.finfo(dtp).tiny

    if x0 is None:
        pos = zeros_like(j)
        r = tree_map(jnp.negative, j)
        energy = jnp.asarray(0.0, dtype=dtp)
    else:
        pos = x0
        r = tree_map(jnp.subtract, mat(pos), j)
        energy = jnp.real(vdot(tree_map(lambda a, b: (a - b) / 2, r, j), pos))

    state = {
        "pos": pos,
        "r": r,
        "d": r,
        "iteration": jnp.zeros((), jnp.int32),
        "gamma": jnp.real(vdot(r, r)),
        "energy": energy,
        "info": jnp.asarray(-2, jnp.int32),  # -2 = keep iterating
    }

    def cont(s):
        return s["info"] < -1

    def step(s):
        i = s["iteration"] + 1
        info = s["info"]
        q = mat(s["d"])
        curv = jnp.real(vdot(s["d"], q))
        gamma_prev = s["gamma"]
        alpha = gamma_prev / curv
        bad_curv = curv <= 0.0
        info = jnp.where(bad_curv, -1 if _raise_nonposdef else 0, info)
        alpha = jnp.where(bad_curv, 0.0, alpha)
        pos = tree_axpy(-alpha, s["d"], s["pos"])
        r = lax.cond(
            (i % N_RESET == 0) & (info < -1),
            lambda op: tree_map(jnp.subtract, mat(op[0]), j),
            lambda op: tree_axpy(-op[2], op[3], op[1]),
            (pos, s["r"], alpha, q),
        )
        gamma = jnp.real(vdot(r, r))
        info = jnp.where((gamma <= tiny) & (info != -1), 0, info)
        if resnorm is not None:
            rn = tree_norm(r, ord=norm_ord)
            info = jnp.where((rn < resnorm) & (i >= miniter) & (info != -1), 0, info)
        energy = jnp.real(vdot(tree_map(lambda a, b: (a - b) / 2, r, j), pos))
        energy_diff = s["energy"] - energy
        info = jnp.where(
            energy_diff < -eps * jnp.abs(energy),
            -1 if _raise_nonposdef else i.astype(jnp.int32),
            info,
        )
        if absdelta is not None:
            info = jnp.where(
                (energy_diff < absdelta) & (i >= miniter) & (info != -1), 0, info
            )
        info = jnp.where((i >= maxiter) & (info != -1), i.astype(jnp.int32), info)
        d = tree_axpy(jnp.maximum(0.0, gamma / gamma_prev), s["d"], r)
        return {
            "pos": pos,
            "r": r,
            "d": d,
            "iteration": i,
            "gamma": gamma,
            "energy": energy,
            "info": info.astype(jnp.int32),
        }

    zero_j = state["gamma"] == 0.0
    state["info"] = jnp.where(zero_j, 0, state["info"]).astype(jnp.int32)
    final = lax.while_loop(cont, step, state)
    return CGResults(
        x=final["pos"],
        info=final["info"],
        nit=final["iteration"],
        nfev=final["iteration"],
        success=final["info"] == 0,
    )
