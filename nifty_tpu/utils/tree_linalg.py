"""Symmetric-matrix functions mapped over pytree leaves.

One mechanism covers every need of the full-covariance likelihoods
(`NDVariableCovarianceGaussian`): a *spectral function* ``f(M) =
U f(Λ) Uᵀ`` of a symmetric matrix, with the Daleckii–Krein formula as a
custom JVP — stable where naive AD through ``eigh`` blows up on (nearly)
degenerate eigenvalues.  Behavioral counterpart of the reference's
``nifty/re/tree_math/util.py:35,107`` (sqrtm/solve); independent
implementation (single spectral-function primitive instead of separate
custom-JVP functions per operation).

Eigendirections with non-positive eigenvalues are projected out (the
reference's convention), so slightly indefinite inputs degrade to the
positive-semidefinite part instead of producing NaNs.

All functions map over pytree leaves and batch over leading axes: every
matrix leaf has shape ``(..., d, d)``.
"""

from __future__ import annotations

from functools import partial

import jax
from jax import numpy as jnp
from jax.tree_util import tree_map

__all__ = ["sym_sqrtm", "sym_logm", "sym_inv", "sym_solve"]


def _valid(v):
    tiny = jnp.finfo(v.dtype).tiny
    return v > tiny


def _make_spectral(fn, dfn):
    """Spectral function with a Daleckii–Krein JVP.

    ``fn``/``dfn`` are scalar functions applied to the eigenvalues;
    invalid (non-positive) eigendirections are mapped to zero.
    """

    @jax.custom_jvp
    def spectral(M):
        v, U = jnp.linalg.eigh(M)
        fv = jnp.where(_valid(v), fn(jnp.where(_valid(v), v, 1.0)), 0.0)
        return (U * fv[None, :]) @ U.T

    @spectral.defjvp
    def spectral_jvp(primals, tangents):
        (M,), (dM,) = primals, tangents
        v, U = jnp.linalg.eigh(M)
        ok = _valid(v)
        vs = jnp.where(ok, v, 1.0)
        fv = jnp.where(ok, fn(vs), 0.0)
        out = (U * fv[None, :]) @ U.T
        # Daleckii–Krein: dF = U (K ∘ (Uᵀ dM U)) Uᵀ with
        # K_ij = (f(v_i) − f(v_j)) / (v_i − v_j), K_ii = f'(v_i)
        dv = vs[:, None] - vs[None, :]
        close = jnp.abs(dv) < 1e-12 * (jnp.abs(vs[:, None]) + jnp.abs(vs[None, :]) + 1e-30)
        num = fv[:, None] - fv[None, :]
        K_far = num / jnp.where(close, 1.0, dv)
        K_near = dfn(0.5 * (vs[:, None] + vs[None, :]))
        K = jnp.where(close, K_near, K_far)
        K = jnp.where(ok[:, None] & ok[None, :], K, 0.0)
        dMt = U.T @ dM @ U
        dout = U @ (K * dMt) @ U.T
        return out, dout

    return spectral


_sqrtm_leaf = _make_spectral(jnp.sqrt, lambda v: 0.5 / jnp.sqrt(v))
_logm_leaf = _make_spectral(jnp.log, lambda v: 1.0 / v)
_inv_leaf = _make_spectral(lambda v: 1.0 / v, lambda v: -1.0 / v**2)


def _leafwise(leaf_fn):
    sig = "(n,n)->(n,n)"
    vf = jnp.vectorize(leaf_fn, signature=sig)
    return lambda M: tree_map(vf, M)


sym_sqrtm_raw = _leafwise(_sqrtm_leaf)
sym_logm_raw = _leafwise(_logm_leaf)
sym_inv_raw = _leafwise(_inv_leaf)


def sym_sqrtm(M):
    """Principal square root of symmetric PSD matrix leaves ``(..., d, d)``."""
    return sym_sqrtm_raw(M)


def sym_logm(M):
    """Matrix logarithm of symmetric positive-definite matrix leaves."""
    return sym_logm_raw(M)


def sym_inv(M):
    """(Pseudo-)inverse of symmetric PSD matrix leaves."""
    return sym_inv_raw(M)


def sym_solve(A, B, *, matrix_eqn: bool = False, transposed: bool = False):
    """Solve ``A X = B`` for symmetric positive-definite ``A`` per leaf.

    ``matrix_eqn=False`` treats ``B`` leaves as stacks of vectors
    ``(..., d)``; ``True`` as matrices ``(..., d, d)``.  ``transposed``
    solves ``Aᵀ Xᵀ = Bᵀ`` (identical for exactly symmetric A; kept for
    API parity with the reference).
    """
    if transposed:
        A = tree_map(lambda a: jnp.swapaxes(a, -1, -2), A)
        B = tree_map(lambda b: jnp.swapaxes(b, -1, -2), B)
    Ainv = sym_inv_raw(A)
    if matrix_eqn:
        out = tree_map(jnp.matmul, Ainv, B)
    else:
        out = tree_map(
            lambda ai, b: jnp.einsum("...ij,...j->...i", ai, b), Ainv, B
        )
    if transposed:
        out = tree_map(lambda x: jnp.swapaxes(x, -1, -2), out)
    return out
