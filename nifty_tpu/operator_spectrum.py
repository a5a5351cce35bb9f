"""Eigenvalue spectra of endomorphic pytree operators.

Public counterpart of the ELBO's internal deflated-Lanczos machinery and
the reference's ARPACK-based diagnostic (``nifty/cl/operator_spectrum.py:80``):
given any linear endomorphic callable on pytrees (a metric, curvature,
preconditioned operator, …), return its leading eigenvalues — entirely
on-device (batched deflated Lanczos with full reorthogonalization; no
scipy/ARPACK round-trips).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np
from jax import numpy as jnp
from jax import random
from jax.flatten_util import ravel_pytree

from .evidence_lower_bound import _eigsh_lanczos

__all__ = ["operator_spectrum"]


def operator_spectrum(
    op: Callable,
    domain_proto: Any,
    n_eigenvalues: int,
    *,
    key=None,
    hermitian: bool = True,
    dense_cutoff: int = 512,
    n_batches: int = 10,
    krylov_factor: int = 4,
    verbose: bool = False,
) -> np.ndarray:
    """Leading eigenvalues (descending) of the endomorphic operator `op`.

    Parameters
    ----------
    op:
        Linear callable mapping a pytree like `domain_proto` to itself.
    domain_proto:
        Example input pytree (arrays or ShapeWithDtype-compatible leaves
        already realized as arrays) fixing shapes/dtypes.
    n_eigenvalues:
        Number of leading eigenvalues to compute.
    hermitian:
        If True (default) use on-device deflated Lanczos.  If False, the
        operator is materialized densely (only allowed up to
        `dense_cutoff` dofs) and its full complex spectrum is returned.
    dense_cutoff:
        Maximum dof count for the dense (non-hermitian or exact) path.
    """
    x0, unravel = ravel_pytree(domain_proto)
    n = x0.size

    def flat_op(v):
        out, _ = ravel_pytree(op(unravel(v)))
        return out

    if not hermitian:
        if n > dense_cutoff:
            raise ValueError(
                f"non-hermitian spectrum requires dense materialization; "
                f"{n} dofs exceed dense_cutoff={dense_cutoff}"
            )
        mat = jax.vmap(flat_op, in_axes=1, out_axes=1)(jnp.eye(n, dtype=x0.dtype))
        vals = np.linalg.eigvals(np.asarray(mat))
        order = np.argsort(-np.abs(vals))
        return vals[order][:n_eigenvalues]

    key = random.PRNGKey(42) if key is None else key
    vals, _ = _eigsh_lanczos(
        flat_op,
        n,
        x0.dtype,
        int(n_eigenvalues),
        n,
        key=key,
        n_batches=n_batches,
        krylov_factor=krylov_factor,
        early_stop=False,
        verbose=verbose,
    )
    return np.asarray(vals)
