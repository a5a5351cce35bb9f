"""Re-balance excitation amplitude against the spectrum (legacy helper).

Behavioral counterpart of ``nifty/cl/library/adjust_variances.py``:
given a factorization φ = A(θ)·ξ, variations captured by ξ that the
amplitude could represent are absorbed into A by minimizing an
inverse-gamma Hamiltonian over θ with |A·ξ|² held fixed, then rescaling
ξ ← (A_old·ξ_old)/A_new so φ is (approximately) unchanged.
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional, Sequence

import jax
from jax import numpy as jnp
from jax.tree_util import tree_map

from .likelihood import StandardHamiltonian
from .likelihood_impl import InverseGamma
from .optimize import newton_cg
from .utils.tree import Vector

__all__ = ["adjust_variances"]


def adjust_variances(
    position: Mapping,
    amplitude: Callable,
    xi_key: str,
    *,
    amplitude_keys: Optional[Sequence[str]] = None,
    scaling: Optional[float] = None,
    minimize_kwargs: Optional[dict] = None,
):
    """Adjust `position` so ξ = position[xi_key] is closer to white noise.

    `amplitude(position)` must return the per-pixel amplitude
    broadcastable against ξ (for a correlated field, the expanded
    normalized amplitude times the zero mode).  ``amplitude_keys``
    restricts which entries of `position` the constant-likelihood
    optimization may move (default: every key except `xi_key`).

    Returns the updated position dict; φ = A·ξ is exactly preserved.
    """
    position = dict(position)
    xi = position[xi_key]
    a_old = amplitude(position)
    phi = a_old * xi
    d = (jnp.conj(phi) * phi).real

    if amplitude_keys is None:
        amplitude_keys = [k for k in position if k != xi_key]
    amplitude_keys = list(amplitude_keys)
    frozen = {k: v for k, v in position.items() if k not in amplitude_keys}

    def x_of(theta):
        p = {**frozen, **(theta.tree if isinstance(theta, Vector) else theta)}
        a = amplitude(p)
        x = (jnp.conj(a) * a).real
        return x if scaling is None else scaling * x

    lh = InverseGamma(d / 2.0).amend(x_of)
    ham = StandardHamiltonian(lh)

    theta0 = Vector({k: position[k] for k in amplitude_keys})
    kw = dict(maxiter=25, xtol=1e-5)
    kw.update(minimize_kwargs or {})
    res = newton_cg(fun=ham, x0=theta0, **kw)

    new_pos = {**position, **res.x.tree}
    a_new = amplitude(new_pos)
    new_pos[xi_key] = phi / a_new
    return new_pos
