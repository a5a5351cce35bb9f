"""Standard-normal → target-distribution transforms.

All model parameters are standard-normal "excitations"; these transforms
reparametrize them into the desired prior marginals.  Every transform is a
``jax.tree_util.Partial`` so it can live inside model pytrees.

Behavioral parity with ``nifty/re/num/stats_distributions.py``;
independent implementation.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import numpy as np
from jax import numpy as jnp
from jax.scipy.stats import norm as _jnorm
from jax.tree_util import Partial, tree_map

__all__ = [
    "beta_prior",
    "gamma_prior",
    "loginvgamma_prior",
    "interpolator",
    "invgamma_invprior",
    "invgamma_prior",
    "laplace_prior",
    "lognormal_invprior",
    "lognormal_moments",
    "lognormal_prior",
    "normal_invprior",
    "normal_prior",
    "uniform_prior",
]


def _std_to_normal(xi, *, mean, std):
    return mean + std * xi


def normal_prior(mean, std) -> Partial:
    """Affine map: standard normal → N(mean, std²)."""
    return Partial(_std_to_normal, mean=mean, std=std)


def _normal_to_std(y, *, mean, std):
    return (y - mean) / std


def normal_invprior(mean, std) -> Partial:
    return Partial(_normal_to_std, mean=mean, std=std)


def lognormal_moments(mean, std):
    """Log-space cumulants matching the given linear-space mean/std."""
    mean, std = np.asarray(mean), np.asarray(std)
    if np.any(mean <= 0.0):
        raise ValueError(f"`mean` must be greater than zero; got {mean!r}")
    if np.any(std <= 0.0):
        raise ValueError(f"`std` must be greater than zero; got {std!r}")
    logstd = np.sqrt(np.log1p((std / mean) ** 2))
    logmean = np.log(mean) - 0.5 * logstd**2
    return logmean, logstd


def _std_to_lognormal(xi, *, log_mean, log_std):
    return jnp.exp(log_mean + log_std * xi)


def lognormal_prior(mean, std, *, _log_mean=None, _log_std=None) -> Partial:
    """Moment-matched map: standard normal → log-normal(mean, std)."""
    if _log_mean is None and _log_std is None:
        _log_mean, _log_std = lognormal_moments(mean, std)
    return Partial(_std_to_lognormal, log_mean=_log_mean, log_std=_log_std)


def _lognormal_to_std(y, *, log_mean, log_std):
    return (jnp.log(y) - log_mean) / log_std


def lognormal_invprior(mean, std, *, _log_mean=None, _log_std=None) -> Partial:
    if _log_mean is None and _log_std is None:
        _log_mean, _log_std = lognormal_moments(mean, std)
    return Partial(_lognormal_to_std, log_mean=_log_mean, log_std=_log_std)


def _std_to_laplace(xi, *, alpha):
    # Symmetric map via the log-CDF for numerical stability in the tails.
    res = jnp.where(xi < 0, _jnorm.logcdf(xi) + jnp.log(2.0), 0.0)
    res = res - jnp.where(xi > 0, _jnorm.logcdf(-xi) + jnp.log(2.0), 0.0)
    return res * alpha


def laplace_prior(alpha) -> Partial:
    """Standard normal → Laplace(scale=alpha)."""
    return Partial(_std_to_laplace, alpha=alpha)


def _std_to_uniform(xi, *, a_min, scale):
    return a_min + scale * _jnorm.cdf(xi)


def uniform_prior(a_min=0.0, a_max=1.0) -> Partial:
    """Standard normal → Uniform(a_min, a_max) via the normal CDF."""
    return Partial(_std_to_uniform, a_min=a_min, scale=a_max - a_min)


def interpolator(
    func: Callable,
    xmin: float,
    xmax: float,
    *,
    step: Optional[float] = None,
    num: Optional[int] = None,
    table_func: Optional[Callable] = None,
    inv_table_func: Optional[Callable] = None,
    return_inverse: bool = False,
):
    """Tabulate `func` on [xmin, xmax] and return a linear interpolant.

    Supplying a `table_func`/`inv_table_func` pair interpolates in a
    transformed space where the function is closer to linear.
    """
    if (step is None) == (num is None):
        raise ValueError("exactly one of `step`/`num` must be given")
    xs = np.arange(xmin, xmax + step, step) if step is not None else np.linspace(
        xmin, xmax, num
    )
    ys = func(xs)
    xs_j, ys_j = jnp.asarray(xs), jnp.asarray(ys)
    if table_func is not None:
        if inv_table_func is None:
            raise ValueError("no `inv_table_func` specified")
        ys_j = table_func(ys_j)

    def interp(x):
        r = jnp.interp(x, xs_j, ys_j)
        return inv_table_func(r) if inv_table_func is not None else r

    if return_inverse:

        def inv_interp(y):
            if table_func is not None:
                y = table_func(y)
            return jnp.interp(y, ys_j, xs_j)

        return interp, inv_interp
    return interp


def invgamma_prior(a, scale, loc=0.0, step=1e-2) -> Callable:
    """Standard normal → inverse-gamma via tabulated quantile transform."""
    from scipy.stats import invgamma, norm

    if not np.isscalar(a) or not np.isscalar(loc):
        raise TypeError("shape `a` and location `loc` must be scalars")
    if loc == 0.0:
        s2i = lambda x: invgamma.ppf(norm._cdf(x), a=a)
    elif np.isscalar(scale):
        s2i = lambda x: invgamma.ppf(norm._cdf(x), a=a, loc=loc, scale=scale)
    else:
        raise TypeError("array-like `scale` requires `loc == 0`")

    xmin, xmax = -8.2, 8.2  # tail mass < 1e-15 beyond this
    interp = interpolator(
        s2i, xmin, xmax, step=step, table_func=jnp.log, inv_table_func=jnp.exp
    )

    def standard_to_invgamma(x):
        if loc == 0.0:
            return interp(x) * scale
        return interp(x)

    return standard_to_invgamma


def invgamma_invprior(a, scale, loc=0.0, step=1e-2) -> Callable:
    from scipy.stats import invgamma, norm

    xmin, xmax = -8.2, 8.2
    _, inv = interpolator(
        lambda x: invgamma.ppf(norm._cdf(x), a=a, loc=loc, scale=scale),
        xmin,
        xmax,
        step=step,
        table_func=jnp.log,
        inv_table_func=jnp.exp,
        return_inverse=True,
    )
    return inv


def gamma_prior(a, scale=1.0, loc=0.0, step=1e-2) -> Callable:
    """Standard normal → gamma via tabulated quantile transform
    (capability parity with ``nifty/cl/library/special_distributions.py:211``
    ``GammaOperator``)."""
    from scipy.stats import gamma, norm

    if not np.isscalar(a) or not np.isscalar(loc):
        raise TypeError("shape `a` and location `loc` must be scalars")
    xmin, xmax = -8.2, 8.2
    if loc == 0.0:
        interp = interpolator(
            lambda x: gamma.ppf(norm._cdf(x), a=a),
            xmin, xmax, step=step,
            table_func=jnp.log, inv_table_func=jnp.exp,
        )
        return lambda x: interp(x) * scale
    interp = interpolator(
        lambda x: gamma.ppf(norm._cdf(x), a=a, loc=loc, scale=scale),
        xmin, xmax, step=step,
    )
    return interp


def beta_prior(a, b, step=1e-2) -> Callable:
    """Standard normal → beta(a, b) on (0, 1) via tabulated quantiles
    (parity: ``nifty/cl/library/special_distributions.py:314``)."""
    from scipy.stats import beta as beta_dist, norm

    xmin, xmax = -8.2, 8.2
    # logit-space interpolation keeps the (0, 1) bounds exact
    logit = lambda p: jnp.log(p) - jnp.log1p(-p)
    expit = lambda y: 1.0 / (1.0 + jnp.exp(-y))
    return interpolator(
        lambda x: beta_dist.ppf(norm._cdf(x), a=a, b=b),
        xmin, xmax, step=step,
        table_func=logit, inv_table_func=expit,
    )


def loginvgamma_prior(a, scale, loc=0.0, step=1e-2) -> Callable:
    """Standard normal → log of an inverse-gamma variate (parity:
    ``nifty/cl/library/special_distributions.py:301``)."""
    ig = invgamma_prior(a, scale, loc=loc, step=step)
    return lambda x: jnp.log(ig(x))
