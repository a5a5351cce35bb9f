"""Prior models: named standard-normal reparametrizations.

Reference: ``nifty/re/prior.py``; independent implementation.
"""

from __future__ import annotations

from typing import Callable

from ..model import WrappedCall
from ..num.stats_distributions import (
    invgamma_prior,
    laplace_prior,
    lognormal_prior,
    normal_prior,
    uniform_prior,
)
from ..utils.tree import ShapeWithDtype

__all__ = [
    "BetaPrior",
    "GammaPrior",
    "InvGammaPrior",
    "LogInvGammaPrior",
    "LaplacePrior",
    "LogNormalPrior",
    "NormalPrior",
    "UniformPrior",
]


class _PriorCall(WrappedCall):
    def __init__(self, call: Callable, *, name=None, shape=(), dtype=None):
        super().__init__(
            call, name=name, shape=shape, dtype=dtype, white_init=True
        )


class NormalPrior(_PriorCall):
    """Standard-normal parameters mapped to N(mean, std²)."""

    def __init__(self, mean, std, **kwargs):
        self.mean, self.std = mean, std
        super().__init__(normal_prior(mean, std), **kwargs)


class LogNormalPrior(_PriorCall):
    """Standard-normal parameters mapped to a log-normal with the given
    linear-space moments."""

    def __init__(self, mean, std, **kwargs):
        self.mean, self.std = mean, std
        super().__init__(lognormal_prior(mean, std), **kwargs)


class LaplacePrior(_PriorCall):
    def __init__(self, alpha, **kwargs):
        self.alpha = alpha
        super().__init__(laplace_prior(alpha), **kwargs)


class UniformPrior(_PriorCall):
    def __init__(self, a_min, a_max, **kwargs):
        self.low, self.high = a_min, a_max
        super().__init__(uniform_prior(a_min, a_max), **kwargs)


class InvGammaPrior(_PriorCall):
    def __init__(self, a, scale, loc=0.0, step=1e-2, **kwargs):
        self.a, self.scale = a, scale
        super().__init__(invgamma_prior(a, scale, loc=loc, step=step), **kwargs)


class GammaPrior(_PriorCall):
    """Capability parity with the reference's ``GammaOperator``
    (``nifty/cl/library/special_distributions.py:211``)."""

    def __init__(self, a, scale=1.0, loc=0.0, step=1e-2, **kwargs):
        from ..num.stats_distributions import gamma_prior

        self.a, self.scale = a, scale
        super().__init__(gamma_prior(a, scale, loc=loc, step=step), **kwargs)


class BetaPrior(_PriorCall):
    """Parity: ``nifty/cl/library/special_distributions.py:314``."""

    def __init__(self, a, b, step=1e-2, **kwargs):
        from ..num.stats_distributions import beta_prior

        self.a, self.b = a, b
        super().__init__(beta_prior(a, b, step=step), **kwargs)


class LogInvGammaPrior(_PriorCall):
    """Parity: ``nifty/cl/library/special_distributions.py:301``."""

    def __init__(self, a, scale, loc=0.0, step=1e-2, **kwargs):
        from ..num.stats_distributions import loginvgamma_prior

        self.a, self.scale = a, scale
        super().__init__(loginvgamma_prior(a, scale, loc=loc, step=step), **kwargs)
