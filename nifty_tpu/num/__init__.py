from .lanczos import (
    lanczos_tridiag,
    stochastic_logdet_from_lanczos,
    stochastic_lq_logdet,
)
from .stats_distributions import (
    interpolator,
    invgamma_invprior,
    invgamma_prior,
    laplace_prior,
    lognormal_invprior,
    lognormal_moments,
    lognormal_prior,
    normal_invprior,
    normal_prior,
    uniform_prior,
)
from .unique import amend_unique, amend_unique_, unique
