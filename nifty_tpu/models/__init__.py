from .correlated_field import (
    CorrelatedFieldMaker,
    HEALPixGrid,
    LMGrid,
    MaternAmplitude,
    NonParametricAmplitude,
    RegularCartesianGrid,
    RegularFourierGrid,
    get_fourier_mode_distributor,
    get_spherical_mode_distributor,
    make_grid,
)
from .dynamics import (
    dynamic_lightcone_operator,
    dynamic_operator,
    light_cone,
    signed_fft_coords,
)
from .gauss_markov import (
    GaussMarkovProcess,
    IntegratedWienerProcess,
    OrnsteinUhlenbeckProcess,
    WienerProcess,
    discrete_gauss_markov_process,
    integrated_wiener_process,
    ornstein_uhlenbeck_process,
    wiener_process,
)
from .prior import (
    BetaPrior,
    GammaPrior,
    InvGammaPrior,
    LogInvGammaPrior,
    LaplacePrior,
    LogNormalPrior,
    NormalPrior,
    UniformPrior,
)
