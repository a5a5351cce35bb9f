from .correlated_field import ICRField
from .grid import BrokenLogGrid, Grid, LogGrid, MGrid, SimpleOpenGrid
from .healpix_grid import (
    HEALPixICRField,
    HEALPixICRKernel,
    HEALPixRefinementGrid,
)
from .kernel import ICRKernel, apply_kernel
from .sphere_radius import (
    SphereLogRadiusGrid,
    SphereRadiusICRField,
    SphereRadiusICRKernel,
)
from .matern import MaternCovarianceModel, matern_spectral_covariance
