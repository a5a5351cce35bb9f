"""Multi-grid / ICR correlated field tests."""

import jax
import numpy as np
import pytest
from jax import numpy as jnp
from jax import random
from scipy.special import j0 as scipy_j0

import nifty_tpu as nt
from nifty_tpu.multi_grid import (
    ICRField,
    ICRKernel,
    LogGrid,
    MaternCovarianceModel,
    MGrid,
    SimpleOpenGrid,
    matern_spectral_covariance,
)
from nifty_tpu.multi_grid.matern import bessel_j0


def test_grid_shapes():
    g = SimpleOpenGrid(shape0=(12,), depth=2, distances0=1.0, padding=1)
    assert g.shapes == ((12,), (20,), (36,))
    g2 = SimpleOpenGrid(shape0=(8, 8), depth=1, padding=1)
    assert g2.shapes == ((8, 8), (12, 12))


def test_grid_coords_nested():
    """Fine-level coordinates interleave the coarse ones symmetrically."""
    g = SimpleOpenGrid(shape0=(8,), depth=1, distances0=1.0, padding=1)
    c0 = g.at(0).index2coord(np.arange(8)[None])[0]
    c1 = g.at(1).index2coord(np.arange(12)[None])[0]
    # children of coarse pixel 1 (first interior) sit at its center ± dx/4
    assert np.isclose(c1[0], c0[1] - 0.25)
    assert np.isclose(c1[1], c0[1] + 0.25)
    assert np.isclose(c1[-1], c0[-2] + 0.25)


def test_log_grid_monotone():
    g = LogGrid(shape0=16, depth=2, r_min=0.1, r_max=10.0)
    for lvl in range(3):
        r = g.at(lvl).index2coord(np.arange(g.shapes[lvl][0])[None])[0]
        assert np.all(np.diff(r) > 0)
        assert r[0] > 0.05 and r[-1] < 12.0


def test_broken_log_grid_geometry():
    """Linear spacing below the threshold, log spacing above, C¹ joins."""
    from nifty_tpu.multi_grid import BrokenLogGrid

    g = BrokenLogGrid(
        shape0=64, depth=1, r_min=0.1, r_linthresh=1.0, r_max=100.0
    )
    r = g.at(0).index2coord(np.arange(64)[None])[0]
    assert np.all(np.diff(r) > 0)
    # linear region: constant spacing
    lin = r[r < 0.9]
    assert lin.size > 3
    np.testing.assert_allclose(np.diff(lin), np.diff(lin)[0], rtol=1e-10)
    # log region: constant ratio
    log = r[(r > 1.2) & (r < 90.0)]
    assert log.size > 3
    np.testing.assert_allclose(
        log[1:] / log[:-1], (log[1:] / log[:-1])[0], rtol=1e-10
    )
    # endpoints of the nominal range map to r_min/r_max
    np.testing.assert_allclose(g._g2r(np.array([0.0, 1.0])), [0.1, 100.0])
    # round trip and C¹ continuity across all four branches
    gg = np.linspace(-0.05, 1.05, 1001)
    rr = g._g2r(gg)
    np.testing.assert_allclose(g._r2g(rr), gg, rtol=1e-9, atol=1e-12)
    assert np.all(np.diff(rr) > 0)
    # C¹ at the three break points: matching one-sided derivatives
    h = 1e-7
    for gb in (0.0, g._g_l, 1.0):
        left = (g._g2r(gb) - g._g2r(gb - h)) / h
        right = (g._g2r(gb + h) - g._g2r(gb)) / h
        np.testing.assert_allclose(left, right, rtol=1e-4)


def test_icr_broken_log_grid_covariance():
    """ICR on the broken-log chart reproduces the kernel covariance."""
    from nifty_tpu.multi_grid import BrokenLogGrid

    ell = 0.6
    cov_fn = lambda r: jnp.exp(-0.5 * (r / ell) ** 2)
    grid = BrokenLogGrid(
        shape0=20, depth=2, r_min=0.2, r_linthresh=1.0, r_max=6.0, padding=2
    )
    kern = ICRKernel(grid, cov_fn)
    assert any(lay.n_unique > 1 for lay in kern._layouts)
    emp = _dense_icr_cov(grid, cov_fn)
    r = grid.at(grid.depth).index2coord(
        np.arange(grid.shapes[-1][0])[None]
    )[0]
    true = np.exp(-0.5 * ((r[:, None] - r[None, :]) / ell) ** 2)
    n = r.size
    sl = slice(n // 4, 3 * n // 4)
    np.testing.assert_allclose(emp[sl, sl], true[sl, sl], atol=0.05)


def test_mgrid_product():
    ga = SimpleOpenGrid(shape0=(8,), depth=1, padding=1)
    gb = LogGrid(shape0=8, depth=1, r_min=1.0, r_max=4.0)
    g = MGrid(ga, gb)
    assert g.shapes[0] == (8, 8)
    assert g.shapes[1] == (12, 12)
    lvl = g.at(0)
    coords = lvl.index2coord(
        np.stack(np.meshgrid(np.arange(8), np.arange(8), indexing="ij"))
    )
    assert coords.shape == (2, 8, 8)


def test_bessel_j0():
    x = np.linspace(0, 50, 500)
    np.testing.assert_allclose(
        np.asarray(bessel_j0(jnp.asarray(x))), scipy_j0(x), atol=5e-8
    )


@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_matern_covariance_basics(ndim):
    fac = matern_spectral_covariance(ndim=ndim, r_min=1e-3, r_max=10.0)
    cov = fac(2.0, 1.0, -3.5)
    c0 = float(cov(jnp.asarray(0.0)))
    assert np.isclose(c0, 4.0, rtol=1e-6)
    rs = jnp.asarray([0.1, 0.5, 1.0, 3.0, 8.0])
    cs = np.asarray(cov(rs))
    assert np.all(np.diff(cs) < 0)  # monotone decreasing
    assert cs[-1] < 0.5 * c0


def _dense_icr_cov(grid, cov_fn):
    """Covariance implied by the ICR map (via its dense Jacobian)."""
    kern = ICRKernel(grid, cov_fn)
    shapes = grid.shapes

    def flat_apply(z):
        xs, off = [], 0
        for s in shapes:
            n = int(np.prod(s))
            xs.append(z[off : off + n].reshape(s))
            off += n
        return kern.apply(xs).ravel()

    n_tot = sum(int(np.prod(s)) for s in shapes)
    jac = jax.jacfwd(flat_apply)(jnp.zeros(n_tot))
    return np.asarray(jac @ jac.T)


def test_icr_reproduces_covariance_1d():
    """ICR-implied covariance matches the true kernel in the interior."""
    ell = 1.2
    cov_fn = lambda r: jnp.exp(-0.5 * (r / ell) ** 2)
    grid = SimpleOpenGrid(shape0=(16,), depth=2, distances0=1.0, padding=2)
    emp = _dense_icr_cov(grid, cov_fn)
    x = grid.at(grid.depth).index2coord(
        np.arange(grid.shapes[-1][0])[None]
    )[0]
    true = np.exp(-0.5 * ((x[:, None] - x[None, :]) / ell) ** 2)
    n = x.size
    sl = slice(n // 4, 3 * n // 4)  # interior
    np.testing.assert_allclose(emp[sl, sl], true[sl, sl], atol=0.03)


def test_icr_reproduces_covariance_2d():
    ell = 1.5
    cov_fn = lambda r: jnp.exp(-0.5 * (r / ell) ** 2)
    grid = SimpleOpenGrid(shape0=(10, 10), depth=1, distances0=1.0, padding=1)
    emp = _dense_icr_cov(grid, cov_fn)
    lvl = grid.at(1)
    idx = np.stack(
        np.meshgrid(*[np.arange(s) for s in lvl.shape], indexing="ij")
    )
    coords = lvl.index2coord(idx).reshape(2, -1)
    d = np.sqrt(((coords[:, :, None] - coords[:, None, :]) ** 2).sum(0))
    true = np.exp(-0.5 * (d / ell) ** 2)
    # compare a central row of the covariance
    n = true.shape[0]
    center = n // 2 + lvl.shape[1] // 2
    np.testing.assert_allclose(emp[center], true[center], atol=0.05)


def test_icr_single_stencil_on_uniform_grid():
    """Uniform charts must collapse to one stencil per level (the pure-
    matmul fast path)."""
    grid = SimpleOpenGrid(shape0=(16, 16), depth=2, padding=1)
    kern = ICRKernel(grid, lambda r: jnp.exp(-r))
    for lay in kern._layouts:
        assert lay.n_unique == 1


def test_icr_field_fixed_kernel():
    grid = SimpleOpenGrid(shape0=(12,), depth=2, distances0=1.0, padding=1)
    f = ICRField(grid, lambda r: jnp.exp(-0.5 * r**2))
    p = f.init(random.PRNGKey(0))
    out = jax.jit(f)(p)
    assert out.shape == grid.shapes[-1]
    assert np.all(np.isfinite(np.asarray(out)))
    # O(1) field amplitude
    outs = jax.vmap(lambda k: f(f.init(k)))(random.split(random.PRNGKey(1), 64))
    std = float(np.asarray(outs).std())
    assert 0.5 < std < 2.0


def test_icr_field_learned_matern():
    grid = SimpleOpenGrid(shape0=(10,), depth=1, distances0=0.5, padding=1)
    matern = MaternCovarianceModel(
        ndim=1, r_min=0.05, r_max=10.0, n_integrate=400, n_interpolate=64
    )
    f = ICRField(grid, matern, offset=(0.0, 1.0))
    p = f.init(random.PRNGKey(2))
    out = jax.jit(f)(p)
    assert out.shape == grid.shapes[-1]
    assert np.all(np.isfinite(np.asarray(out)))
    # gradient flows to the kernel parameters
    g = jax.grad(lambda q: jnp.sum(f(q) ** 2))(p)
    gs = jax.tree_util.tree_leaves(
        {k: v for k, v in g.items() if "matern" in k}
    )
    assert any(float(np.abs(np.asarray(x)).max()) > 0 for x in gs)


def test_icr_field_inference_end_to_end():
    """MAP-style optimize_kl run on a tiny ICR field."""
    grid = SimpleOpenGrid(shape0=(12,), depth=1, distances0=1.0, padding=1)
    f = ICRField(grid, lambda r: jnp.exp(-0.5 * (r / 2.0) ** 2))
    truth_p = f.init(random.PRNGKey(3))
    truth = f(truth_p)
    noise_std = 0.1
    data = truth + noise_std * random.normal(random.PRNGKey(4), truth.shape)
    lh = nt.Gaussian(data, noise_cov_inv=lambda x: x / noise_std**2).amend(f)
    samples, state = nt.optimize_kl(
        lh,
        nt.Vector(f.init(random.PRNGKey(5))),
        key=random.PRNGKey(6),
        n_total_iterations=4,
        n_samples=2,
        draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=32)),
        sample_mode="linear_resample",
    )
    post_mean = jax.tree_util.tree_map(
        lambda *a: sum(a) / len(a), *[f(s) for s in samples]
    )
    nrmse = float(
        np.linalg.norm(np.asarray(post_mean - truth))
        / np.linalg.norm(np.asarray(truth))
    )
    assert nrmse < 0.25


def test_icr_log_grid_covariance():
    """Non-uniform (log) chart: per-shell stencils via the varying-axis
    einsum path still reproduce the kernel covariance."""
    from nifty_tpu.multi_grid import LogGrid

    ell = 0.8
    cov_fn = lambda r: jnp.exp(-0.5 * (r / ell) ** 2)
    grid = LogGrid(shape0=16, depth=2, r_min=0.5, r_max=8.0, padding=2)
    kern = ICRKernel(grid, cov_fn)
    assert any(lay.n_unique > 1 for lay in kern._layouts)
    emp = _dense_icr_cov(grid, cov_fn)
    r = grid.at(grid.depth).index2coord(
        np.arange(grid.shapes[-1][0])[None]
    )[0]
    true = np.exp(-0.5 * ((r[:, None] - r[None, :]) / ell) ** 2)
    n = r.size
    sl = slice(n // 4, 3 * n // 4)
    np.testing.assert_allclose(emp[sl, sl], true[sl, sl], atol=0.05)


def test_icr_mgrid_mixed_uniform_log():
    """Product chart (uniform × log): forward runs and stays finite."""
    from nifty_tpu.multi_grid import LogGrid, MGrid, SimpleOpenGrid

    ga = SimpleOpenGrid(shape0=(8,), depth=1, distances0=0.6, padding=1)
    gb = LogGrid(shape0=8, depth=1, r_min=0.5, r_max=4.0, padding=1)
    grid = MGrid(ga, gb)
    f = ICRField(grid, lambda r: jnp.exp(-0.5 * r**2))
    p = f.init(random.PRNGKey(11))
    out = jax.jit(f)(p)
    assert out.shape == grid.shapes[-1]
    assert np.all(np.isfinite(np.asarray(out)))


def test_icr_layout_scales_without_block_materialization():
    """Uniform-grid layout cost is independent of n_blocks (the 1e9-dof
    construction path): a large level must keep exactly one stencil."""
    grid = SimpleOpenGrid(shape0=(64, 64), depth=3, padding=1)
    kern = ICRKernel(grid, None) if False else ICRKernel.__new__(ICRKernel)
    # construct layouts only (no covariance)
    from nifty_tpu.multi_grid.kernel import _LevelLayout

    lay = _LevelLayout(grid, 2, 1e-5, 1e-10)
    assert lay.n_unique == 1
    assert lay.dist_unique.shape[0] == 1


def test_healpix_icr_field():
    """ICR on the sphere: dedup collapses stencils; field statistics and
    covariance structure are sane."""
    from nifty_tpu import native
    from nifty_tpu.multi_grid.healpix_grid import (
        HEALPixICRField,
        HEALPixICRKernel,
        HEALPixRefinementGrid,
    )

    if not native.native_available():
        pytest.skip("native healpix unavailable")
    grid = HEALPixRefinementGrid(nside0=2, depth=2)  # 48 -> 192 -> 768 px
    ell = 0.6
    cov_fn = lambda r: jnp.exp(-0.5 * (r / ell) ** 2)
    kern = HEALPixICRKernel(grid, cov_fn)
    for lay in kern._layouts:
        # ring symmetry: far fewer unique stencils than pixels
        assert lay["dist_unique"].shape[0] < lay["npix"] / 2

    f = HEALPixICRField(grid, cov_fn)
    p = f.init(random.PRNGKey(20))
    out = jax.jit(f)(p)
    assert out.shape == (12 * 8 * 8,)
    assert np.all(np.isfinite(np.asarray(out)))

    # marginal variance ≈ cov(0) = 1 across realizations
    outs = jax.vmap(lambda k: f(f.init(k)))(random.split(random.PRNGKey(21), 48))
    var = np.asarray(outs).var(axis=0)
    assert 0.5 < var.mean() < 1.5

    # empirical spatial correlation follows the kernel: close pixel pairs
    # correlate strongly, antipodal ones don't
    from nifty_tpu.multi_grid.healpix_grid import _nest_vectors

    vecs = _nest_vectors(8, np.arange(12 * 64))
    smp = np.asarray(outs)
    c01 = np.corrcoef(smp[:, 0], smp[:, 1])[0, 1]  # sibling pixels
    far = np.argmax(((vecs - vecs[0]) ** 2).sum(-1))
    cfar = np.corrcoef(smp[:, 0], smp[:, far])[0, 1]
    assert c01 > 0.5
    assert abs(cfar) < 0.45


def test_sphere_radius_icr_field():
    """3-D sphere × log-radius chart: shapes, statistics, and radial/
    angular correlation structure."""
    from nifty_tpu import native
    from nifty_tpu.multi_grid.sphere_radius import (
        SphereLogRadiusGrid,
        SphereRadiusICRField,
    )

    if not native.native_available():
        pytest.skip("native healpix unavailable")
    grid = SphereLogRadiusGrid(
        nside0=1, n_r0=10, r_min=1.0, r_max=4.0, depth=2, r_padding=1
    )
    assert grid.shapes[0] == (12, 10)
    assert grid.shapes[1] == (48, 16)
    assert grid.shapes[2] == (192, 28)

    ell = 0.8
    f = SphereRadiusICRField(grid, lambda r: jnp.exp(-0.5 * (r / ell) ** 2))
    p = f.init(random.PRNGKey(30))
    out = jax.jit(f)(p)
    assert out.shape == grid.shapes[-1]
    assert np.all(np.isfinite(np.asarray(out)))

    outs = jax.vmap(lambda k: f(f.init(k)))(random.split(random.PRNGKey(31), 48))
    smp = np.asarray(outs)  # (48, npix, nr)
    var = smp.var(axis=0)
    assert 0.3 < var.mean() < 2.0
    # radially adjacent cells correlate; distant radii decorrelate
    c_near = np.corrcoef(smp[:, 5, 10], smp[:, 5, 11])[0, 1]
    c_far = np.corrcoef(smp[:, 5, 0], smp[:, 5, 27])[0, 1]
    assert c_near > 0.4
    assert abs(c_far) < 0.5


def test_sphere_radius_broken_log_radial():
    """Sphere × symlog (broken-log) radial chart runs and stays finite."""
    from nifty_tpu import native
    from nifty_tpu.multi_grid import BrokenLogGrid
    from nifty_tpu.multi_grid.sphere_radius import (
        SphereLogRadiusGrid,
        SphereRadiusICRField,
    )

    if not native.native_available():
        pytest.skip("native healpix unavailable")
    grid = SphereLogRadiusGrid(
        nside0=1,
        n_r0=10,
        r_min=0.2,
        r_linthresh=1.0,
        r_max=4.0,
        depth=1,
        r_padding=1,
    )
    assert isinstance(grid.radial, BrokenLogGrid)
    f = SphereRadiusICRField(grid, lambda r: jnp.exp(-0.5 * (r / 0.8) ** 2))
    p = f.init(random.PRNGKey(40))
    out = jax.jit(f)(p)
    assert out.shape == grid.shapes[-1]
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_isotropic_power_spectrum_transform_gaussian_pair(ndim):
    """Gaussian spectrum ↔ Gaussian covariance closed-form pair:
    P(k) = exp(-σ²k²/2)  ⇒  Cov(r) = (2πσ²)^{-d/2} exp(-r²/(2σ²))."""
    from nifty_tpu.multi_grid.matern import IsotropicPowerSpectrumTransform

    sigma = 0.7
    tr = IsotropicPowerSpectrumTransform(ndim, n_nodes=4096, k_max=1e3)
    r = jnp.asarray(np.linspace(0.05, 3.0, 12))
    cov = np.asarray(tr(lambda k: jnp.exp(-0.5 * sigma**2 * k**2), r))
    expect = (2 * np.pi * sigma**2) ** (-ndim / 2) * np.exp(
        -np.asarray(r) ** 2 / (2 * sigma**2)
    )
    np.testing.assert_allclose(cov, expect, rtol=2e-3, atol=1e-6)
    # differentiable through spectrum parameters
    g = jax.grad(
        lambda s: tr(lambda k: jnp.exp(-0.5 * s**2 * k**2), r).sum()
    )(sigma)
    assert np.isfinite(float(g))
