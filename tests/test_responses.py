"""SKI covariances, LOS response, and NUFFT tests."""

import jax
import numpy as np
import pytest
from jax import numpy as jnp
from jax import random

from nifty_tpu.los import ExactGridLOS, SamplingCartesianGridLOS
from nifty_tpu.ops.nufft import nufft2, nufft_adjoint
from nifty_tpu.ski import HarmonicSKI, ToeplitzSKI, interp_mat, matmul_toeplitz


def test_matmul_toeplitz():
    rng = np.random.default_rng(0)
    c = rng.normal(size=17)
    t = np.empty((17, 17))
    for i in range(17):
        for j in range(17):
            t[i, j] = c[abs(i - j)]
    x = rng.normal(size=(17, 3))
    np.testing.assert_allclose(
        np.asarray(matmul_toeplitz(jnp.asarray(c), jnp.asarray(x))),
        t @ x,
        rtol=1e-10,
    )


def test_interp_mat_partition_of_unity():
    pts = np.random.default_rng(1).uniform(0.05, 0.95, size=(2, 40))
    w = interp_mat((16, 16), [(0.0, 1.0), (0.0, 1.0)], pts)
    rowsums = np.asarray((w @ jnp.ones(16 * 16)))
    np.testing.assert_allclose(rowsums, 1.0, rtol=1e-12)


def test_interp_mat_exact_on_linear_function():
    """Multilinear interpolation reproduces affine functions exactly."""
    n = 12
    pts = np.random.default_rng(2).uniform(0.1, 0.8, size=(2, 30))
    w = interp_mat((n, n), [(0.0, 1.0), (0.0, 1.0)], pts)
    xg, yg = np.meshgrid(np.arange(n) / n, np.arange(n) / n, indexing="ij")
    f = 2.0 * xg + 3.0 * yg + 1.0
    out = np.asarray(w @ jnp.asarray(f.ravel()))
    expect = 2.0 * pts[0] + 3.0 * pts[1] + 1.0
    np.testing.assert_allclose(out, expect, rtol=1e-10)


def test_toeplitz_ski_covariance():
    """SKI covariance ≈ true kernel matrix for on/near-grid points."""
    kern = lambda r: np.exp(-0.5 * (np.asarray(r) / 0.2) ** 2)
    pts = np.random.default_rng(3).uniform(0.1, 0.9, size=(1, 25))
    ski = ToeplitzSKI((64,), [(0.0, 1.0)], pts, kernel=lambda r: jnp.exp(
        -0.5 * (r / 0.2) ** 2), jitter=False)
    cov = np.asarray(ski.evaluate())
    d = np.abs(pts[0][:, None] - pts[0][None, :])
    true = kern(d)
    np.testing.assert_allclose(cov, true, atol=0.01)


def test_harmonic_ski_spd_and_symmetric():
    pts = np.random.default_rng(4).uniform(0.1, 0.9, size=(1, 20))
    hk = lambda k: 1.0 / (1.0 + (k / 5.0) ** 2) ** 2  # smooth spectrum
    ski = HarmonicSKI((32,), [(0.0, 1.0)], pts, harmonic_kernel=hk)
    cov = np.asarray(ski.evaluate())
    np.testing.assert_allclose(cov, cov.T, atol=1e-10)
    ev = np.linalg.eigvalsh(cov)
    assert ev.min() > 0


def test_harmonic_ski_correlated_field_shape():
    pts = np.random.default_rng(5).uniform(0.1, 0.9, size=(2, 10))
    hk = lambda k: 1.0 / (1.0 + k**2)
    ski = HarmonicSKI((16, 16), [(0.0, 1.0)] * 2, pts, harmonic_kernel=hk)
    xi = random.normal(random.PRNGKey(0), ski.grid_shape)
    f = ski.correlated_field(xi)
    assert f.shape == (16, 16)
    assert np.all(np.isfinite(np.asarray(f)))


def test_los_constant_field():
    """LOS integral of a constant field equals the ray length."""
    shape = (32, 32)
    dist = (1.0 / 32, 1.0 / 32)
    start = np.array([[0.1, 0.1]])
    end = np.array([[0.9, 0.5]])
    los = SamplingCartesianGridLOS(
        start, end, shape=shape, distances=dist, n_sampling_points=2000
    )
    out = np.asarray(los(jnp.ones(shape)))
    np.testing.assert_allclose(out, np.linalg.norm(end - start), rtol=1e-3)


def test_los_linear_field_multi_ray():
    shape = (64, 64)
    dist = (1.0 / 64, 1.0 / 64)
    xg = (np.arange(64) + 0.5) / 64
    field = np.broadcast_to(xg[:, None], shape).copy()  # f(x, y) = x
    start = np.array([0.5, 0.5])
    end = np.array([[0.9, 0.5], [0.1, 0.5], [0.5, 0.9]])
    los = SamplingCartesianGridLOS(
        start, end, shape=shape, distances=dist, n_sampling_points=4000
    )
    out = np.asarray(los(jnp.asarray(field)))
    # ∫ x dl along each ray
    expect = np.array([0.4 * 0.7, 0.4 * 0.3, 0.4 * 0.5])
    np.testing.assert_allclose(out, expect, atol=5e-3)


def test_exact_los_constant_field():
    """Exact-traversal LOS of a constant field equals the in-box ray
    length (here rays are fully inside, so the full length)."""
    shape = (32, 32)
    dist = (1.0 / 32, 1.0 / 32)
    start = np.array([[0.1, 0.1]])
    end = np.array([[0.9, 0.5]])
    los = ExactGridLOS(start, end, shape=shape, distances=dist)
    out = np.asarray(los(jnp.ones(shape)))
    np.testing.assert_allclose(out, np.linalg.norm(end - start), rtol=1e-4)


def test_exact_los_adjoint_and_linearity():
    """extra.py sweep: linearity + ⟨Rx, y⟩ = ⟨x, Rᵀy⟩ for the exact LOS,
    with and without endpoint uncertainty."""
    from nifty_tpu.extra import check_linear_model
    from nifty_tpu.utils.tree import ShapeWithDtype

    shape = (16, 24)
    dist = (0.9 / 16, 1.1 / 24)
    rng = np.random.default_rng(3)
    extent = np.array(shape) * np.array(dist)
    starts = rng.uniform(0.1, 0.9, (9, 2)) * extent
    ends = rng.uniform(0.1, 0.9, (9, 2)) * extent
    lengths = np.linalg.norm(ends - starts, axis=1)
    for sigmas in (None, rng.uniform(0.05, 0.2, 9) / lengths):
        los = ExactGridLOS(
            starts, ends, shape=shape, distances=dist, sigmas=sigmas
        )
        check_linear_model(
            los,
            ShapeWithDtype(shape, jnp.float64),
            random.PRNGKey(7),
            rtol=1e-12,
        )


def test_exact_los_matches_sampling_los():
    """The exact traversal and the dense sampling integrator agree on a
    smooth field (they are different discretizations of the same
    integral)."""
    shape = (64, 64)
    dist = (1.0 / 64, 1.0 / 64)
    xg = (np.arange(64) + 0.5) / 64
    field = np.sin(2 * np.pi * xg)[:, None] * np.cos(np.pi * xg)[None, :]
    starts = np.array([[0.15, 0.2], [0.7, 0.8], [0.1, 0.9]])
    ends = np.array([[0.85, 0.75], [0.2, 0.3], [0.9, 0.1]])
    exact = ExactGridLOS(starts, ends, shape=shape, distances=dist)
    sampl = SamplingCartesianGridLOS(
        starts, ends, shape=shape, distances=dist, n_sampling_points=4000
    )
    a = np.asarray(exact(jnp.asarray(field)))
    b = np.asarray(sampl(jnp.asarray(field)))
    np.testing.assert_allclose(a, b, atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("ndim", [1, 2])
def test_nufft2_matches_direct_dft(ndim):
    rng = np.random.default_rng(6)
    shape = (16,) * ndim
    x = rng.normal(size=shape)
    m = 12
    coords = rng.uniform(-0.5, 0.5, size=(ndim, m))
    fast = np.asarray(nufft2(jnp.asarray(x), jnp.asarray(coords)))
    # direct DFT with centered indices
    grids = np.meshgrid(
        *[np.arange(n) - n // 2 for n in shape], indexing="ij"
    )
    direct = np.zeros(m, dtype=complex)
    for k in range(m):
        phase = sum(coords[d, k] * grids[d] for d in range(ndim))
        direct[k] = np.sum(x * np.exp(-2j * np.pi * phase))
    np.testing.assert_allclose(fast, direct, atol=5e-5 * np.abs(direct).max())
    # higher kernel width → higher accuracy
    fast8 = np.asarray(
        nufft2(jnp.asarray(x), jnp.asarray(coords), kernel_width=10)
    )
    np.testing.assert_allclose(fast8, direct, atol=1e-7 * np.abs(direct).max())


def test_nufft_adjointness():
    rng = np.random.default_rng(7)
    shape = (12, 12)
    coords = jnp.asarray(rng.uniform(-0.5, 0.5, size=(2, 9)))
    x = jnp.asarray(rng.normal(size=shape) + 1j * rng.normal(size=shape))
    y = jnp.asarray(rng.normal(size=9) + 1j * rng.normal(size=9))
    lhs = jnp.vdot(y, nufft2(x, coords))
    rhs = jnp.vdot(nufft_adjoint(y, coords, shape), x)
    np.testing.assert_allclose(complex(lhs), complex(rhs), rtol=1e-10)


def test_nufft_differentiable_in_coords():
    """Variable-position NUFFT: gradients flow through coords."""
    x = jnp.asarray(np.random.default_rng(8).normal(size=(16,)))
    coords = jnp.asarray([[0.1, 0.2, -0.3]])

    def loss(c):
        return jnp.sum(jnp.abs(nufft2(x, c)) ** 2)

    g = jax.grad(loss)(coords)
    assert np.all(np.isfinite(np.asarray(g)))
    # finite-difference check on one entry
    eps = 1e-6
    c_p = coords.at[0, 1].add(eps)
    c_m = coords.at[0, 1].add(-eps)
    fd = (loss(c_p) - loss(c_m)) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 1]), float(fd), rtol=1e-4)


def test_shifted_position_fft_zero_shift_is_fft():
    from nifty_tpu.ops.nufft import ShiftedPositionFFT

    m = ShiftedPositionFFT((8, 6))
    g = jnp.asarray(np.random.default_rng(0).normal(size=(8, 6)))
    x = {"spfftgrid": g, "spfftdelta_coord": jnp.zeros((2, 8, 6))}
    out = np.asarray(m(x))
    ref = np.fft.fftn(np.asarray(g))
    np.testing.assert_allclose(out, ref, atol=2e-5 * np.abs(ref).max())
    # a one-bin shift along axis 0 lands on the neighboring FFT frequency
    x1 = {"spfftgrid": g, "spfftdelta_coord": jnp.zeros((2, 8, 6)).at[0].set(1.0)}
    out1 = np.asarray(m(x1))
    np.testing.assert_allclose(
        out1, np.roll(ref, -1, axis=0), atol=5e-5 * np.abs(ref).max()
    )
    # differentiable in the shifts
    gr = jax.grad(
        lambda d: jnp.sum(
            jnp.abs(m({"spfftgrid": g, "spfftdelta_coord": d})) ** 2
        )
    )(jnp.zeros((2, 8, 6)))
    assert bool(jnp.isfinite(gr).all())


def test_variable_position_nufft_model():
    from nifty_tpu.ops.nufft import VariablePositionNufft
    from jax import random

    vp = VariablePositionNufft((16, 16), npoints=12)
    assert set(vp.domain) == {"nufftgrid", "nufftcoord"}
    g = jnp.asarray(np.random.default_rng(2).normal(size=(16, 16)))
    coords = np.random.default_rng(3).uniform(-0.4, 0.4, size=(2, 12))
    vis = np.asarray(vp({"nufftgrid": g, "nufftcoord": jnp.asarray(coords)}))
    # centered-index direct DFT (the nufft2 convention)
    ii, jj = np.meshgrid(np.arange(16) - 8, np.arange(16) - 8, indexing="ij")
    bf = np.array(
        [
            np.sum(np.asarray(g) * np.exp(-2j * np.pi * (c0 * ii + c1 * jj)))
            for c0, c1 in coords.T
        ]
    )
    np.testing.assert_allclose(vis, bf, atol=5e-5 * np.abs(bf).max())
    # init produces the right tree
    p = vp.init(random.PRNGKey(0))
    assert p["nufftcoord"].shape == (2, 12)
