"""Native HEALPix geometry kernels: consistency with the SHT ring
geometry and internal round trips."""

import numpy as np
import pytest

from nifty_tpu import native
from nifty_tpu.ops.sht import healpix_ring_geometry


@pytest.mark.parametrize("nside", [1, 2, 4, 16])
def test_pix2ang_matches_ring_geometry(nside):
    npix = 12 * nside**2
    z, phi = native.pix2ang_ring(nside, np.arange(npix))
    zg, nphi, phi0, start = healpix_ring_geometry(nside)
    z_expect, phi_expect = [], []
    for zz, n, p0 in zip(zg, nphi, phi0):
        z_expect.append(np.full(n, zz))
        phi_expect.append(p0 + 2 * np.pi * np.arange(n) / n)
    np.testing.assert_allclose(z, np.concatenate(z_expect), atol=1e-12)
    np.testing.assert_allclose(phi, np.concatenate(phi_expect), atol=1e-12)


@pytest.mark.parametrize("nside", [1, 4, 64])
def test_ang2pix_inverts_pix2ang(nside):
    npix = 12 * nside**2
    pix = np.arange(npix)
    z, phi = native.pix2ang_ring(nside, pix)
    back = native.ang2pix_ring(nside, z, phi)
    np.testing.assert_array_equal(back, pix)


@pytest.mark.skipif(
    not native.native_available(), reason="native build unavailable"
)
@pytest.mark.parametrize("nside", [1, 2, 8, 32])
def test_nest_ring_roundtrip(nside):
    npix = 12 * nside**2
    pix = np.arange(npix)
    ring = native.nest2ring(nside, pix)
    assert np.array_equal(np.sort(ring), pix)  # a permutation
    back = native.ring2nest(nside, ring)
    np.testing.assert_array_equal(back, pix)


@pytest.mark.skipif(
    not native.native_available(), reason="native build unavailable"
)
@pytest.mark.parametrize("nside", [2, 8])
def test_neighbors_nest_symmetric(nside):
    """p is a neighbor of q ⟺ q is a neighbor of p; all neighbors are
    geometrically close."""
    npix = 12 * nside**2
    nbs = native.neighbors_nest(nside, np.arange(npix))
    # symmetry holds for pixels away from face edges (HEALPix neighbor
    # sets are famously asymmetric at the 8 face-corner vertices)
    from nifty_tpu.native import _load

    def interior(p):
        # decode x, y from the NEST index (pure python bit de-interleave)
        np_face = nside * nside
        q = p % np_face
        x = y = 0
        for b in range(32):
            x |= ((q >> (2 * b)) & 1) << b
            y |= ((q >> (2 * b + 1)) & 1) << b
        return 0 < x < nside - 1 and 0 < y < nside - 1

    for p in range(npix):
        if not interior(p):
            continue
        for q in nbs[p]:
            assert q >= 0
            assert p in nbs[q], (p, q)
    # geometric closeness: neighbor centers within ~3 pixel radii
    ring = native.nest2ring(nside, np.arange(npix))
    z, phi = native.pix2ang_ring(nside, ring)
    vec = np.stack(
        [
            np.sqrt(1 - z**2) * np.cos(phi),
            np.sqrt(1 - z**2) * np.sin(phi),
            z,
        ],
        axis=1,
    )
    typ = np.sqrt(4 * np.pi / npix)
    for p in range(npix):
        for q in nbs[p]:
            if q < 0:
                continue
            d = np.linalg.norm(vec[p] - vec[q])
            assert d < 3.0 * typ, (p, q, d)


@pytest.mark.skipif(
    not native.native_available(), reason="native build unavailable"
)
def test_native_matches_numpy_fallback():
    from nifty_tpu.native import _ang2pix_ring_np, _pix2ang_ring_np

    nside = 16
    npix = 12 * nside**2
    rng = np.random.default_rng(0)
    z = rng.uniform(-1, 1, 1000)
    phi = rng.uniform(0, 2 * np.pi, 1000)
    np.testing.assert_array_equal(
        native.ang2pix_ring(nside, z, phi), _ang2pix_ring_np(nside, z, phi)
    )
    pix = rng.integers(0, npix, 1000)
    zn, pn = native.pix2ang_ring(nside, pix)
    zf, pf = _pix2ang_ring_np(nside, pix)
    np.testing.assert_allclose(zn, zf, atol=1e-12)
    np.testing.assert_allclose(pn, pf, atol=1e-12)


@pytest.mark.parametrize("nside", [1, 4, 32])
def test_jax_healpix_matches_native(nside):
    """Traced (pure-JAX) pixelization agrees with the native/numpy one."""
    import jax

    from nifty_tpu.ops import jhealpix

    npix = 12 * nside**2
    pix = np.arange(npix)
    z_ref, phi_ref = native.pix2ang_ring(nside, pix)
    z, phi = jax.jit(lambda p: jhealpix.pix2ang_ring(nside, p))(pix)
    np.testing.assert_allclose(np.asarray(z), z_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(phi), phi_ref, atol=1e-12)

    rng = np.random.default_rng(0)
    zq = rng.uniform(-1, 1, 500)
    pq = rng.uniform(0, 2 * np.pi, 500)
    ref = native.ang2pix_ring(nside, zq, pq)
    got = jax.jit(lambda a, b: jhealpix.ang2pix_ring(nside, a, b))(zq, pq)
    np.testing.assert_array_equal(np.asarray(got), ref)
