"""TPU-native spherical-harmonic transform (placeholder).

The full implementation (Legendre-recurrence matmuls over rings +
equatorial FFT, the MXU-friendly dense formulation replacing the
reference's ducc0 C++ SHT, ``nifty/re/correlated_field.py:33-52``) lands
in ``sht`` once the ring-geometry utilities are in place.
"""

from __future__ import annotations

__all__ = ["get_healpix_synthesis"]


def get_healpix_synthesis(nside, axis, lmax, mmax):
    raise NotImplementedError(
        "TPU-native HEALPix SHT is not wired up yet; use harmonic_type='fourier'"
    )
