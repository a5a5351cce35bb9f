"""Native (C++) host-side geometry kernels with pure-numpy fallbacks.

The device compute path of this framework is pure XLA; the native layer
covers construction-time geometry where the reference leans on ducc0's
C++: HEALPix pixelization maps, RING↔NEST reordering, and neighbor
tables (used by spherical refinement stencils and plotting).

The shared library is built on first use with plain ``g++ -O3 -shared
-fopenmp`` (no external deps); if no compiler is available every entry
point transparently falls back to vectorized numpy implementations of
the same published algorithms, so the package never hard-requires the
native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

__all__ = [
    "ang2pix_ring",
    "pix2ang_ring",
    "nest2ring",
    "ring2nest",
    "neighbors_nest",
    "native_available",
]

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "_libnifty_healpix.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    src = os.path.join(_HERE, "healpix.cc")
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-fopenmp",
        src,
        "-o",
        _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(
                _LIB_PATH
            ) < os.path.getmtime(os.path.join(_HERE, "healpix.cc")):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            lib.healpix_ang2pix_ring.argtypes = [
                ctypes.c_int64, f64p, f64p, ctypes.c_int64, i64p
            ]
            lib.healpix_pix2ang_ring.argtypes = [
                ctypes.c_int64, i64p, ctypes.c_int64, f64p, f64p
            ]
            lib.healpix_nest2ring.argtypes = [
                ctypes.c_int64, i64p, ctypes.c_int64, i64p
            ]
            lib.healpix_ring2nest.argtypes = [
                ctypes.c_int64, i64p, ctypes.c_int64, i64p
            ]
            lib.healpix_neighbors_nest.argtypes = [
                ctypes.c_int64, i64p, ctypes.c_int64, i64p
            ]
            _lib = lib
        except Exception as e:  # pragma: no cover - fallback path
            print(
                f"nifty_tpu.native: C++ build unavailable ({e}); "
                "using numpy fallback",
                file=sys.stderr,
            )
            _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


# --- numpy fallbacks (same published algorithms, vectorized) ----------------


def _ang2pix_ring_np(nside, z, phi):
    z = np.asarray(z, float)
    phi = np.asarray(phi, float)
    za = np.abs(z)
    tt = np.mod(phi / (0.5 * np.pi), 4.0)
    npix = 12 * nside * nside
    out = np.empty(z.shape, np.int64)

    eq = za <= 2.0 / 3.0
    # equatorial
    t1 = nside * (0.5 + tt[eq])
    t2 = nside * 0.75 * z[eq]
    jp = np.floor(t1 - t2).astype(np.int64)
    jm = np.floor(t1 + t2).astype(np.int64)
    ir = nside + 1 + jp - jm
    kshift = 1 - (ir & 1)
    ip = np.mod((jp + jm - nside + kshift + 1) // 2, 4 * nside)
    out[eq] = 2 * nside * (nside - 1) + (ir - 1) * 4 * nside + ip
    # caps
    cp = ~eq
    tp = tt[cp] - np.floor(tt[cp])
    tmp = nside * np.sqrt(3.0 * (1.0 - za[cp]))
    jp = np.floor(tp * tmp).astype(np.int64)
    jm = np.floor((1.0 - tp) * tmp).astype(np.int64)
    ir = jp + jm + 1
    ip = np.mod(np.floor(tt[cp] * ir).astype(np.int64), 4 * ir)
    north = z[cp] > 0
    vals = np.where(
        north, 2 * ir * (ir - 1) + ip, npix - 2 * ir * (ir + 1) + ip
    )
    out[cp] = vals
    return out


def _pix2ang_ring_np(nside, pix):
    pix = np.asarray(pix, np.int64)
    ncap = 2 * nside * (nside - 1)
    npix = 12 * nside * nside
    z = np.empty(pix.shape, float)
    phi = np.empty(pix.shape, float)

    m_n = pix < ncap
    ir = (0.5 * (1.0 + np.sqrt(1.0 + 2.0 * pix[m_n]))).astype(np.int64)
    iphi = pix[m_n] + 1 - 2 * ir * (ir - 1)
    z[m_n] = 1.0 - ir.astype(float) ** 2 / (3.0 * nside**2)
    phi[m_n] = (iphi - 0.5) * np.pi / (2.0 * ir)

    m_e = (pix >= ncap) & (pix < npix - ncap)
    ip = pix[m_e] - ncap
    ir = ip // (4 * nside) + nside
    iphi = ip % (4 * nside) + 1
    fodd = np.where((ir + nside) & 1, 1.0, 0.5)
    z[m_e] = (2.0 * nside - ir) * 2.0 / (3.0 * nside)
    phi[m_e] = (iphi - fodd) * np.pi / (2.0 * nside)

    m_s = pix >= npix - ncap
    ip = npix - pix[m_s]
    ir = (0.5 * (1.0 + np.sqrt(2.0 * ip - 1.0))).astype(np.int64)
    iphi = 4 * ir + 1 - (ip - 2 * ir * (ir - 1))
    z[m_s] = -1.0 + ir.astype(float) ** 2 / (3.0 * nside**2)
    phi[m_s] = (iphi - 0.5) * np.pi / (2.0 * ir)
    return z, phi


# --- public API --------------------------------------------------------------


def ang2pix_ring(nside: int, z, phi):
    """(z=cosθ, φ) → RING pixel index, batched."""
    z = np.ascontiguousarray(z, dtype=np.float64)
    phi = np.ascontiguousarray(phi, dtype=np.float64)
    lib = _load()
    if lib is None:
        return _ang2pix_ring_np(nside, z, phi)
    out = np.empty(z.shape, dtype=np.int64)
    lib.healpix_ang2pix_ring(nside, z.ravel(), phi.ravel(), z.size, out.ravel())
    return out


def pix2ang_ring(nside: int, pix):
    """RING pixel index → (z=cosθ, φ), batched."""
    pix = np.ascontiguousarray(pix, dtype=np.int64)
    lib = _load()
    if lib is None:
        return _pix2ang_ring_np(nside, pix)
    z = np.empty(pix.shape, dtype=np.float64)
    phi = np.empty(pix.shape, dtype=np.float64)
    lib.healpix_pix2ang_ring(nside, pix.ravel(), pix.size, z.ravel(), phi.ravel())
    return z, phi


def nest2ring(nside: int, pix):
    pix = np.ascontiguousarray(pix, dtype=np.int64)
    lib = _load()
    if lib is None:
        raise NotImplementedError(
            "NEST ordering requires the native build (no numpy fallback)"
        )
    out = np.empty(pix.shape, dtype=np.int64)
    lib.healpix_nest2ring(nside, pix.ravel(), pix.size, out.ravel())
    return out


def ring2nest(nside: int, pix):
    pix = np.ascontiguousarray(pix, dtype=np.int64)
    lib = _load()
    if lib is None:
        raise NotImplementedError(
            "NEST ordering requires the native build (no numpy fallback)"
        )
    out = np.empty(pix.shape, dtype=np.int64)
    lib.healpix_ring2nest(nside, pix.ravel(), pix.size, out.ravel())
    return out


def neighbors_nest(nside: int, pix):
    """8-neighborhood of NEST pixels, shape (..., 8); −1 marks the missing
    corner neighbor at face corners."""
    pix = np.ascontiguousarray(pix, dtype=np.int64)
    lib = _load()
    if lib is None:
        raise NotImplementedError(
            "neighbors require the native build (no numpy fallback)"
        )
    out = np.empty(pix.shape + (8,), dtype=np.int64)
    lib.healpix_neighbors_nest(nside, pix.ravel(), pix.size, out.reshape(-1))
    return out
