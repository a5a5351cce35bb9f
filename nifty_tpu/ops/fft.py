"""Harmonic transforms on regular grids.

The Hartley transform — the real-valued self-inverse workhorse of the
correlated field — is built from the real FFT: for real input,
H(x) = Re(F(x)) - Im(F(x)).  Using ``rfftn`` halves the FLOPs and
memory traffic relative to a complex ``fftn`` and stays entirely inside
XLA's native TPU FFT, with the hermitian symmetry reconstructed by cheap
reversals (pure layout ops).

Reference behavior: ``nifty/re/correlated_field.py:24-30`` (which uses a
full complex fftn); this formulation is the TPU-friendlier rewrite.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax import numpy as jnp

__all__ = ["hartley", "mxu_fftn", "hartley_splitreal"]


def _hermitian_extend(ft_half, shape, axes):
    """Reconstruct the full FFT array from the rfft half-spectrum."""
    last = axes[-1]
    n = shape[last]
    n_half = ft_half.shape[last]
    if n_half == n:
        return ft_half
    # F[k] for the missing ks follows from hermitian symmetry:
    #   F[k_1,...,k_d] = conj(F[-k_1,...,-k_d])
    missing = jnp.conj(
        jnp.flip(
            ft_half.take(indices=jnp.arange(1, n - n_half + 1), axis=last), axis=last
        )
    )
    for ax in axes[:-1]:
        m = missing.shape[ax]
        idx = (-jnp.arange(m)) % m
        missing = missing.take(indices=idx, axis=ax)
    return jnp.concatenate([ft_half, missing], axis=last)


def hartley(x, axes: Optional[Sequence[int]] = None):
    """Hartley transform over `axes` (all axes by default).

    On TPU, real 1-D/2-D full transforms route through the split-real
    four-step MXU pipeline (`hartley_splitreal`: half-spectrum matmul
    DFT + hermitian fold — the fastest path at every composite size);
    other compute-bound sizes use the complex MXU matmul FFT
    (`mxu_fftn`); otherwise real input is computed via rfftn +
    hermitian reconstruction and complex input via fftn.
    Self-adjoint up to the grid volume: H(H(x)) = N·x.
    """
    if axes is None:
        axes = tuple(range(x.ndim))
    axes = tuple(a % x.ndim for a in axes)
    if _use_pallas(x, axes):
        from .pallas_fft import hartley2d_pallas

        return hartley2d_pallas(x)
    if _use_splitreal(x, axes):
        return hartley_splitreal(x)
    if _use_mxu(x.shape, axes):
        ft = mxu_fftn(x, axes=axes)
        return ft.real - ft.imag
    if jnp.iscomplexobj(x):
        ft = jnp.fft.fftn(x, axes=axes)
        return ft.real - ft.imag
    shape = x.shape
    ft_half = jnp.fft.rfftn(x, axes=axes)
    ft = _hermitian_extend(ft_half, shape, axes)
    return ft.real - ft.imag


# --- MXU (matmul) FFT ---------------------------------------------------------
#
# XLA lowers `jnp.fft` to a VPU FFT on TPU; the MXU (the systolic array,
# where the chip's FLOPs live) sits idle.  The classic four-step
# decomposition turns a length-N=N1·N2 DFT into two batched dense matmuls
# plus a twiddle multiply — MXU food.  Measured on a v5e: 0.064 ms vs
# 0.233 ms (XLA) for a 1280² complex FFT; at ≥4096 the transform is
# HBM-bound and XLA's native FFT is equally good, so `hartley` dispatches
# by size (config key ``fft_impl``).

_MXU_MAX_AXIS = 2048  # beyond this the FFT is bandwidth-bound; use XLA


def _split_factor(n: int) -> Optional[tuple]:
    """Largest divisor pair (N1, N2 = n//N1) with N1 ≤ √n, or None for
    primes (no useful split)."""
    best = 1
    for d in range(2, int(np.sqrt(n)) + 1):
        if n % d == 0:
            best = d
    if best == 1:
        return None
    return best, n // best


def _mxu_fft_axis(x, axis: int, *, inverse: bool = False):
    """Four-step DFT along `axis` via two MXU matmuls.

    x must be complex; DFT tables are numpy constants generated at trace
    time (complex *device* constants cannot ride the remote-compile
    path).  Derivation: with n = N2·n1 + n2 and k = N1·k2 + k1,
    X[k] = Σ_{n2} W2[n2,k2] · T[n2,k1] · Σ_{n1} x[n1,n2] W1[n1,k1].
    """
    n = x.shape[axis]
    fac = _split_factor(n)
    assert fac is not None
    N1, N2 = fac
    sign = 2j if inverse else -2j
    W1 = np.exp(sign * np.pi * np.outer(np.arange(N1), np.arange(N1)) / N1)
    W2 = np.exp(sign * np.pi * np.outer(np.arange(N2), np.arange(N2)) / N2)
    tw = np.exp(sign * np.pi * np.outer(np.arange(N2), np.arange(N1)) / n)
    W1 = W1.astype(np.complex64 if x.dtype == jnp.complex64 else np.complex128)
    W2 = W2.astype(W1.dtype)
    tw = tw.astype(W1.dtype)

    x = jnp.moveaxis(x, axis, -1)
    shp = x.shape[:-1]
    x = x.reshape(shp + (N1, N2))
    hi = jax.lax.Precision.HIGHEST
    a = jnp.einsum("...ab,ac->...bc", x, W1, precision=hi) * tw
    b = jnp.einsum("...bc,bd->...dc", a, W2, precision=hi)
    out = b.reshape(shp + (n,))
    if inverse:
        out = out / n
    return jnp.moveaxis(out, -1, axis)


def _use_mxu(shape, axes) -> bool:
    from ..config import _config

    impl = _config["fft_impl"]
    if impl == "xla":
        return False
    if impl == "matmul":
        return all(_split_factor(shape[a]) is not None for a in axes)
    # auto: TPU backend, composite sizes, below the bandwidth-bound regime
    if jax.default_backend() != "tpu":
        return False
    return all(
        shape[a] <= _MXU_MAX_AXIS and _split_factor(shape[a]) is not None
        for a in axes
    )


def mxu_fftn(x, axes: Optional[Sequence[int]] = None, *, inverse: bool = False):
    """N-D (i)FFT via the four-step MXU decomposition (see above)."""
    if axes is None:
        axes = tuple(range(x.ndim))
    axes = tuple(a % x.ndim for a in axes)
    if not jnp.iscomplexobj(x):
        ct = jnp.complex64 if x.dtype == jnp.float32 else jnp.complex128
        x = x.astype(ct)
    for ax in axes:
        x = _mxu_fft_axis(x, ax, inverse=inverse)
    return x


# --- Split-real half-spectrum Hartley ------------------------------------------
#
# For REAL input the complex four-step wastes 2× twice over: the imaginary
# part of the input is zero (stage-A matmuls halve), and the output spectrum
# is hermitian (only k ≤ n/2 need be computed; the Hartley fold
# H[k] = Re F[k] − Im F[k] = (Re+Im) F[n−k] recovers the upper half with
# pure layout ops).  All arithmetic runs as REAL f32 matmuls — XLA lowers
# complex64 dots to 4 real dots with extra materialized passes, so keeping
# (re, im) split also removes HBM round-trips.  Measured on a v5e (f32,
# one 2-D Hartley): 4096²: 2.7 ms vs 4.4 ms (XLA rfft) — 10240²: 28 ms vs
# 41.5 ms.  Factor choice: N1 ≥ N2 minimizing N1+N2 (stage outputs carry k1
# on the lane dim, so the larger factor goes to N1).


def _factor_splitreal(n: int) -> Optional[tuple]:
    """Divisor pair (N1, N2), N1 ≥ N2 > 1, minimizing N1 + N2."""
    fac = _split_factor(n)
    if fac is None:
        return None
    n2, n1 = fac  # _split_factor returns (small, large)
    return n1, n2


def _sr_tables(n, dtype):
    N1, N2 = _factor_splitreal(n)
    W1 = np.exp(-2j * np.pi * np.outer(np.arange(N1), np.arange(N1)) / N1)
    W2 = np.exp(-2j * np.pi * np.outer(np.arange(N2), np.arange(N2)) / N2)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(N2), np.arange(N1)) / n)
    c = lambda z: (z.real.astype(dtype), z.imag.astype(dtype))
    return N1, N2, c(W1), c(W2), c(tw)


def _sr_fourstep_real_last(x, *, half=True):
    """Four-step DFT along the last axis of REAL x → (re, im).

    With `half`, only the k2 ∈ [0, N2//2] block columns are computed —
    every k ≤ n/2 (plus < N1 redundant extras), from which hermitian
    symmetry reconstructs the rest.
    """
    n = x.shape[-1]
    N1, N2, (w1r, w1i), (w2r, w2i), (twr, twi) = _sr_tables(n, x.dtype)
    hi = jax.lax.Precision.HIGHEST
    shp = x.shape[:-1]
    x = x.reshape(shp + (N1, N2))
    # stage A (x real): contract n1 → (..., n2, k1)
    ar = jnp.einsum("...ab,ac->...bc", x, w1r, precision=hi)
    ai = jnp.einsum("...ab,ac->...bc", x, w1i, precision=hi)
    # twiddle (n2, k1)
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    k2sl = slice(0, N2 // 2 + 1) if half else slice(None)
    w2r_, w2i_ = w2r[:, k2sl], w2i[:, k2sl]
    # stage B: contract n2 → (..., k2, k1); flat k = N1·k2 + k1
    cr = (jnp.einsum("...bc,bd->...dc", br, w2r_, precision=hi)
          - jnp.einsum("...bc,bd->...dc", bi, w2i_, precision=hi))
    ci = (jnp.einsum("...bc,bd->...dc", br, w2i_, precision=hi)
          + jnp.einsum("...bc,bd->...dc", bi, w2r_, precision=hi))
    nk = cr.shape[-2] * N1
    return cr.reshape(shp + (nk,)), ci.reshape(shp + (nk,))


def _sr_fourstep_cplx_axis0(xr, xi, n):
    """Four-step DFT along axis 0 of split-complex (xr, xi), transpose-free.

    Stage A is a single left-matmul on the (N1, N2·M) view; stage B's
    dot_general emits (k2, k1, M) directly — flat k = N1·k2 + k1 in
    natural order without any moveaxis.
    """
    N1, N2, (w1r, w1i), (w2r, w2i), (twr, twi) = _sr_tables(n, xr.dtype)
    hi = jax.lax.Precision.HIGHEST
    M = xr.shape[1:]
    Mf = int(np.prod(M)) if M else 1
    xr = xr.reshape(N1, N2 * Mf)
    xi = xi.reshape(N1, N2 * Mf)
    dg = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), precision=hi)
    ar = dg(w1r, xr) - dg(w1i, xi)
    ai = dg(w1r, xi) + dg(w1i, xr)
    ar = ar.reshape(N1, N2, Mf)
    ai = ai.reshape(N1, N2, Mf)
    t1r = twr.T[:, :, None]  # tw1[k1, n2]
    t1i = twi.T[:, :, None]
    br = ar * t1r - ai * t1i
    bi = ar * t1i + ai * t1r
    dg2 = lambda w, b: jax.lax.dot_general(
        w, b, (((0,), (1,)), ((), ())), precision=hi)
    cr = dg2(w2r, br) - dg2(w2i, bi)
    ci = dg2(w2r, bi) + dg2(w2i, br)
    return cr.reshape((n,) + M), ci.reshape((n,) + M)


def hartley_splitreal(x):
    """2-D (or 1-D) full Hartley of a real array via the split-real
    half-spectrum four-step (see module comment)."""
    if x.ndim == 1:
        n = x.shape[0]
        fr, fi = _sr_fourstep_real_last(x, half=True)
        h_lo = (fr - fi)[: n // 2 + 1]
        src = jnp.flip((fr + fi)[1 : (n + 1) // 2])
        return jnp.concatenate([h_lo, src])
    n0, n1 = x.shape
    fr, fi = _sr_fourstep_real_last(x, half=True)
    fr, fi = _sr_fourstep_cplx_axis0(fr, fi, n0)
    # hermitian fold: F[i, j] = conj(F[-i % n0, n1 - j]) for real x, so
    # H[i, j > n1/2] = (Re + Im) F[-i % n0, n1 - j]
    h_lo = (fr - fi)[:, : n1 // 2 + 1]
    src = (fr + fi)[:, 1 : (n1 + 1) // 2]
    src = jnp.flip(src, axis=1)
    src = jnp.roll(jnp.flip(src, axis=0), 1, axis=0)
    return jnp.concatenate([h_lo, src], axis=1)


# The fused Pallas Hartley is kept OPT-IN (`fft_impl="pallas"`), not part
# of "auto": end-to-end timings on a v5e show it matching — not beating —
# the split-real einsum pipeline at ≥4096² (7.50 ms vs 7.37 ms standalone
# at 4096²; XLA already keeps the einsum stages MXU-resident), while its
# Mosaic compile is far more expensive (minutes through a tunneled
# backend vs ~10 s for the einsum pipeline).  Correctness is covered by
# tests/test_pallas_fft.py (interpreter mode off-TPU).
def _use_pallas(x, axes) -> bool:
    from ..config import _config

    from .pallas_fft import pallas_hartley_supported

    if _config["fft_impl"] != "pallas":
        return False
    if not (x.ndim == 2 and len(axes) == 2):
        return False
    return pallas_hartley_supported(x.shape, x.dtype)


def _use_splitreal(x, axes) -> bool:
    from ..config import _config

    if jnp.iscomplexobj(x):
        return False
    if x.ndim not in (1, 2) or len(axes) != x.ndim:
        return False
    if x.shape[-1] % 2:
        return False  # the hermitian fold above assumes even n_last
    if any(_factor_splitreal(x.shape[a]) is None for a in axes):
        return False
    impl = _config["fft_impl"]
    if impl in ("xla", "matmul"):
        return False
    if impl == "splitreal":
        return True
    return jax.default_backend() == "tpu"
