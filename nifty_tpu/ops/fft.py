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

__all__ = ["hartley", "mxu_fftn"]


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

    On TPU, sizes in the compute-bound regime route through the MXU
    matmul FFT (see `mxu_fftn`); otherwise real input is computed via
    rfftn + hermitian reconstruction and complex input via fftn.
    Self-adjoint up to the grid volume: H(H(x)) = N·x.
    """
    if axes is None:
        axes = tuple(range(x.ndim))
    axes = tuple(a % x.ndim for a in axes)
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
