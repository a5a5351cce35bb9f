"""Non-uniform FFTs (gridder/degridder) in pure XLA.

Replaces the reference's ducc0/cufinufft NUFFT bindings
(``nifty/cl/library/nft.py:40-140``) with a Kaiser–Bessel
interpolation NUFFT built from XLA primitives: oversampled FFT +
windowed gather (type 2) and its exact linear transpose (type 1).  The
kernel weights are computed on the fly from the (possibly traced)
sampling coordinates, so learned/variable positions differentiate
through the whole transform.

Conventions: ``coords`` holds frequencies in **cycles per pixel**,
shape ``(ndim, M)``; type 2 computes
``y_k = Σ_j x_j · exp(-2πi · coords_k · (j - N/2))`` (centered image
indices).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import numpy as np
from jax import numpy as jnp
from jax.scipy.special import i0

__all__ = ["nufft2", "nufft1", "nufft_adjoint"]


def _kb_beta(m: int, sigma: float) -> float:
    # Beatty et al. 2005 optimal Kaiser-Bessel shape
    return float(np.pi * np.sqrt((m / sigma) ** 2 * (sigma - 0.5) ** 2 - 0.8))


def _kb_kernel(u, m: int, beta: float):
    """Kaiser–Bessel window on |u| <= m/2 (u in oversampled-bin units)."""
    t = 1.0 - (2.0 * u / m) ** 2
    val = i0(beta * jnp.sqrt(jnp.maximum(t, 0.0)))
    return jnp.where(t >= 0.0, val, 0.0) / float(np.i0(beta))


def _kb_apodization(xi, m: int, beta: float):
    """Continuous Fourier transform of the KB window at image coordinate
    ``xi = j'/N_os`` (analytic; sinh/sin branches)."""
    arg = beta**2 - (np.pi * m * xi) ** 2
    s = jnp.sqrt(jnp.abs(arg))
    pos = jnp.sinh(jnp.maximum(s, 1e-30)) / jnp.maximum(s, 1e-30)
    neg = jnp.sinc(s / np.pi)  # sin(s)/s
    val = jnp.where(arg >= 0.0, pos, neg)
    return val * m / float(np.i0(beta))


def _params(shape, oversampling, kernel_width):
    n_os = tuple(int(np.ceil(oversampling * n / 2) * 2) for n in shape)
    beta = _kb_beta(kernel_width, oversampling)
    return n_os, beta


def _deapodize(x, n_os, m, beta):
    for ax, (n, no) in enumerate(zip(x.shape, n_os)):
        j = jnp.arange(n) - n // 2
        corr = _kb_apodization(j / no, m, beta)
        shape = [1] * x.ndim
        shape[ax] = n
        x = x / corr.reshape(shape)
    return x


def nufft2(
    x,
    coords,
    *,
    oversampling: float = 2.0,
    kernel_width: int = 6,
):
    """Type-2 NUFFT (uniform → non-uniform): evaluate the DFT of the
    real/complex image `x` at frequencies ``coords`` (ndim, M) in cycles
    per pixel.  Linear in `x`, differentiable in both arguments."""
    shape = x.shape
    ndim = len(shape)
    coords = jnp.asarray(coords)
    if coords.shape[0] != ndim:
        raise ValueError("coords must be (ndim, M)")
    m = int(kernel_width)
    n_os, beta = _params(shape, oversampling, m)

    x = _deapodize(x, n_os, m, beta)
    # center the image in the padded FFT frame: index j' = j - n/2 at
    # padded position j' mod n_os  → achieved by rolling the padded array
    pad = jnp.zeros(n_os, dtype=x.dtype)
    pad = pad.at[tuple(slice(0, n) for n in shape)].set(x)
    pad = jnp.roll(
        pad, shift=[-(n // 2) for n in shape], axis=tuple(range(ndim))
    )
    f = jnp.fft.fftn(pad)

    # windowed gather around each target frequency
    nu = coords * jnp.asarray(n_os)[:, None]  # in oversampled-bin units
    k0 = jnp.floor(nu).astype(jnp.int32)
    offs = np.arange(-(m // 2) + 1, m // 2 + 1)  # m offsets
    out = jnp.zeros(coords.shape[1], dtype=f.dtype)
    for off in np.ndindex(*([len(offs)] * ndim)):
        idx, w = [], 1.0
        for d in range(ndim):
            kd = k0[d] + int(offs[off[d]])
            w = w * _kb_kernel(nu[d] - kd, m, beta)
            idx.append(jnp.mod(kd, n_os[d]))
        out = out + w * f[tuple(idx)]
    return out


def nufft_adjoint(
    y,
    coords,
    shape: Tuple[int, ...],
    *,
    oversampling: float = 2.0,
    kernel_width: int = 6,
):
    """Type-1 NUFFT (non-uniform → uniform), the exact adjoint of
    :func:`nufft2` for the same parameters: grid the non-uniform samples
    `y` back onto an image of `shape`."""
    coords = jnp.asarray(coords)

    def fwd(x):
        return nufft2(
            x, coords, oversampling=oversampling, kernel_width=kernel_width
        )

    proto = jax.ShapeDtypeStruct(tuple(shape), jnp.complex128 if y.dtype == jnp.complex128 else jnp.complex64)
    ft = jax.linear_transpose(fwd, proto)
    return jnp.conj(ft(jnp.conj(y))[0])


nufft1 = nufft_adjoint
