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

from ..model import Model
from jax.scipy.special import i0

__all__ = ["nufft2", "nufft1", "nufft_adjoint"]


def _kb_beta(m: int, sigma: float) -> float:
    # Beatty et al. 2005 optimal Kaiser-Bessel shape
    return float(np.pi * np.sqrt((m / sigma) ** 2 * (sigma - 0.5) ** 2 - 0.8))


def _kb_kernel(u, m: int, beta: float):
    """Kaiser–Bessel window on |u| <= m/2 (u in oversampled-bin units).

    The sqrt argument is masked with the double-`where` pattern so the
    gradient w.r.t. `u` stays finite at the window edge t → 0 (positions
    exactly on FFT bins hit it, e.g. `ShiftedPositionFFT` at zero shift).
    """
    t = 1.0 - (2.0 * u / m) ** 2
    inside = t > 0.0
    t_safe = jnp.where(inside, t, 1.0)
    val = i0(beta * jnp.sqrt(t_safe))
    return jnp.where(inside, val, 0.0) / float(np.i0(beta))


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


class VariablePositionNufft(Model):
    """Type-2 NUFFT with the sampling positions as *inputs*: evaluates the
    field's Fourier transform at arbitrary, possibly learned, positions —
    differentiable in both the grid values and the coordinates (the
    response class for self-calibrating interferometry-style instruments;
    reference: ``nifty/cl/library/nft.py:144``).

    Domain: ``{prefix+"grid": grid_shape, prefix+"coord": (ndim, npoints)}``
    (coordinates in cycles per pixel).  Returns the complex visibilities
    of shape ``(npoints,)``.
    """

    def __init__(
        self,
        grid_shape,
        npoints: int,
        *,
        oversampling: float = 2.0,
        kernel_width: int = 6,
        prefix: str = "nufft",
    ):
        from ..utils.tree import ShapeWithDtype, random_like
        from functools import partial as _partial

        self.grid_shape = tuple(int(s) for s in grid_shape)
        self.npoints = int(npoints)
        self.oversampling = float(oversampling)
        self.kernel_width = int(kernel_width)
        self._k_grid = prefix + "grid"
        self._k_coord = prefix + "coord"
        ndim = len(self.grid_shape)
        domain = {
            self._k_grid: ShapeWithDtype(self.grid_shape),
            self._k_coord: ShapeWithDtype((ndim, self.npoints)),
        }
        init = {k: _partial(random_like, primals=v) for k, v in domain.items()}
        super().__init__(domain=domain, init=init)

    def __call__(self, x):
        return nufft2(
            x[self._k_grid],
            x[self._k_coord],
            oversampling=self.oversampling,
            kernel_width=self.kernel_width,
        )


class ShiftedPositionFFT(Model):
    """FFT on a regular grid whose sampling positions may be perturbed:
    the NUFFT is evaluated at the standard FFT frequencies plus learned
    per-mode shifts ``delta`` in units of the frequency spacing — 0
    reproduces the plain FFT, fractional values interpolate between FFT
    frequencies (reference: ``nifty/cl/library/nft.py:289``).

    Domain: ``{prefix+"grid": grid_shape,
    prefix+"delta_coord": (n_shift_dirs,) + grid_shape}``; output has the
    grid shape (complex).
    """

    def __init__(
        self,
        grid_shape,
        *,
        shift_directions=None,
        oversampling: float = 2.0,
        kernel_width: int = 6,
        prefix: str = "spfft",
    ):
        from ..utils.tree import ShapeWithDtype, random_like
        from functools import partial as _partial

        self.grid_shape = tuple(int(s) for s in grid_shape)
        ndim = len(self.grid_shape)
        if shift_directions is None:
            shift_directions = tuple(range(ndim))
        elif isinstance(shift_directions, int):
            shift_directions = (shift_directions,)
        self.shift_directions = tuple(sorted(set(int(d) for d in shift_directions)))
        if any(d < 0 or d >= ndim for d in self.shift_directions):
            raise ValueError("shift_directions out of range")
        self.oversampling = float(oversampling)
        self.kernel_width = int(kernel_width)
        self._k_grid = prefix + "grid"
        self._k_delta = prefix + "delta_coord"
        domain = {
            self._k_grid: ShapeWithDtype(self.grid_shape),
            self._k_delta: ShapeWithDtype(
                (len(self.shift_directions),) + self.grid_shape
            ),
        }
        init = {k: _partial(random_like, primals=v) for k, v in domain.items()}
        # base FFT frequencies in cycles/pixel, flattened (ndim, N)
        freqs = np.meshgrid(
            *[np.fft.fftfreq(n) for n in self.grid_shape], indexing="ij"
        )
        self._base = np.stack([f.ravel() for f in freqs])
        # frequency spacing per axis (one FFT bin, cycles/pixel)
        self._df = np.array([1.0 / n for n in self.grid_shape])
        super().__init__(domain=domain, init=init)

    def __call__(self, x):
        delta = x[self._k_delta].reshape(len(self.shift_directions), -1)
        coords = jnp.asarray(self._base)
        for i, d in enumerate(self.shift_directions):
            coords = coords.at[d].add(self._df[d] * delta[i])
        vis = nufft2(
            x[self._k_grid],
            coords,
            oversampling=self.oversampling,
            kernel_width=self.kernel_width,
        )
        # nufft2 uses centered pixel indices (j − n//2); re-phase so that
        # delta = 0 reproduces the standard (corner-origin) FFT exactly
        shift = sum(
            coords[d] * (self.grid_shape[d] // 2)
            for d in range(len(self.grid_shape))
        )
        vis = vis * jnp.exp(-2j * jnp.pi * shift)
        return vis.reshape(self.grid_shape)
