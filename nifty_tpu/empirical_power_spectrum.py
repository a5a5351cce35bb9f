"""Empirical (binned) power spectra of fields on regular grids.

Diagnostic companion to the correlated-field models: bin |FFT|² by |k|
into logarithmic shells, optionally Hann-windowed for non-periodic data.
The shell reduction is a ``segment_sum`` over a statically precomputed
bin index — one fused gather/reduce on device.

Behavioral parity with ``nifty/re/empirical_power_spectrum.py``;
independent implementation.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import numpy as np
from jax import numpy as jnp

__all__ = ["compute_empirical_power_spectrum"]


def _hann_window(shape, axes):
    window = jnp.ones(shape)
    for ax in axes:
        w1 = jnp.hanning(shape[ax])
        bshape = [1] * len(shape)
        bshape[ax] = shape[ax]
        window = window * w1.reshape(bshape)
    return window


def compute_empirical_power_spectrum(
    field,
    distances: Union[float, Tuple[float, ...]],
    axes: Optional[Union[int, Tuple[int, ...]]] = None,
    use_window: bool = False,
    n_bins: Optional[int] = 128,
):
    """Average empirical power spectrum of `field` over `axes`.

    Returns ``(ps, k_bin_centers)``; unconsumed axes survive as leading
    axes of `ps`.  Set ``use_window=True`` for non-periodic fields.
    """
    field = jnp.asarray(field)
    if axes is None:
        axes = tuple(range(field.ndim))
    elif isinstance(axes, int):
        axes = (axes,)
    axes = tuple(a % field.ndim for a in axes)

    if isinstance(distances, (int, float)):
        dist = (float(distances),) * len(axes)
    else:
        dist = tuple(float(d) for d in distances)
        if len(dist) != len(axes):
            raise ValueError("len(distances) must match the number of axes")

    if use_window:
        window = _hann_window(field.shape, axes)
        field = field * window
        w_correction = jnp.mean(window**2)
    else:
        w_correction = 1.0

    power_raw = jnp.abs(jnp.fft.fftn(field, axes=axes)) ** 2 / w_correction

    # static |k| binning (numpy; shapes/distances are static)
    shp = [field.shape[ax] for ax in axes]
    lengths = np.array([n * d for n, d in zip(shp, dist)])
    k_min = 1.0 / lengths.max()
    k_max = 1.0 / min(dist)
    k_bins = np.geomspace(k_min, k_max, n_bins + 1)
    k_centers = np.sqrt(k_bins[1:] * k_bins[:-1])

    ks = [np.fft.fftfreq(n, d=d) for n, d in zip(shp, dist)]
    kg = np.meshgrid(*ks, indexing="ij")
    k_mag = np.sqrt(sum(k**2 for k in kg)).ravel()
    indices = np.digitize(k_mag, k_bins) - 1
    indices = np.clip(indices, 0, n_bins - 1)
    counts = np.bincount(indices, minlength=n_bins).astype(float)
    present = counts > 0

    other_axes = [a for a in range(field.ndim) if a not in axes]
    n_consumed = int(np.prod(shp))
    power_raw = jnp.transpose(power_raw, other_axes + list(axes))
    power_raw = power_raw.reshape(-1, n_consumed)

    idx = jnp.asarray(indices)

    def reduce_one(p):
        s = jax.ops.segment_sum(p, idx, num_segments=n_bins)
        return s[np.where(present)[0]] / jnp.asarray(counts[present])

    ps = jax.vmap(reduce_one)(power_raw)
    final_shape = [field.shape[a] for a in other_axes] + [int(present.sum())]
    return ps.reshape(final_shape), jnp.asarray(k_centers[present])
