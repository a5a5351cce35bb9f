"""Dynamical-field priors: causal Green's functions and light cones.

Models for fields governed by unknown homogeneous dynamics: a learned
transfer function G(ω, k) built from a smoothness-weighted latent field,
made causal by zeroing the negative-time part of its kernel (cepstral
construction for minimum-phase filters), optionally confined to a
learned light cone exp(−½ Re√((x/σc)²−t²)²).

Reference: ``nifty/cl/library/dynamic_operator.py:131,192`` and
``light_cone_operator.py:103``; independent jax implementation — complex
arithmetic end-to-end (no manual Jacobians; AD differentiates the cone
and the cepstrum automatically).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np
from jax import numpy as jnp

from ..model import Model
from ..utils.tree import ShapeWithDtype, random_like

__all__ = [
    "signed_fft_coords",
    "light_cone",
    "dynamic_operator",
    "dynamic_lightcone_operator",
]


def signed_fft_coords(shape, distances, absolute=False):
    """Per-axis signed coordinates in FFT layout: entry ``j`` carries
    ``min(j, N−j)·d`` with the upper half negated (reference:
    ``nifty/cl/library/light_cone_operator.py:32`` ``_make_coords``)."""
    dim = len(shape)
    out = np.zeros((dim,) + tuple(shape))
    for i, (n, d) in enumerate(zip(shape, distances)):
        ks = np.minimum(np.arange(n), n - np.arange(n)).astype(float) * d
        if not absolute:
            ks[n // 2 + 1 :] *= -1.0
        bshape = (1,) * i + (n,) + (1,) * (dim - i - 1)
        out[i] += ks.reshape(bshape)
    return out


def light_cone(lightspeeds, shape, distances, sigx: float):
    """Light-cone window on a (t, x…) grid: axis 0 is time.

    ``exp(−½ Re√(Σ_i c_i (x_i/(σ_x d_i))² − (t/(σ_x d_t))²)²)`` — one for
    space-like separations, Gaussian fall-off outside the cone.
    Differentiable in the lightspeed tensor `c`.
    """
    x = signed_fft_coords(shape, distances)
    a = -((jnp.asarray(x[0]) / (sigx * distances[0])) ** 2)
    a = a.astype(jnp.complex64 if lightspeeds.dtype == jnp.float32 else jnp.complex128)
    for i in range(1, len(shape)):
        a = a + lightspeeds[i - 1] * (
            jnp.asarray(x[i]) / (sigx * distances[i])
        ) ** 2
    # guard the sqrt branch point at a = 0 (the grid origin) so AD stays
    # finite: the cone value there is 1 with zero sensitivity
    small = jnp.abs(a) < 1e-20
    a_safe = jnp.where(small, 1.0 + 0.0j, a)
    delta = jnp.where(small, 0.0, jnp.sqrt(a_safe).real)
    return jnp.exp(-0.5 * delta**2)


def _central_crop(x, shape):
    """Crop an FFT-layout (padded-harmonic) array back to `shape` by
    removing the central high-frequency block per axis."""
    for ax, (n_p, n) in enumerate(zip(x.shape, shape)):
        if n_p == n:
            continue
        lo = (n + 1) // 2
        hi = n - lo
        idx = np.concatenate([np.arange(lo), np.arange(n_p - hi, n_p)])
        x = jnp.take(x, jnp.asarray(idx), axis=ax)
    return x


def dynamic_operator(
    *,
    shape: Tuple[int, ...],
    distances,
    key: str,
    sm_s0: float,
    sm_x0,
    harmonic_padding=None,
    causal: bool = True,
    minimum_phase: bool = False,
):
    """Model of a (causal) Green's-function transfer field G(ω, k).

    The latent white field (under `key`, on the harmonically padded grid)
    is weighted toward smooth transfer functions by ``sm_s0 / (1 + Σ
    (j_i/sm_x0_i)²)`` in index units, Fourier-transformed, cropped, and —
    for ``causal``/``minimum_phase`` — passed through the cepstral
    truncation that zeroes the kernel at negative times.

    Returns ``(model, ops)`` where ``model(x)`` yields the complex
    transfer field on the (ω, k) grid of `shape` and `ops` exposes the
    intermediate callables (parity with
    ``nifty/cl/library/dynamic_operator.py:131``).
    """
    shape = tuple(int(s) for s in shape)
    ndim = len(shape)
    distances = tuple(np.broadcast_to(np.asarray(distances, float), (ndim,)))
    if harmonic_padding is None:
        pad = (0,) * ndim
    elif isinstance(harmonic_padding, int):
        pad = (harmonic_padding,) * ndim
    else:
        pad = tuple(int(p) for p in harmonic_padding)
    pshape = tuple(n + p for n, p in zip(shape, pad))
    sm_x0 = tuple(np.broadcast_to(np.asarray(sm_x0, float), (ndim,)))

    # smoothness weight in signed index units of the padded grid
    idx = signed_fft_coords(pshape, (1.0,) * ndim)
    denom = 1.0
    for i in range(ndim):
        denom = denom + (idx[i] / sm_x0[i]) ** 2
    sm_weight = np.asarray(sm_s0 / denom)

    # time-axis causal mask (1 + sign(t): doubles positive times, zeroes
    # negative ones; t is FFT-layout axis 0 of the *original* grid)
    t = signed_fft_coords(shape, distances)[0]
    causal_mask = np.asarray(1.0 + np.sign(t))

    def smoothed_dynamics(x):
        xi = x[key]
        m = jnp.fft.fftn(sm_weight * xi)
        return _central_crop(m, shape)

    def transfer(x):
        m = smoothed_dynamics(x)
        m = -jnp.log(m + 0j)
        if not minimum_phase:
            m = jnp.exp(m)
        if causal or minimum_phase:
            kern = jnp.fft.ifftn(m)
            kern = kern * causal_mask
            m = jnp.fft.fftn(kern)
        if minimum_phase:
            m = jnp.exp(m)
        return m

    domain = {key: ShapeWithDtype(pshape)}
    model = Model(
        transfer,
        domain=domain,
        init={key: partial(random_like, primals=domain[key])},
    )
    ops = {
        "smoothed_dynamics": smoothed_dynamics,
        "causal_mask": causal_mask,
        "smoothness_weight": sm_weight,
    }
    return model, ops


def dynamic_lightcone_operator(
    *,
    shape,
    distances,
    key: str,
    lightcone_key: str,
    sm_s0: float,
    sm_x0,
    sigc,
    quant: float,
    harmonic_padding=None,
    causal: bool = True,
    minimum_phase: bool = False,
):
    """Green's-function model confined to a learned light cone (axis 0 =
    time; requires ndim ≥ 2).  The lightspeed tensor is log-normally
    parametrized by the latent under `lightcone_key`.

    Returns ``(model, ops)`` with ``ops['lightspeed']`` exposing the
    learned speeds (parity: ``nifty/cl/library/dynamic_operator.py:192``).
    """
    shape = tuple(int(s) for s in shape)
    ndim = len(shape)
    if ndim < 2:
        raise ValueError("a light cone needs at least one spatial axis")
    distances = tuple(np.broadcast_to(np.asarray(distances, float), (ndim,)))
    sigc = tuple(np.broadcast_to(np.asarray(sigc, float), (ndim - 1,)))

    base, ops = dynamic_operator(
        shape=shape,
        distances=distances,
        key=key,
        sm_s0=sm_s0,
        sm_x0=sm_x0,
        harmonic_padding=harmonic_padding,
        causal=causal,
        minimum_phase=minimum_phase,
    )

    sigc_arr = jnp.asarray(sigc)

    def lightspeed(x):
        return jnp.exp(-0.5 * sigc_arr * x[lightcone_key]) * jnp.asarray(
            np.asarray(distances[1:]) / distances[0]
        )

    def cone(x):
        c = jnp.exp(sigc_arr * x[lightcone_key])
        return light_cone(c, shape, distances, quant)

    def model_fn(x):
        return cone(x) * base(x)

    domain = dict(base.domain)
    domain[lightcone_key] = ShapeWithDtype((ndim - 1,))
    init = {
        k: partial(random_like, primals=v) for k, v in domain.items()
    }
    model = Model(model_fn, domain=domain, init=init)
    ops = dict(ops)
    ops["lightspeed"] = lightspeed
    ops["light_cone"] = cone
    return model, ops
