"""Correlated-field GP priors with non-parametric power spectra.

The model: a standard-normal excitation field ξ in harmonic space is
colored by a learnable amplitude spectrum (power law + integrated-Wiener-
process deviations over log-|k|, or a Matérn kernel), scaled by a global
zero-mode, and mapped to position space by a harmonic transform (Hartley
on regular grids; spherical-harmonic synthesis on HEALPix grids).

All mode-binning bookkeeping (power distributors) is computed with numpy
at model-construction time — only gathers and FFTs happen on device.

Behavioral parity with ``nifty/re/correlated_field.py``; independent
implementation.
"""

from __future__ import annotations

import dataclasses
from collections import namedtuple
from functools import partial, reduce
from typing import Any, Callable, Optional, Tuple, Union

import numpy as np
from jax import numpy as jnp

from ..model import Model, WrappedCall
from ..num.stats_distributions import lognormal_prior, normal_prior
from ..ops.fft import hartley
from ..utils.misc import wrap
from ..utils.tree import ShapeWithDtype, random_like
from .gauss_markov import IntegratedWienerProcess

__all__ = [
    "CorrelatedFieldMaker",
    "density_estimator",
    "HEALPixGrid",
    "LMGrid",
    "MaternAmplitude",
    "NonParametricAmplitude",
    "RegularCartesianGrid",
    "RegularFourierGrid",
    "get_fourier_mode_distributor",
    "get_spherical_mode_distributor",
    "make_grid",
]


# --- mode distributors -------------------------------------------------------


def _unique_mode_distributor(m_length, uniqueness_rtol=1e-12):
    """Bin harmonic modes by (tolerantly) unique |k|.

    Returns the per-mode bin index, the unique lengths, and each bin's
    multiplicity.
    """
    um = np.unique(m_length)
    tol = uniqueness_rtol * um[-1]
    um = um[np.diff(np.append(um, 2 * um[-1])) > tol]
    binbounds = 0.5 * (um[:-1] + um[1:])
    m_length_idx = np.searchsorted(binbounds, m_length)
    m_count = np.bincount(m_length_idx.ravel(), minlength=um.size)
    if np.any(m_count == 0) or um.shape != m_count.shape:
        raise RuntimeError("invalid harmonic mode(s) encountered")
    return m_length_idx, um, m_count


def get_fourier_mode_distributor(shape, distances, uniqueness_rtol=1e-12):
    """|k|-binning for the Fourier modes of a regular grid
    (reference: ``nifty/re/correlated_field.py:134``)."""
    shape = (shape,) if isinstance(shape, int) else tuple(shape)
    distances = np.broadcast_to(np.atleast_1d(distances), (len(shape),))
    dk = 1.0 / (np.array(shape) * distances)

    # |k|² accumulated dimension-by-dimension via broadcasting
    k2 = None
    for n, d in zip(shape, dk):
        ax = np.arange(n)
        ax = np.minimum(ax, n - ax) * d
        ax = ax.astype(np.float64) ** 2
        k2 = ax if k2 is None else k2[..., np.newaxis] + ax
    m_length = np.sqrt(k2) if len(shape) > 1 else np.sqrt(k2)
    return _unique_mode_distributor(m_length, uniqueness_rtol=uniqueness_rtol)


def get_spherical_mode_distributor(
    nside, lmax=None, mmax=None, uniqueness_rtol=1e-12
):
    """ℓ-binning for spherical-harmonic modes in real-alm packing
    (reference: ``nifty/re/correlated_field.py:70``)."""
    lmax = 2 * nside if lmax is None else int(lmax)
    if lmax < 0:
        raise ValueError("lmax must be >= 0")
    mmax = lmax if mmax is None else int(mmax)
    if mmax < 0 or mmax > lmax:
        raise ValueError("mmax must be in [0, lmax]")
    size = (lmax + 1) ** 2 - (lmax - mmax) * (lmax - mmax + 1)

    # mode-length array in packed real-alm ordering: all m=0 first, then for
    # each m >= 1 the (real, imag) pairs for l = m..lmax
    ldist = np.empty((size,), dtype=np.float64)
    ldist[: lmax + 1] = np.arange(lmax + 1, dtype=np.float64)
    pairs = np.repeat(np.arange(lmax + 1, dtype=np.float64), 2)
    idx = lmax + 1
    for m in range(1, mmax + 1):
        n = 2 * (lmax + 1 - m)
        ldist[idx : idx + n] = pairs[2 * m :]
        idx += n
    return (
        _unique_mode_distributor(ldist, uniqueness_rtol=uniqueness_rtol),
        (lmax, mmax, size),
    )


# --- grids -------------------------------------------------------------------

RegularCartesianGrid = namedtuple(
    "RegularCartesianGrid",
    ("shape", "total_volume", "distances", "harmonic_grid"),
    defaults=(None,),
)

RegularFourierGrid = namedtuple(
    "RegularFourierGrid",
    (
        "shape",
        "power_distributor",
        "mode_multiplicity",
        "mode_lengths",
        "relative_log_mode_lengths",
        "log_volume",
    ),
)

HEALPixGrid = namedtuple(
    "HEALPixGrid",
    ("nside", "shape", "total_volume", "harmonic_grid"),
    defaults=(None,),
)

LMGrid = namedtuple(
    "LMGrid",
    (
        "lmax",
        "mmax",
        "shape",
        "power_distributor",
        "mode_multiplicity",
        "mode_lengths",
        "relative_log_mode_lengths",
        "log_volume",
    ),
)


def _log_modes(m_length):
    """Relative log mode lengths and the log-k bin widths for the IWP."""
    um = m_length.copy()
    um[1:] = np.log(um[1:])
    um[1:] -= um[1]
    assert um[0] == 0.0
    log_vol = um[2:] - um[1:-1]
    return um, log_vol


def make_grid(shape, distances, harmonic_type):
    """Build the (position, harmonic) grid pair for an amplitude model."""
    shape = (shape,) if isinstance(shape, int) else tuple(shape)
    ht = harmonic_type.lower()
    if ht == "fourier":
        distances = tuple(np.broadcast_to(distances, (len(shape),)))
        totvol = float(np.prod(np.array(shape) * np.array(distances)))
        m_length_idx, m_length, m_count = get_fourier_mode_distributor(
            shape, distances
        )
        um, log_vol = _log_modes(m_length)
        harmonic_grid = RegularFourierGrid(
            shape=shape,
            power_distributor=m_length_idx,
            mode_multiplicity=m_count,
            mode_lengths=m_length,
            relative_log_mode_lengths=um,
            log_volume=log_vol,
        )
        return RegularCartesianGrid(
            shape=shape,
            total_volume=totvol,
            distances=distances,
            harmonic_grid=harmonic_grid,
        )
    if ht == "spherical":
        if len(shape) != 1:
            raise ValueError("spherical `shape` is the single nside value")
        nside = shape[0]
        (m_length_idx, m_length, m_count), (lmax, mmax, size) = (
            get_spherical_mode_distributor(nside)
        )
        um, log_vol = _log_modes(m_length)
        harmonic_grid = LMGrid(
            lmax=lmax,
            mmax=mmax,
            shape=(size,),
            power_distributor=m_length_idx,
            mode_multiplicity=m_count,
            mode_lengths=m_length,
            relative_log_mode_lengths=um,
            log_volume=log_vol,
        )
        return HEALPixGrid(
            nside=nside,
            shape=(12 * nside**2,),
            total_volume=4 * np.pi,
            harmonic_grid=harmonic_grid,
        )
    raise ValueError(f"invalid harmonic_type {harmonic_type!r}")


def _remove_slope(rel_log_mode_dist, x):
    sc = rel_log_mode_dist / rel_log_mode_dist[-1]
    return x - x[-1] * sc


# --- amplitude models --------------------------------------------------------


class NonParametricAmplitude(Model):
    """Amplitude spectrum: power law in log|k| plus IWP deviations,
    normalized so `fluctuations` sets the total field std
    (reference: ``nifty/re/correlated_field.py:398``)."""

    fluctuations: Optional[Callable] = dataclasses.field(
        metadata=dict(static=False), default=None
    )
    loglogavgslope: Callable = dataclasses.field(
        metadata=dict(static=False), default=None
    )
    deviations: Optional[Callable] = dataclasses.field(
        metadata=dict(static=False), default=None
    )
    # O(#unique modes) tables ride as dynamic pytree leaves: threaded
    # through jit as runtime parameters they never bloat the HLO (giant
    # literals overflow the remote-compile payload) nor trigger per-compile
    # device-constant fetches
    mode_multiplicity: Any = dataclasses.field(
        metadata=dict(static=False), default=None
    )
    relative_log_mode_lengths: Any = dataclasses.field(
        metadata=dict(static=False), default=None
    )

    def __init__(
        self,
        grid,
        fluctuations: Optional[Callable],
        loglogavgslope: Callable,
        flexibility: Optional[Callable] = None,
        asperity: Optional[Callable] = None,
        prefix: str = "",
        kind: str = "amplitude",
    ):
        self.grid = grid
        self.kind = kind.lower()
        if self.kind not in ("amplitude", "power"):
            raise ValueError(f"invalid kind {kind!r}")
        log_vol = grid.harmonic_grid.log_volume

        self.loglogavgslope = WrappedCall(
            loglogavgslope, name=prefix + "loglogavgslope", white_init=True
        )
        self.fluctuations = (
            WrappedCall(fluctuations, name=prefix + "fluctuations", white_init=True)
            if fluctuations is not None
            else None
        )
        if flexibility is not None and log_vol.size > 0:
            flexibility = WrappedCall(
                flexibility, name=prefix + "flexibility", white_init=True
            )
            if asperity is not None:
                asperity = WrappedCall(
                    asperity, name=prefix + "asperity", white_init=True
                )
            # x0 as numpy: build-time device arrays in model closures make
            # tunneled TPU compiles pathologically slow
            self.deviations = IntegratedWienerProcess(
                np.zeros((2,)),
                flexibility,
                log_vol,
                name=prefix + "spectrum",
                asperity=asperity,
            )
        else:
            self.deviations = None

        self.mode_multiplicity = jnp.asarray(grid.harmonic_grid.mode_multiplicity)
        self.relative_log_mode_lengths = jnp.asarray(
            grid.harmonic_grid.relative_log_mode_lengths
        )

        models = [self.fluctuations, self.loglogavgslope, self.deviations]
        domain = reduce(
            lambda a, b: {**a, **b}, [m.domain for m in models if m is not None]
        )
        super().__init__(domain=domain, white_init=True)

    def __call__(self, primals):
        mode_multiplicity = self.mode_multiplicity
        rel_log_modes = self.relative_log_mode_lengths

        flu = 1.0 if self.fluctuations is None else self.fluctuations(primals)
        ln_spectrum = self.loglogavgslope(primals) * rel_log_modes
        if self.deviations is not None:
            twolog = self.deviations(primals)
            # prepend the (fixed) zero mode, keep the integrated coordinate
            twolog = jnp.concatenate((jnp.zeros((1,)), twolog[:, 0]))
            ln_spectrum = ln_spectrum + _remove_slope(rel_log_modes, twolog)
        spectrum = jnp.exp(ln_spectrum)

        # normalize out the non-zero-mode power, then scale by fluctuations
        totvol = self.grid.total_volume
        if self.kind == "amplitude":
            norm = jnp.sqrt(jnp.sum(mode_multiplicity[1:] * spectrum[1:] ** 2))
            amplitude = flu * (totvol / norm) * spectrum
        else:
            norm = jnp.sqrt(jnp.sum(mode_multiplicity[1:] * spectrum[1:]))
            amplitude = flu * (totvol / norm) * jnp.sqrt(spectrum)
        return amplitude.at[0].set(totvol)


class MaternAmplitude(Model):
    """Matérn-kernel amplitude spectrum
    (reference: ``nifty/re/correlated_field.py:302``)."""

    scale: Optional[Callable] = dataclasses.field(
        metadata=dict(static=False), default=None
    )
    cutoff: Callable = dataclasses.field(metadata=dict(static=False), default=None)
    loglogslope: Callable = dataclasses.field(
        metadata=dict(static=False), default=None
    )
    mode_lengths: Any = dataclasses.field(metadata=dict(static=False), default=None)
    mode_multiplicity: Any = dataclasses.field(
        metadata=dict(static=False), default=None
    )

    def __init__(
        self,
        grid,
        scale: Optional[Callable],
        cutoff: Callable,
        loglogslope: Callable,
        renormalize_amplitude: bool,
        prefix: str = "",
        kind: str = "amplitude",
    ):
        self.grid = grid
        self.kind = kind.lower()
        if self.kind not in ("amplitude", "power"):
            raise ValueError(f"invalid kind {kind!r}")
        self.cutoff = WrappedCall(cutoff, name=prefix + "cutoff", white_init=True)
        self.loglogslope = WrappedCall(
            loglogslope, name=prefix + "loglogslope", white_init=True
        )
        self.scale = (
            WrappedCall(scale, name=prefix + "scale", white_init=True)
            if scale is not None
            else None
        )
        self.renormalize_amplitude = renormalize_amplitude
        self.mode_lengths = jnp.asarray(grid.harmonic_grid.mode_lengths)
        self.mode_multiplicity = jnp.asarray(grid.harmonic_grid.mode_multiplicity)
        models = [self.scale, self.cutoff, self.loglogslope]
        domain = reduce(
            lambda a, b: {**a, **b}, [m.domain for m in models if m is not None]
        )
        super().__init__(domain=domain, white_init=True)

    def __call__(self, primals):
        scl = 1.0 if self.scale is None else self.scale(primals)
        ctf = self.cutoff(primals)
        slp = self.loglogslope(primals)
        k = self.mode_lengths
        ln_spectrum = 0.25 * slp * jnp.log1p((k / ctf) ** 2)
        spectrum = jnp.exp(ln_spectrum)

        totvol = self.grid.total_volume
        norm = 1.0
        if self.renormalize_amplitude:
            mm = self.mode_multiplicity
            if self.kind == "amplitude":
                norm = jnp.sqrt(jnp.sum(mm[1:] * spectrum[1:] ** 2))
            else:
                norm = jnp.sqrt(jnp.sum(mm[1:] * spectrum[1:]))
            norm = norm / jnp.sqrt(totvol)
        if self.kind == "power":
            spectrum = jnp.sqrt(spectrum)
        spectrum = scl * (jnp.sqrt(totvol) / norm) * spectrum
        return spectrum.at[0].set(totvol)


# --- the finalized model -----------------------------------------------------


class CorrelatedField(Model):
    """The finalized correlated-field model: ξ colored by the outer-product
    amplitude, mapped through the harmonic transform(s), plus the offset
    (reference assembles a closure instead,
    ``nifty/re/correlated_field.py:850-918``).

    The power-distributor index tables (full harmonic-grid shape) and the
    amplitude models' mode tables are *dynamic* pytree leaves: threaded
    through ``jit`` as arguments they stay runtime parameters.  Closure-
    captured they would be inlined into the HLO — at 10⁸ grid points that
    is a multi-hundred-MB program no compiler endpoint accepts.
    """

    amplitudes: Any = dataclasses.field(metadata=dict(static=False), default=None)
    distributors: Any = dataclasses.field(metadata=dict(static=False), default=None)

    def __init__(
        self,
        *,
        amplitudes,
        distributors,
        azm,
        offset_mean,
        xi_key,
        harmonic_transforms,
        domain,
        init,
    ):
        self.amplitudes = tuple(amplitudes)
        self.distributors = tuple(distributors)
        self.azm = azm
        self.offset_mean = offset_mean
        self.xi_key = xi_key
        self.harmonic_transforms = tuple(harmonic_transforms)
        super().__init__(domain=domain, init=init)

    def __call__(self, p):
        azm = self.azm(p)
        outer = None
        for amp, dist in zip(self.amplitudes, self.distributors):
            a = amp(p)
            # divide the degenerate zero-mode out of each amplitude
            a = a.at[1:].mul(1.0 / azm)
            ea = a[dist]
            # order matters — must match the excitation axes
            outer = ea if outer is None else jnp.tensordot(outer, ea, axes=0)
        out = azm * outer * p[self.xi_key]
        for dvol, ht in self.harmonic_transforms:
            out = dvol * ht(out)
        return self.offset_mean + out


# --- the maker ---------------------------------------------------------------


def _parse_prior(value, default_prior, what):
    if isinstance(value, (tuple, list)):
        return default_prior(*value)
    if callable(value):
        return value
    raise TypeError(f"invalid `{what}` specified; got {type(value)}")


class CorrelatedFieldMaker:
    """Builder for hierarchical correlated-field models.

    Call :meth:`add_fluctuations` once per subgrid (their spectra combine
    as an outer product), set the global offset via
    :meth:`set_amplitude_total_offset`, then :meth:`finalize`
    (reference: ``nifty/re/correlated_field.py:519``).
    """

    def __init__(self, prefix: str):
        self._azm = None
        self._offset_mean = None
        self._fluctuations = []
        self._target_grids = []
        self._parameter_tree = {}
        self._prefix = prefix

    def add_fluctuations(
        self,
        shape,
        distances,
        fluctuations,
        loglogavgslope,
        flexibility=None,
        asperity=None,
        prefix: str = "",
        harmonic_type: str = "fourier",
        non_parametric_kind: str = "amplitude",
    ):
        """Add a non-parametric correlation structure on a subgrid."""
        grid = make_grid(shape, distances, harmonic_type)
        flu = _parse_prior(fluctuations, lognormal_prior, "fluctuations")
        slp = _parse_prior(loglogavgslope, normal_prior, "loglogavgslope")
        flx = (
            _parse_prior(flexibility, lognormal_prior, "flexibility")
            if flexibility is not None
            else None
        )
        asp = (
            _parse_prior(asperity, lognormal_prior, "asperity")
            if asperity is not None
            else None
        )
        npa = NonParametricAmplitude(
            grid=grid,
            fluctuations=flu,
            loglogavgslope=slp,
            flexibility=flx,
            asperity=asp,
            prefix=self._prefix + prefix,
            kind=non_parametric_kind,
        )
        self._fluctuations.append(npa)
        self._target_grids.append(grid)
        self._parameter_tree.update(npa.domain)

    def add_fluctuations_matern(
        self,
        shape,
        distances,
        scale,
        cutoff,
        loglogslope,
        renormalize_amplitude: bool,
        prefix: str = "",
        harmonic_type: str = "fourier",
        non_parametric_kind: str = "amplitude",
    ):
        """Add a Matérn-kernel correlation structure on a subgrid."""
        grid = make_grid(shape, distances, harmonic_type)
        scale = _parse_prior(scale, lognormal_prior, "scale")
        cutoff = _parse_prior(cutoff, lognormal_prior, "cutoff")
        loglogslope = _parse_prior(loglogslope, normal_prior, "loglogslope")
        ma = MaternAmplitude(
            grid=grid,
            scale=scale,
            cutoff=cutoff,
            loglogslope=loglogslope,
            renormalize_amplitude=renormalize_amplitude,
            prefix=self._prefix + prefix,
            kind=non_parametric_kind,
        )
        self._fluctuations.append(ma)
        self._target_grids.append(grid)
        self._parameter_tree.update(ma.domain)

    def set_amplitude_total_offset(self, offset_mean, offset_std):
        """Set the field's global offset and the zero-mode prior."""
        self._offset_mean = offset_mean
        zm = offset_std
        if not callable(zm):
            if zm is None or len(zm) != 2:
                raise TypeError(f"invalid `offset_std` {offset_std!r}")
            zm = lognormal_prior(*zm)
        self._azm = wrap(zm, self._prefix + "zeromode")
        self._parameter_tree[self._prefix + "zeromode"] = ShapeWithDtype(())

    @property
    def amplitude_total_offset(self) -> Callable:
        if self._azm is None:
            raise RuntimeError("set_amplitude_total_offset must be called first")
        return self._azm

    @property
    def azm(self):
        return self.amplitude_total_offset

    @property
    def fluctuations(self) -> Tuple[Callable, ...]:
        return tuple(self._fluctuations)

    def get_normalized_amplitudes(self) -> Tuple[Callable, ...]:
        """Amplitudes with the degenerate zero-mode divided out."""

        def normalize(amp):
            def normalized(p):
                a = amp(p)
                return a.at[1:].mul(1.0 / self.azm(p))

            return normalized

        return tuple(normalize(a) for a in self._fluctuations)

    @property
    def amplitude(self) -> Callable:
        if len(self._fluctuations) > 1:
            raise NotImplementedError(
                "no unique amplitude for multiple spectra; only relative"
                " scales are defined"
            )
        amp = self._fluctuations[0]

        def amplitude_with_zm(p):
            return amp(p).at[0].mul(self.azm(p))

        return amplitude_with_zm

    @property
    def power_spectrum(self) -> Callable:
        amp = self.amplitude
        return lambda p: amp(p) ** 2

    def finalize(self) -> Model:
        """Assemble the model: ξ colored by the outer-product amplitude,
        mapped through the harmonic transform(s), plus the offset."""
        harmonic_transforms = []
        excitation_shape = ()
        for sgrid in self._target_grids:
            sub_shp = sgrid.harmonic_grid.shape
            excitation_shape += sub_shp
            n = len(excitation_shape)
            harmonic_dvol = 1.0 / sgrid.total_volume
            if isinstance(sgrid, RegularCartesianGrid):
                axes = tuple(range(n - len(sub_shp), n))
                trafo = partial(hartley, axes=axes)
            elif isinstance(sgrid, HEALPixGrid):
                from ..ops.sht import get_healpix_synthesis

                trafo = get_healpix_synthesis(
                    nside=sgrid.nside,
                    axis=n - 1,
                    lmax=sgrid.harmonic_grid.lmax,
                    mmax=sgrid.harmonic_grid.mmax,
                )
            else:
                raise TypeError(f"unknown grid {sgrid!r}")
            harmonic_transforms.append((harmonic_dvol, trafo))

        xi_key = self._prefix + "xi"
        self._parameter_tree[xi_key] = ShapeWithDtype(excitation_shape)

        # int32 index tables: half the HBM of numpy's default int64, and
        # amplitude arrays are far below 2³¹ entries
        distributors = tuple(
            jnp.asarray(
                np.asarray(g.harmonic_grid.power_distributor, dtype=np.int32)
            )
            for g in self._target_grids
        )

        init = {
            k: partial(random_like, primals=v)
            for k, v in self._parameter_tree.items()
        }
        cf = CorrelatedField(
            amplitudes=tuple(self._fluctuations),
            distributors=distributors,
            azm=self.azm,
            offset_mean=self._offset_mean,
            xi_key=xi_key,
            harmonic_transforms=harmonic_transforms,
            domain=dict(self._parameter_tree),
            init=init,
        )
        cf.normalized_amplitudes = self.get_normalized_amplitudes()
        cf.target_grids = tuple(self._target_grids)
        return cf


def density_estimator(
    shape,
    *,
    distances=None,
    pad: float = 1.0,
    cf_fluctuations=None,
    azm_uniform=(1e-4, 1.0),
    prefix: str = "",
):
    """Exponentiated Matérn correlated field on a padded grid — the
    standard non-parametric density-estimation prior (reference:
    ``nifty/cl/sugar.py:230``).

    Returns ``(model, padded_shape)``; evaluate the model and slice
    ``[tuple(slice(0, s) for s in shape)]`` for the unpadded density.
    """
    from ..num.stats_distributions import uniform_prior

    shape = (shape,) if isinstance(shape, int) else tuple(shape)
    distances = (
        tuple(1.0 / s for s in shape) if distances is None else distances
    )
    distances = tuple(np.broadcast_to(distances, (len(shape),)))
    if cf_fluctuations is None:
        cf_fluctuations = dict(
            scale=(0.5, 0.3), cutoff=(4.0, 3.0), loglogslope=(-6.0, 3.0)
        )
    pshape = tuple(int(np.ceil((1.0 + pad) * s)) for s in shape)

    cfm = CorrelatedFieldMaker(prefix)
    cfm.add_fluctuations_matern(
        pshape,
        distances=distances,
        renormalize_amplitude=False,
        **cf_fluctuations,
    )
    # uniform zero-mode prior: the scale is inferred purely from the data
    cfm.set_amplitude_total_offset(
        offset_mean=0.0, offset_std=uniform_prior(*azm_uniform)
    )
    cf = cfm.finalize()

    def density(x):
        return jnp.exp(cf(x))

    model = Model(density, domain=cf.domain, init=cf.init)
    model.correlated_field = cf
    return model, pshape
