"""Standard likelihoods (energy + metric square roots).

All operations are written as `tree_map`s over arbitrary data pytrees, so
a likelihood works the same for a single array, a dict of arrays from
multiple instruments, or a :class:`~nifty_tpu.utils.tree.Vector`.

Behavioral parity with ``nifty/re/likelihood_impl.py``; independent
implementation.
"""

from __future__ import annotations

import dataclasses
import operator
from functools import partial
from typing import Any, Callable, Optional

import jax
from jax import numpy as jnp
from jax.tree_util import Partial, tree_map, tree_reduce

from .likelihood import Likelihood
from .model import LazyModel
from .utils.tree import ShapeWithDtype, result_type, vdot

__all__ = [
    "Bernoulli",
    "Categorical",
    "Gaussian",
    "InverseGamma",
    "NDVariableCovarianceGaussian",
    "Poissonian",
    "StudentT",
    "VariableCovarianceGaussian",
    "VariableCovarianceStudentT",
]


def _tsum(tree):
    return tree_reduce(operator.add, tree_map(jnp.sum, tree), 0.0)


def _sub(a, b):
    return tree_map(jnp.subtract, a, b)


def _mul(a, b):
    return tree_map(jnp.multiply, a, b)


def _div(a, b):
    return tree_map(jnp.divide, a, b)


def _swd_with_dtype(dtype):
    return lambda e: ShapeWithDtype(jnp.shape(e), dtype)


def _standard_t(nwr, dof):
    def log1p_term(r, d):
        return jnp.sum((d + 1.0) * jnp.log1p((jnp.conj(r) * r).real / d))

    dof_tree = dof if jax.tree_util.tree_structure(dof) == jax.tree_util.tree_structure(nwr) else tree_map(lambda r: dof, nwr)
    return 0.5 * tree_reduce(operator.add, tree_map(log1p_term, nwr, dof_tree), 0.0)


@Partial
def _identity(x):
    return x


def _parse_cov_pair(cov_inv: Optional[Callable], std_inv: Optional[Callable], data):
    """Normalize the (inverse covariance, inverse std) pair to callables.

    Non-callables are interpreted as diagonal weights; a missing member of
    the pair is derived from the other assuming a diagonal covariance
    (reference: ``nifty/re/likelihood_impl.py:35-80``).
    """
    if cov_inv is None and std_inv is None:
        return _identity, _identity

    ones = tree_map(lambda x: jnp.ones_like(jnp.real(x)), data)

    if cov_inv is not None and not callable(cov_inv):
        cov_inv = Partial(partial(_mul), cov_inv)
    if std_inv is not None and not callable(std_inv):
        std_inv = Partial(partial(_mul), std_inv)

    if cov_inv is None:
        w = tree_map(jnp.square, std_inv(ones))
        cov_inv = Partial(partial(_mul), w)
    elif not isinstance(cov_inv, (Partial, LazyModel)):
        cov_inv = Partial(cov_inv)
    if std_inv is None:
        w = tree_map(jnp.sqrt, cov_inv(ones))
        std_inv = Partial(partial(_mul), w)
    elif not isinstance(std_inv, (Partial, LazyModel)):
        std_inv = Partial(std_inv)
    return cov_inv, std_inv


class Gaussian(Likelihood):
    """Gaussian likelihood with fixed noise covariance.

    E(f) = ½ (d-f)ᵀ N⁻¹ (d-f);  transformation(f) = N^{-1/2} f
    (reference: ``nifty/re/likelihood_impl.py:83``).
    """

    data: Any = dataclasses.field(metadata=dict(static=False))
    noise_cov_inv: Callable = dataclasses.field(metadata=dict(static=False))
    noise_std_inv: Callable = dataclasses.field(metadata=dict(static=False))

    def __init__(
        self,
        data,
        noise_cov_inv: Optional[Callable] = None,
        noise_std_inv: Optional[Callable] = None,
    ):
        self.data = data
        self.noise_cov_inv, self.noise_std_inv = _parse_cov_pair(
            noise_cov_inv, noise_std_inv, data
        )
        shp = tree_map(ShapeWithDtype.from_leave, data)
        super().__init__(domain=shp, lsm_tangents_shape=shp)

    def energy(self, primals):
        res = _sub(self.data, primals)
        return 0.5 * jnp.real(vdot(res, self.noise_cov_inv(res)))

    def normalized_residual(self, primals):
        return self.noise_std_inv(_sub(self.data, primals))

    def metric(self, primals, tangents):
        return self.noise_cov_inv(tangents)

    def left_sqrt_metric(self, primals, tangents):
        return self.noise_std_inv(tangents)

    def right_sqrt_metric(self, primals, tangents):
        return self.noise_std_inv(tangents)

    def transformation(self, primals):
        return self.noise_std_inv(primals)


class StudentT(Likelihood):
    """Student's t likelihood with fixed scale and dof
    (reference: ``nifty/re/likelihood_impl.py:141``)."""

    data: Any = dataclasses.field(metadata=dict(static=False))
    dof: Any = dataclasses.field(metadata=dict(static=False))
    noise_cov_inv: Callable = dataclasses.field(metadata=dict(static=False))
    noise_std_inv: Callable = dataclasses.field(metadata=dict(static=False))

    def __init__(
        self,
        data,
        dof,
        noise_cov_inv: Optional[Callable] = None,
        noise_std_inv: Optional[Callable] = None,
    ):
        self.data = data
        self.dof = dof
        self.noise_cov_inv, self.noise_std_inv = _parse_cov_pair(
            noise_cov_inv, noise_std_inv, data
        )
        shp = tree_map(ShapeWithDtype.from_leave, data)
        super().__init__(domain=shp, lsm_tangents_shape=shp)

    def _fct(self):
        return tree_map(lambda d: (d + 1.0) / (d + 3.0), self.dof)

    def energy(self, primals):
        return _standard_t(self.noise_std_inv(_sub(self.data, primals)), self.dof)

    def metric(self, primals, tangents):
        f = self._fct()
        return self.noise_cov_inv(tree_map(lambda fe, t: fe * t, f, tangents))

    def left_sqrt_metric(self, primals, tangents):
        f = self._fct()
        return self.noise_std_inv(tree_map(lambda fe, t: jnp.sqrt(fe) * t, f, tangents))

    def right_sqrt_metric(self, primals, tangents):
        return self.left_sqrt_metric(primals, tangents)

    def normalized_residual(self, primals):
        return self.left_sqrt_metric(None, _sub(self.data, primals))

    def transformation(self, primals):
        f = self._fct()
        return self.noise_std_inv(tree_map(lambda fe, p: jnp.sqrt(fe) * p, f, primals))


class Poissonian(Likelihood):
    """Poisson count likelihood: E(λ) = Σλ - dᵀ log λ, with geometric
    transformation 2√λ (reference: ``nifty/re/likelihood_impl.py:203``)."""

    data: Any = dataclasses.field(metadata=dict(static=False))

    def __init__(self, data, sampling_dtype=float):
        if not jnp.issubdtype(result_type(data), jnp.integer):
            raise TypeError("Poisson `data` must have integer dtype")
        self.data = data
        shp = tree_map(_swd_with_dtype(sampling_dtype), data)
        super().__init__(domain=shp, lsm_tangents_shape=shp)

    def energy(self, primals):
        return _tsum(primals) - vdot(tree_map(jnp.log, primals), self.data)

    def metric(self, primals, tangents):
        return _div(tangents, primals)

    def left_sqrt_metric(self, primals, tangents):
        return tree_map(lambda t, p: t / jnp.sqrt(p), tangents, primals)

    def right_sqrt_metric(self, primals, tangents):
        return self.left_sqrt_metric(primals, tangents)

    def normalized_residual(self, primals):
        return self.left_sqrt_metric(primals, _sub(self.data, primals))

    def transformation(self, primals):
        return tree_map(lambda p: 2.0 * jnp.sqrt(p), primals)


class Bernoulli(Likelihood):
    """Bernoulli likelihood for binary data over event probabilities.

    E(p) = -Σ [d log p + (1-d) log(1-p)]; metric = 1/(p(1-p))
    (reference: ``nifty/cl/operators/energy_operators.py:749``, re-derived
    for the functional interface).
    """

    data: Any = dataclasses.field(metadata=dict(static=False))

    def __init__(self, data, sampling_dtype=float):
        self.data = data
        shp = tree_map(_swd_with_dtype(sampling_dtype), data)
        super().__init__(domain=shp, lsm_tangents_shape=shp)

    def energy(self, primals):
        def e(p, d):
            return -jnp.sum(d * jnp.log(p) + (1.0 - d) * jnp.log1p(-p))

        return tree_reduce(operator.add, tree_map(e, primals, self.data), 0.0)

    def metric(self, primals, tangents):
        return tree_map(lambda p, t: t / (p * (1.0 - p)), primals, tangents)

    def left_sqrt_metric(self, primals, tangents):
        return tree_map(lambda p, t: t / jnp.sqrt(p * (1.0 - p)), primals, tangents)

    def right_sqrt_metric(self, primals, tangents):
        return self.left_sqrt_metric(primals, tangents)

    def normalized_residual(self, primals):
        return self.left_sqrt_metric(primals, _sub(self.data, primals))

    def transformation(self, primals):
        # d/dp arcsin(2p-1) = 1/sqrt(p(1-p)) — the geodesic coordinate
        return tree_map(lambda p: 2.0 * jnp.arcsin(jnp.sqrt(p)), primals)


class VariableCovarianceGaussian(Likelihood):
    """Gaussian likelihood acting on (mean, std_inv) tuples
    (reference: ``nifty/re/likelihood_impl.py:254``)."""

    data: Any = dataclasses.field(metadata=dict(static=False))

    def __init__(self, data):
        self.data = data
        self.iscomplex = tree_map(
            lambda x: bool(jnp.issubdtype(jnp.asarray(x).dtype, jnp.complexfloating)),
            data,
        )
        data_real = tree_map(jnp.real, data)
        shp = tree_map(ShapeWithDtype.from_leave, (data, data_real))
        super().__init__(domain=shp, lsm_tangents_shape=shp)

    def energy(self, primals):
        mean, std_inv = primals
        res = _mul(_sub(self.data, mean), std_inv)
        logdet = tree_map(
            lambda c, s: (1 + c) * jnp.sum(jnp.log(s)), self.iscomplex, std_inv
        )
        return 0.5 * jnp.real(vdot(res, res)) - tree_reduce(operator.add, logdet, 0.0)

    def metric(self, primals, tangents):
        _, std_inv = primals
        t_mean, t_std_inv = tangents
        si_sq = tree_map(jnp.square, std_inv)
        res = (
            _mul(si_sq, t_mean),
            tree_map(
                lambda c, t, s2: 2.0 * (1 + c) * t / s2, self.iscomplex, t_std_inv, si_sq
            ),
        )
        return type(primals)(res)

    def left_sqrt_metric(self, primals, tangents):
        _, std_inv = primals
        t_mean, t_std_inv = tangents
        res = (
            _mul(std_inv, t_mean),
            tree_map(
                lambda c, t, s: jnp.sqrt(2.0) ** (1 + c) * t / s,
                self.iscomplex,
                t_std_inv,
                std_inv,
            ),
        )
        return type(primals)(res)

    def transformation(self, primals):
        """Local approximation — no global Euclidean transformation exists."""
        mean, std_inv = primals
        res = (
            _mul(std_inv, _sub(mean, self.data)),
            tree_map(lambda c, s: (1 + c) * jnp.log(s), self.iscomplex, std_inv),
        )
        return type(primals)(res)

    def normalized_residual(self, primals):
        mean, std_inv = primals
        return _mul(_sub(self.data, mean), std_inv)


class VariableCovarianceStudentT(Likelihood):
    """Student's t likelihood acting on (mean, std) tuples
    (reference: ``nifty/re/likelihood_impl.py:318``)."""

    data: Any = dataclasses.field(metadata=dict(static=False))
    dof: Any = dataclasses.field(metadata=dict(static=False))

    def __init__(self, data, dof):
        self.data = data
        self.dof = dof
        shp = tree_map(ShapeWithDtype.from_leave, (data, data))
        super().__init__(domain=shp, lsm_tangents_shape=shp)

    def energy(self, primals):
        mean, std = primals
        t = _standard_t(_div(_sub(self.data, mean), std), self.dof)
        return t + tree_reduce(
            operator.add, tree_map(lambda s: jnp.sum(jnp.log(s)), std), 0.0
        )

    def metric(self, primals, tangents):
        _, std = primals
        t_mean, t_std = tangents
        d = self.dof
        res = (
            tree_map(lambda t, s: t * (d + 1.0) / (d + 3.0) / s**2, t_mean, std),
            tree_map(lambda t, s: t * 2.0 * d / (d + 3.0) / s**2, t_std, std),
        )
        return type(primals)(res)

    def left_sqrt_metric(self, primals, tangents):
        _, std = primals
        t_mean, t_std = tangents
        d = self.dof
        res = (
            tree_map(lambda t, s: jnp.sqrt((d + 1.0) / (d + 3.0)) / s * t, t_mean, std),
            tree_map(lambda t, s: jnp.sqrt(2.0 * d / (d + 3.0)) / s * t, t_std, std),
        )
        return type(primals)(res)

    def right_sqrt_metric(self, primals, tangents):
        return self.left_sqrt_metric(primals, tangents)

    def normalized_residual(self, primals):
        mean, std = primals
        d = self.dof
        return tree_map(
            lambda x, m, s: (x - m) / s * jnp.sqrt((d + 1.0) / (d + 3.0)),
            self.data,
            mean,
            std,
        )


class Categorical(Likelihood):
    """Categorical (cross-entropy) likelihood over logits
    (reference: ``nifty/re/likelihood_impl.py:483``)."""

    data: Any = dataclasses.field(metadata=dict(static=False))
    axis: int = -1

    def __init__(self, data, axis=-1, sampling_dtype=float):
        self.data = data
        self.axis = axis
        shp = tree_map(_swd_with_dtype(sampling_dtype), data)
        super().__init__(domain=shp, lsm_tangents_shape=shp)

    def energy(self, primals):
        def e(p, d):
            logits = jax.nn.log_softmax(p, axis=self.axis)
            return -jnp.sum(jnp.take_along_axis(logits, d, self.axis))

        return tree_reduce(operator.add, tree_map(e, primals, self.data), 0.0)

    def metric(self, primals, tangents):
        def m(p, t):
            pr = jax.nn.softmax(p, axis=self.axis)
            norm = jnp.sum(pr * t, axis=self.axis, keepdims=True)
            return pr * t - pr * norm

        return tree_map(m, primals, tangents)

    def left_sqrt_metric(self, primals, tangents):
        def lsm(p, t):
            sq = jnp.sqrt(jax.nn.softmax(p, axis=self.axis))
            norm = jnp.sum(sq * t, axis=self.axis, keepdims=True)
            return sq * (t - sq * norm)

        return tree_map(lsm, primals, tangents)

    def right_sqrt_metric(self, primals, tangents):
        return self.left_sqrt_metric(primals, tangents)


class NDVariableCovarianceGaussian(Likelihood):
    """Multivariate Gaussian likelihood with a learnable full covariance
    (or precision) matrix per pixel.

    Acts on ``(mean, mat)`` tuples: every `mean` leaf has shape
    ``(..., d)`` and the matching `mat` leaf ``(..., d, d)``, a symmetric
    positive-definite covariance (``covariance=True``) or precision
    matrix.  All matrix functions route through the spectral machinery of
    :mod:`nifty_tpu.utils.tree_linalg` (stable Daleckii–Krein JVPs).
    Behavioral parity with ``nifty/re/likelihood_impl.py:376``;
    independent implementation.
    """

    data: Any = dataclasses.field(metadata=dict(static=False))

    def __init__(self, data, covariance: bool = True):
        from .utils.tree_linalg import sym_solve, sym_sqrtm  # noqa: F401

        self.data = data
        self.covariance = bool(covariance)
        d = jax.tree_util.tree_leaves(data)[0].shape[-1]
        shp = (
            tree_map(
                lambda x: ShapeWithDtype(x.shape[:-1] + (d,), x.dtype), data
            ),
            tree_map(
                lambda x: ShapeWithDtype(x.shape[:-1] + (d, d), x.dtype), data
            ),
        )
        super().__init__(domain=shp, lsm_tangents_shape=shp)

    def _logdet_sum(self, mat):
        return tree_reduce(
            operator.add,
            tree_map(lambda m: jnp.sum(jnp.linalg.slogdet(m)[1]), mat),
            0.0,
        )

    def energy(self, primals):
        from .utils.tree_linalg import sym_solve

        mean, mat = primals
        rsdl = _sub(self.data, mean)
        if self.covariance:
            white = sym_solve(mat, rsdl)
            quad = 0.5 * jnp.real(vdot(rsdl, white))
            return quad + 0.5 * self._logdet_sum(mat)
        white = tree_map(
            lambda m, r: jnp.einsum("...ij,...j->...i", m, r), mat, rsdl
        )
        quad = 0.5 * jnp.real(vdot(rsdl, white))
        return quad - 0.5 * self._logdet_sum(mat)

    def metric(self, primals, tangents):
        from .utils.tree_linalg import sym_solve

        _, mat = primals
        t_mean, t_mat = tangents
        if self.covariance:
            res_mean = sym_solve(mat, t_mean)
        else:
            res_mean = tree_map(
                lambda m, t: jnp.einsum("...ij,...j->...i", m, t), mat, t_mean
            )
        res_mat = sym_solve(mat, t_mat, matrix_eqn=True)
        res_mat = sym_solve(mat, res_mat, matrix_eqn=True, transposed=True)
        return type(primals)((res_mean, tree_map(lambda x: 0.5 * x, res_mat)))

    def left_sqrt_metric(self, primals, tangents):
        from .utils.tree_linalg import sym_solve, sym_sqrtm

        _, mat = primals
        t_mean, t_mat = tangents
        sq = sym_sqrtm(mat)
        if self.covariance:
            res_mean = sym_solve(sq, t_mean)
        else:
            res_mean = tree_map(
                lambda m, t: jnp.einsum("...ij,...j->...i", m, t), sq, t_mean
            )
        res_mat = sym_solve(sq, t_mat, matrix_eqn=True)
        res_mat = sym_solve(sq, res_mat, matrix_eqn=True, transposed=True)
        return type(primals)(
            (res_mean, tree_map(lambda x: x / jnp.sqrt(2.0), res_mat))
        )

    def transformation(self, primals):
        """Local approximation — no global Euclidean transformation
        exists for a varying covariance."""
        from .utils.tree_linalg import sym_logm, sym_solve, sym_sqrtm

        mean, mat = primals
        rsdl = _sub(mean, self.data)
        if self.covariance:
            res_mean = sym_solve(sym_sqrtm(mat), rsdl)
        else:
            res_mean = tree_map(
                lambda m, r: jnp.einsum("...ij,...j->...i", m, r),
                sym_sqrtm(mat),
                rsdl,
            )
        res_mat = tree_map(lambda x: 0.5 * x, sym_logm(mat))
        return type(primals)((res_mean, res_mat))

    def normalized_residual(self, primals):
        from .utils.tree_linalg import sym_solve, sym_sqrtm

        mean, mat = primals
        rsdl = _sub(mean, self.data)
        if self.covariance:
            return sym_solve(sym_sqrtm(mat), rsdl)
        return tree_map(
            lambda m, r: jnp.einsum("...ij,...j->...i", m, r),
            sym_sqrtm(mat),
            rsdl,
        )


class InverseGamma(Likelihood):
    """Inverse-gamma likelihood of a (variance-like) positive signal:

        -log p(x) = Σ_i (α_i + 1)·ln x_i + β_i / x_i

    — the energy for inferring a covariance ``x = S_k`` from data
    ``β = ½|s_k|²`` (reference:
    ``nifty/cl/operators/energy_operators.py:643`` InverseGammaEnergy).
    The transformation to Euclidean coordinates is
    ``T(x) = √(α+1)·ln x`` (exact, elementwise), from which metric and
    square roots derive: ``metric = diag((α+1)/x²)``.
    """

    beta: Any = dataclasses.field(metadata=dict(static=False))
    alpha: Any = dataclasses.field(metadata=dict(static=False), default=None)

    def __init__(self, beta, alpha=-0.5):
        self.beta = beta
        self.alpha = tree_map(
            lambda b: jnp.broadcast_to(jnp.asarray(alpha, jnp.result_type(b)), jnp.shape(b))
            if jnp.isscalar(alpha) or jnp.ndim(alpha) == 0
            else jnp.asarray(alpha),
            beta,
        )
        shp = tree_map(ShapeWithDtype.from_leave, beta)
        super().__init__(domain=shp, lsm_tangents_shape=shp)

    def energy(self, primals):
        e = tree_map(
            lambda x, a, b: jnp.sum((a + 1.0) * jnp.log(x) + b / x),
            primals,
            self.alpha,
            self.beta,
        )
        return tree_reduce(operator.add, e, 0.0)

    def transformation(self, primals):
        return tree_map(
            lambda x, a: jnp.sqrt(a + 1.0) * jnp.log(x), primals, self.alpha
        )

    def metric(self, primals, tangents):
        return tree_map(
            lambda x, a, t: (a + 1.0) / (x * x) * t,
            primals,
            self.alpha,
            tangents,
        )

    def left_sqrt_metric(self, primals, tangents):
        return tree_map(
            lambda x, a, t: jnp.sqrt(a + 1.0) / x * t,
            primals,
            self.alpha,
            tangents,
        )

    def normalized_residual(self, primals):
        # standardized coordinates: T(x) shifted by the distribution mode
        return tree_map(
            lambda x, a, b: jnp.sqrt(a + 1.0) * (jnp.log(x) - jnp.log(b / (a + 2.0))),
            primals,
            self.alpha,
            self.beta,
        )
