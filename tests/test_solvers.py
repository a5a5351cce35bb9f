"""CG and Newton-CG solver tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import random

import nifty_tpu as nt
from nifty_tpu.conjugate_gradient import cg, cg_steihaug, static_cg
from nifty_tpu.optimize import minimize, newton_cg, static_newton_cg


def _spd_matvec(n, seed=0, cond=50.0):
    a = np.asarray(random.normal(random.PRNGKey(seed), (n, n)))
    q, _ = np.linalg.qr(a)
    eigs = np.logspace(0, np.log10(cond), n)
    mat = (q * eigs) @ q.T
    return jnp.asarray(mat)


@pytest.mark.parametrize("solver", [cg, static_cg])
def test_cg_solves_spd_system(solver):
    n = 32
    m = _spd_matvec(n)
    x_true = np.asarray(random.normal(random.PRNGKey(1), (n,)))
    j = m @ x_true
    res = solver(lambda x: m @ x, j, resnorm=1e-10, maxiter=500)
    np.testing.assert_allclose(res.x, x_true, rtol=1e-6, atol=1e-8)
    assert bool(res.success)


@pytest.mark.parametrize("solver", [cg, static_cg])
def test_cg_on_pytrees(solver):
    def mat(t):
        return {"a": 2.0 * t["a"], "b": 4.0 * t["b"]}

    j = {"a": jnp.ones(3), "b": jnp.full((2,), 2.0)}
    res = solver(mat, j, resnorm=1e-12, maxiter=100)
    np.testing.assert_allclose(res.x["a"], 0.5, rtol=1e-8)
    np.testing.assert_allclose(res.x["b"], 0.5, rtol=1e-8)


def test_static_cg_matches_cg():
    n = 24
    m = _spd_matvec(n, seed=3)
    j = jnp.asarray(np.asarray(random.normal(random.PRNGKey(2), (n,))))
    r1 = cg(lambda x: m @ x, j, absdelta=1e-14, maxiter=200, _raise_nonposdef=False)
    r2 = static_cg(lambda x: m @ x, j, absdelta=1e-14, maxiter=200)
    np.testing.assert_allclose(r1.x, r2.x, rtol=1e-5, atol=1e-7)


def test_static_cg_jittable():
    m = _spd_matvec(16, seed=4)
    j = jnp.ones(16)

    @jax.jit
    def solve(j):
        return static_cg(lambda x: m @ x, j, resnorm=1e-10, maxiter=100).x

    x = solve(j)
    np.testing.assert_allclose(m @ x, j, rtol=1e-6, atol=1e-7)


def _rosenbrock_like_quartic(x):
    # convex quartic bowl with pytree input
    return jnp.sum((x["a"] - 1.0) ** 2) + jnp.sum((x["b"] + 2.0) ** 4 + (x["b"] + 2.0) ** 2)


@pytest.mark.parametrize("minimizer", [newton_cg, static_newton_cg])
def test_newton_cg_minimizes(minimizer):
    x0 = {"a": jnp.zeros(3), "b": jnp.zeros(2)}

    def hessp(x, t):
        return jax.jvp(jax.grad(_rosenbrock_like_quartic), (x,), (t,))[1]

    res = minimizer(
        _rosenbrock_like_quartic, x0, hessp=hessp, maxiter=50, absdelta=1e-12
    )
    np.testing.assert_allclose(res.x["a"], 1.0, atol=1e-4)
    np.testing.assert_allclose(res.x["b"], -2.0, atol=1e-3)


def test_static_newton_cg_jittable_and_matches():
    x0 = {"a": jnp.zeros(3), "b": jnp.zeros(2)}

    def hessp(x, t):
        return jax.jvp(jax.grad(_rosenbrock_like_quartic), (x,), (t,))[1]

    res_host = newton_cg(
        _rosenbrock_like_quartic, x0, hessp=hessp, maxiter=50, absdelta=1e-12
    )

    @jax.jit
    def run(x0):
        return static_newton_cg(
            _rosenbrock_like_quartic, x0, hessp=hessp, maxiter=50, absdelta=1e-12
        ).x

    res_static = run(x0)
    np.testing.assert_allclose(res_static["a"], res_host.x["a"], atol=1e-4)
    np.testing.assert_allclose(res_static["b"], res_host.x["b"], atol=1e-3)


def test_newton_cg_quadratic_one_step():
    # Newton on a quadratic converges in one iteration
    m = _spd_matvec(8, seed=6, cond=10.0)
    b = jnp.ones(8)

    def f(x):
        return 0.5 * x @ m @ x - b @ x

    def hessp(x, t):
        return m @ t

    res = newton_cg(f, jnp.zeros(8), hessp=hessp, maxiter=10, absdelta=1e-10)
    np.testing.assert_allclose(m @ res.x, b, rtol=1e-4, atol=1e-6)
    # inexact-Newton forcing terms allow a few iterations, but convergence
    # on a quadratic must be fast
    assert int(res.nit) <= 6


def test_cg_steihaug_interior_matches_solve():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(6, 6))
    A = A @ A.T + 6 * np.eye(6)
    b = rng.normal(size=6)
    res = cg_steihaug(
        lambda x: jnp.asarray(A) @ x, jnp.asarray(b), trust_radius=1e3,
        resnorm=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(res.step), -np.linalg.solve(A, b), atol=1e-10
    )
    assert not bool(res.hits_boundary)


def test_cg_steihaug_boundary_and_negative_curvature():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(6, 6))
    A = A @ A.T + 6 * np.eye(6)
    b = rng.normal(size=6)
    res = cg_steihaug(
        lambda x: jnp.asarray(A) @ x, jnp.asarray(b), trust_radius=0.05,
        resnorm=1e-12,
    )
    assert bool(res.hits_boundary)
    np.testing.assert_allclose(float(jnp.linalg.norm(res.step)), 0.05, rtol=1e-10)
    # indefinite curvature walks to the boundary
    res2 = cg_steihaug(
        lambda x: -x, jnp.asarray([1.0, 0.0, 0.0]), trust_radius=2.0
    )
    assert bool(res2.hits_boundary)
    np.testing.assert_allclose(float(jnp.linalg.norm(res2.step)), 2.0, rtol=1e-12)
    # predicted model value at the step: <g,p> + 0.5 <p,Bp>
    np.testing.assert_allclose(float(res2.pred_f), -4.0, atol=1e-12)


def _rosen(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)


def test_trust_ncg_rosenbrock():
    r = minimize(
        _rosen, jnp.zeros(6), method="trust-ncg",
        options=dict(maxiter=500, gtol=1e-8),
    )
    assert int(r.status) == 0
    np.testing.assert_allclose(np.asarray(r.x), 1.0, atol=1e-6)


def test_trust_ncg_quadratic_jitted():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(8, 8))
    A = A @ A.T + 8 * np.eye(8)
    b = rng.normal(size=8)

    def q(x):
        return 0.5 * x @ jnp.asarray(A) @ x - jnp.asarray(b) @ x

    run = jax.jit(
        lambda x0: minimize(
            q, x0, method="trust-ncg", options=dict(maxiter=100, gtol=1e-10)
        ).x
    )
    np.testing.assert_allclose(
        np.asarray(run(jnp.zeros(8))), np.linalg.solve(A, b), atol=1e-8
    )


def test_optax_lbfgs_bridge():
    r = minimize(
        _rosen, jnp.zeros(6), method="l-bfgs",
        options=dict(maxiter=500, xtol=1e-10),
    )
    np.testing.assert_allclose(np.asarray(r.x), 1.0, atol=1e-5)


def test_optax_adam_bridge():
    import optax

    def q(x):
        return jnp.sum((x - 2.0) ** 2)

    r = minimize(
        q, jnp.zeros(4), method="optax",
        options=dict(optimizer=optax.adam(0.2), maxiter=2000, xtol=1e-7),
    )
    np.testing.assert_allclose(np.asarray(r.x), 2.0, atol=1e-3)
