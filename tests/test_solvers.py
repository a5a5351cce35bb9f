"""CG and Newton-CG solver tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import random

import nifty_tpu as nt
from nifty_tpu.conjugate_gradient import cg, static_cg
from nifty_tpu.optimize import newton_cg, static_newton_cg


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
