"""HMC/NUTS statistical tests against known distributions."""

import jax
import numpy as np
import pytest
from jax import numpy as jnp
from jax import random

import nifty_tpu as nt
from nifty_tpu.hmc import (
    QP,
    generate_hmc_acc_rej,
    generate_nuts_tree,
    is_euclidean_uturn,
)
from nifty_tpu.hmc_oo import HMCChain, NUTSChain
from nifty_tpu.mcmc import nuts_sample


def test_leapfrog_energy_conservation():
    """Leapfrog on a harmonic oscillator conserves energy to O(eps^2)."""
    from functools import partial

    from nifty_tpu.hmc import leapfrog_step

    pot = lambda q: 0.5 * jnp.sum(q**2)
    ke_grad = lambda inv_m, p: inv_m * p
    stepper = partial(leapfrog_step, jax.grad(pot), ke_grad)
    qp = QP(position=jnp.array([1.0, 0.5]), momentum=jnp.array([0.3, -0.2]))
    inv_m = jnp.ones(2)
    e0 = pot(qp.position) + 0.5 * jnp.sum(qp.momentum**2)
    for _ in range(100):
        qp = stepper(0.05, inv_m, qp)
    e1 = pot(qp.position) + 0.5 * jnp.sum(qp.momentum**2)
    assert abs(float(e1 - e0)) < 1e-3


def test_uturn_criterion():
    # moving apart: no U-turn
    l = QP(position=jnp.array([0.0]), momentum=jnp.array([-1.0]))
    r = QP(position=jnp.array([1.0]), momentum=jnp.array([1.0]))
    assert not bool(is_euclidean_uturn(l, r))
    # moving toward each other: U-turn
    l = QP(position=jnp.array([0.0]), momentum=jnp.array([1.0]))
    r = QP(position=jnp.array([1.0]), momentum=jnp.array([-1.0]))
    assert bool(is_euclidean_uturn(l, r))


def test_nuts_chain_std_normal_moments():
    """NUTS marginals on a 2-D standard normal."""
    pot = lambda q: 0.5 * jnp.sum(q**2)
    chain = NUTSChain(
        potential_energy=pot,
        inverse_mass_matrix=1.0,
        position_proto=jnp.zeros(2),
        step_size=0.7,
        max_tree_depth=8,
    )
    out, _ = jax.jit(
        lambda k, p: chain.generate_n_samples(k, p, 3000)
    )(random.PRNGKey(0), jnp.zeros(2))
    smpl = np.asarray(out.samples)[500:]
    assert out.acceptance > 0.5
    np.testing.assert_allclose(smpl.mean(axis=0), 0.0, atol=0.15)
    np.testing.assert_allclose(smpl.std(axis=0), 1.0, atol=0.15)


def test_nuts_chain_correlated_gaussian():
    cov = jnp.array([[2.0, 1.2], [1.2, 1.0]])
    prec = jnp.linalg.inv(cov)
    pot = lambda q: 0.5 * q @ prec @ q
    chain = NUTSChain(
        potential_energy=pot,
        inverse_mass_matrix=1.0,
        position_proto=jnp.zeros(2),
        step_size=0.3,
        max_tree_depth=10,
    )
    out, _ = jax.jit(
        lambda k, p: chain.generate_n_samples(k, p, 5000)
    )(random.PRNGKey(1), jnp.zeros(2))
    smpl = np.asarray(out.samples)[1000:]
    emp_cov = np.cov(smpl.T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.3)


def test_hmc_chain_std_normal():
    pot = lambda q: 0.5 * jnp.sum(q**2)
    chain = HMCChain(
        potential_energy=pot,
        inverse_mass_matrix=1.0,
        position_proto=jnp.zeros(2),
        num_steps=16,
        step_size=0.25,
    )
    out, _ = jax.jit(
        lambda k, p: chain.generate_n_samples(k, p, 4000)
    )(random.PRNGKey(2), jnp.zeros(2))
    smpl = np.asarray(out.samples)[500:]
    assert float(out.acceptance) > 0.6
    np.testing.assert_allclose(smpl.std(axis=0), 1.0, atol=0.15)


def test_nuts_pytree_position():
    """NUTS over a dict-pytree position."""
    pot = lambda q: 0.5 * (jnp.sum(q["a"] ** 2) + jnp.sum(q["b"] ** 2))
    proto = {"a": jnp.zeros(3), "b": jnp.zeros(())}
    chain = NUTSChain(
        potential_energy=pot,
        inverse_mass_matrix=1.0,
        position_proto=proto,
        step_size=0.5,
    )
    out, _ = chain.generate_n_samples(random.PRNGKey(3), proto, 500)
    assert out.samples["a"].shape == (500, 3)
    sa = np.asarray(out.samples["a"])[100:]
    assert abs(sa.std() - 1.0) < 0.25


def test_adaptive_nuts_sample_banana_free_gaussian():
    """Full adaptive driver on an anisotropic Gaussian: the adapted mass
    matrix should absorb the scale difference."""
    scales = jnp.array([0.1, 1.0, 10.0])
    logd = lambda q: -0.5 * jnp.sum((q / scales) ** 2)
    samples, info = nuts_sample(
        logd,
        random.PRNGKey(4),
        n_chains=2,
        n_samples=1500,
        n_warmup=500,
        position_proto=jnp.zeros(3),
        max_tree_depth=8,
    )
    smpl = np.asarray(samples.samples)
    assert smpl.shape == (2 * 1500, 3)
    np.testing.assert_allclose(
        smpl.std(axis=0), np.asarray(scales), rtol=0.25
    )
    assert np.all(np.asarray(info["acceptance"]) > 0.5)


def test_adaptive_nuts_with_likelihood():
    """nuts_sample accepts a Likelihood and samples the standardized
    posterior of a tiny conjugate model."""
    n_dat, n_par = 8, 4
    a = random.normal(random.PRNGKey(5), (n_dat, n_par)) / jnp.sqrt(n_par)
    noise_std = 0.5
    xi_true = random.normal(random.PRNGKey(6), (n_par,))
    data = a @ xi_true + noise_std * random.normal(random.PRNGKey(7), (n_dat,))
    lh = nt.Gaussian(data, noise_cov_inv=lambda x: x / noise_std**2).amend(
        lambda x: a @ x, domain=jnp.zeros((n_par,))
    )
    samples, info = nuts_sample(
        lh,
        random.PRNGKey(8),
        n_chains=2,
        n_samples=2000,
        n_warmup=400,
        max_tree_depth=8,
    )
    m_mat = np.asarray(a.T @ a / noise_std**2 + jnp.eye(n_par))
    cov = np.linalg.inv(m_mat)
    mean = cov @ np.asarray(a.T @ data / noise_std**2)
    smpl = np.asarray(samples.samples)
    np.testing.assert_allclose(smpl.mean(axis=0), mean, atol=0.15)
    np.testing.assert_allclose(
        smpl.std(axis=0), np.sqrt(np.diag(cov)), rtol=0.25
    )
