"""Lanczos log-det + ELBO tests against dense linear-algebra ground truth."""

import jax
import numpy as np
import pytest
from jax import numpy as jnp
from jax import random

import nifty_tpu as nt
from nifty_tpu.evidence_lower_bound import estimate_evidence_lower_bound
from nifty_tpu.num.lanczos import lanczos_tridiag, stochastic_lq_logdet


def _rand_spd(key, n, cond=30.0):
    q, _ = jnp.linalg.qr(random.normal(key, (n, n)))
    lam = jnp.logspace(0, np.log10(cond), n)
    return q @ jnp.diag(lam) @ q.T


def test_lanczos_tridiag_recovers_spectrum():
    n, order = 40, 40
    m = _rand_spd(random.PRNGKey(0), n)
    v0 = random.normal(random.PRNGKey(1), (n,))
    td, vecs = lanczos_tridiag(lambda x: m @ x, v0, order=order)
    # full-order Lanczos with full reorthogonalization reproduces the spectrum
    ev_ref = np.sort(np.linalg.eigvalsh(np.asarray(m)))
    ev_lcz = np.sort(np.linalg.eigvalsh(np.asarray(td)))
    np.testing.assert_allclose(ev_lcz, ev_ref, rtol=1e-8)
    # basis orthonormality
    g = np.asarray(vecs @ vecs.T)
    np.testing.assert_allclose(g, np.eye(order), atol=1e-8)


def test_stochastic_lq_logdet():
    n = 60
    m = _rand_spd(random.PRNGKey(2), n, cond=10.0)
    ld_ref = float(np.linalg.slogdet(np.asarray(m))[1])
    ld = float(
        stochastic_lq_logdet(m, order=25, n_samples=30, key=random.PRNGKey(3))
    )
    assert abs(ld - ld_ref) / abs(ld_ref) < 0.1


@pytest.mark.parametrize("n_dat,n_par", [(10, 25), (25, 10)])
def test_elbo_linear_gaussian(n_dat, n_par):
    """For data d = A ξ + n, n ~ N(0, N): the ELBO of the exact Gaussian
    posterior equals the log evidence."""
    key = random.PRNGKey(42)
    k_a, k_xi, k_n, k_s = random.split(key, 4)
    a = random.normal(k_a, (n_dat, n_par)) / jnp.sqrt(n_par)
    noise_std = 0.3
    xi_true = random.normal(k_xi, (n_par,))
    data = a @ xi_true + noise_std * random.normal(k_n, (n_dat,))

    lh = nt.Gaussian(data, noise_cov_inv=lambda x: x / noise_std**2).amend(
        lambda x: a @ x, domain=jnp.zeros((n_par,))
    )

    # exact posterior: cov = M^-1, mean = cov @ A^T N^-1 d
    m_mat = np.asarray(a.T @ a / noise_std**2 + jnp.eye(n_par))
    cov = np.linalg.inv(m_mat)
    mean = cov @ np.asarray(a.T @ data / noise_std**2)

    # posterior samples from the exact posterior
    n_smpl = 3000
    chol = np.linalg.cholesky(cov)
    smpls = (chol @ np.asarray(random.normal(k_s, (n_par, n_smpl)))).T
    samples = nt.Samples(pos=jnp.asarray(mean), samples=jnp.asarray(smpls))

    elbo_samples, stats = estimate_evidence_lower_bound(
        lh, samples, min(n_dat, n_par), min_lh_eval=1e-10, verbose=False
    )

    # analytic log evidence of the linear model
    d = np.asarray(data)
    s_d = np.asarray(a @ a.T) + noise_std**2 * np.eye(n_dat)
    log_ev = -0.5 * (
        d @ np.linalg.solve(s_d, d)
        + np.linalg.slogdet(s_d)[1]
        + n_dat * np.log(2 * np.pi)
    )
    # our Gaussian energy drops the -n/2 log(2π) and the log|N^-1| norm
    # constants; add them back for the comparison
    log_norm = -0.5 * (
        n_dat * np.log(2 * np.pi) + n_dat * np.log(noise_std**2)
    )
    elbo_mean = stats["elbo_mean"] + log_norm
    assert abs(elbo_mean - log_ev) < 0.1 * abs(log_ev) + 0.5


def test_elbo_eigenvalues_match_dense():
    n_dat, n_par = 12, 30
    key = random.PRNGKey(5)
    a = random.normal(key, (n_dat, n_par)) / jnp.sqrt(n_par)
    lh = nt.Gaussian(jnp.zeros((n_dat,))).amend(
        lambda x: a @ x, domain=jnp.zeros((n_par,))
    )
    samples = nt.Samples(
        pos=jnp.zeros((n_par,)), samples=jnp.zeros((2, n_par))
    )
    from nifty_tpu.evidence_lower_bound import _eigsh_lanczos, _ravel_metric
    from nifty_tpu.likelihood import StandardHamiltonian

    ham = StandardHamiltonian(lh)
    met, size, dtype = _ravel_metric(ham.metric, samples.pos)
    evals, evecs = _eigsh_lanczos(
        met, size, dtype, n_dat, tot_dofs=n_dat, key=random.PRNGKey(6),
        min_lh_eval=1e-12, n_batches=4, verbose=False, early_stop=False,
    )
    m_mat = np.asarray(a.T @ a) + np.eye(n_par)
    ev_ref = np.sort(np.linalg.eigvalsh(m_mat))[::-1][:n_dat]
    np.testing.assert_allclose(np.sort(evals), np.sort(ev_ref), rtol=1e-6)
