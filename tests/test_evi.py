"""Statistical EVI tests: for a linear-Gaussian model, MGVI samples must
reproduce the analytic posterior covariance (the reference's strategy in
``test/test_re/test_evi.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import random

import nifty_tpu as nt


def _linear_gaussian_setup(n=6, m=8, seed=0):
    rng = np.random.default_rng(seed)
    R = rng.normal(size=(m, n))
    noise_cov = np.diag(rng.uniform(0.5, 2.0, size=m))
    noise_cov_inv = np.linalg.inv(noise_cov)
    data = rng.normal(size=m)
    fwd = nt.Model(
        lambda x: jnp.asarray(R) @ x["xi"],
        domain={"xi": nt.ShapeWithDtype((n,))},
        white_init=True,
    )
    lh = nt.Gaussian(
        jnp.asarray(data), noise_cov_inv=lambda x: jnp.asarray(noise_cov_inv) @ x
    ).amend(fwd)
    # analytic posterior covariance of xi: (R^T N^-1 R + 1)^-1
    post_cov = np.linalg.inv(R.T @ noise_cov_inv @ R + np.eye(n))
    return lh, post_cov


def test_mgvi_samples_match_analytic_covariance():
    lh, post_cov = _linear_gaussian_setup()
    pos = nt.Vector({"xi": jnp.zeros(post_cov.shape[0])})
    n_samples = 1500
    keys = random.split(random.PRNGKey(42), n_samples)
    draw = jax.jit(
        jax.vmap(
            lambda k: nt.draw_linear_residual(
                lh, pos, k, cg_kwargs=dict(resnorm=1e-12, maxiter=200)
            )[0]["xi"],
        )
    )
    smpls = np.asarray(draw(keys))
    emp_cov = np.cov(smpls.T)
    # MC error ~ 1/sqrt(n_samples)
    np.testing.assert_allclose(emp_cov, post_cov, atol=0.12, rtol=0.35)


def test_wiener_filter_matches_analytic_mean():
    lh, post_cov = _linear_gaussian_setup()
    samples, (info, _) = nt.wiener_filter_posterior(
        lh, key=random.PRNGKey(0), n_samples=2,
        draw_linear_kwargs=dict(cg_kwargs=dict(resnorm=1e-12, maxiter=200)),
    )
    # analytic posterior mean: post_cov @ R^T N^-1 d
    # recompute pieces from the likelihood internals
    R = np.asarray(jax.jacfwd(lambda x: lh.forward({"xi": x}))(jnp.zeros(post_cov.shape[0])))
    d = np.asarray(lh.likelihood.data)
    ncovinv = np.asarray(jax.jacfwd(lh.likelihood.noise_cov_inv)(jnp.zeros(len(d))))
    mean_analytic = post_cov @ R.T @ ncovinv @ d
    np.testing.assert_allclose(samples.pos["xi"], mean_analytic, rtol=1e-6, atol=1e-8)
    assert len(samples) == 4  # mirrored pairs


def test_samples_container():
    pos = {"a": jnp.zeros(3)}
    resid = {"a": jnp.stack([jnp.ones(3), -jnp.ones(3)])}
    s = nt.Samples(pos=pos, samples=resid)
    assert len(s) == 2
    np.testing.assert_allclose(s[0]["a"], 1.0)
    np.testing.assert_allclose(s[1]["a"], -1.0)
    s2 = s.at({"a": jnp.ones(3)})
    np.testing.assert_allclose(s2[1]["a"], 0.0)
    # mean of samples == pos for mirrored residuals
    m = nt.mean(s.samples)
    np.testing.assert_allclose(m["a"], 0.0)


def test_nonlinear_update_reduces_to_linear_for_gaussian():
    # for a linear model, the geoVI update must (nearly) preserve the
    # linear sample: the transformation is affine
    lh, _ = _linear_gaussian_setup()
    pos = nt.Vector({"xi": jnp.zeros(6)})
    key = random.PRNGKey(3)
    resid, _ = nt.draw_linear_residual(
        lh, pos, key, cg_kwargs=dict(resnorm=1e-12, maxiter=300)
    )
    curved, opt_state = nt.nonlinearly_update_residual(
        lh,
        pos,
        resid,
        metric_sample_key=key,
        metric_sample_sign=1.0,
        minimize_kwargs=dict(maxiter=5, xtol=1e-10),
    )
    np.testing.assert_allclose(
        curved["xi"], resid["xi"], rtol=1e-4, atol=1e-5
    )
