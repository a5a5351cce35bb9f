"""Parametric variational inference: mean-field and full-covariance
Gaussian posteriors ("ADVI").

The JAX-native counterpart of ``nifty/cl/library/variational_models.py``
(``MeanFieldVI:37``, ``FullCovarianceVI:126``): a reparameterized
Gaussian family q, the stochastic negative-ELBO
``E_q[H] − entropy(q)``, and an optax-driven fit loop — the whole
update (sampling, model forward, gradient, optimizer) is one jitted
program.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import numpy as np
from jax import numpy as jnp
from jax import random
from jax.flatten_util import ravel_pytree

from .evi import Samples
from .likelihood import Likelihood, StandardHamiltonian
from .utils.tree import random_like, vdot

__all__ = ["MeanFieldVI", "FullCovarianceVI"]


def _hamiltonian(likelihood_or_ham):
    if isinstance(likelihood_or_ham, Likelihood):
        return StandardHamiltonian(likelihood_or_ham)
    return likelihood_or_ham


class MeanFieldVI:
    """Diagonal-covariance Gaussian q(ξ) = N(μ, diag σ²), optimized by
    stochastic gradient on the reparameterized negative ELBO."""

    def __init__(
        self,
        likelihood,
        position,
        *,
        n_samples: int = 4,
        initial_std: float = 0.1,
    ):
        self.hamiltonian = _hamiltonian(likelihood)
        self.n_samples = int(n_samples)
        flat, self._unravel = ravel_pytree(position)
        self.params = {
            "mean": flat,
            "log_std": jnp.full_like(flat, jnp.log(initial_std)),
        }

    def sample(self, params, key):
        eps = random.normal(key, params["mean"].shape, params["mean"].dtype)
        return self._unravel(
            params["mean"] + jnp.exp(params["log_std"]) * eps
        )

    def entropy(self, params):
        return jnp.sum(params["log_std"])

    def loss(self, params, key):
        keys = random.split(key, self.n_samples)
        ham = jax.vmap(lambda k: self.hamiltonian(self.sample(params, k)))(keys)
        return jnp.mean(ham) - self.entropy(params)

    def fit(self, key, *, n_steps=500, optimizer=None, callback=None):
        import optax

        optimizer = optax.adam(1e-2) if optimizer is None else optimizer
        params = self.params
        opt_state = optimizer.init(params)

        @jax.jit
        def step(params, opt_state, key):
            loss, g = jax.value_and_grad(self.loss)(params, key)
            updates, opt_state = optimizer.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        for i in range(n_steps):
            key, sk = random.split(key)
            params, opt_state, loss = step(params, opt_state, sk)
            if callback is not None:
                callback(i, params, float(loss))
        self.params = params
        return params

    def posterior_samples(self, key, n: int):
        keys = random.split(key, n)
        smpls = jax.vmap(lambda k: self.sample(self.params, k))(keys)
        return Samples(pos=None, samples=smpls)

    @property
    def mean(self):
        return self._unravel(self.params["mean"])

    @property
    def std(self):
        return self._unravel(jnp.exp(self.params["log_std"]))


class FullCovarianceVI:
    """Full-covariance Gaussian q(ξ) = N(μ, LLᵀ) with a learnable
    lower-triangular factor L (log-parametrized diagonal)."""

    def __init__(
        self,
        likelihood,
        position,
        *,
        n_samples: int = 4,
        initial_std: float = 0.1,
    ):
        self.hamiltonian = _hamiltonian(likelihood)
        self.n_samples = int(n_samples)
        flat, self._unravel = ravel_pytree(position)
        n = flat.size
        self._n = n
        self._tril = jnp.asarray(np.tril_indices(n, k=-1))
        self.params = {
            "mean": flat,
            "log_diag": jnp.full((n,), jnp.log(initial_std), flat.dtype),
            "offdiag": jnp.zeros((n * (n - 1) // 2,), flat.dtype),
        }

    def _l_factor(self, params):
        n = self._n
        l_mat = jnp.zeros((n, n), params["mean"].dtype)
        l_mat = l_mat.at[self._tril[0], self._tril[1]].set(params["offdiag"])
        return l_mat + jnp.diag(jnp.exp(params["log_diag"]))

    def sample(self, params, key):
        eps = random.normal(key, params["mean"].shape, params["mean"].dtype)
        return self._unravel(params["mean"] + self._l_factor(params) @ eps)

    def entropy(self, params):
        return jnp.sum(params["log_diag"])

    def loss(self, params, key):
        keys = random.split(key, self.n_samples)
        ham = jax.vmap(lambda k: self.hamiltonian(self.sample(params, k)))(keys)
        return jnp.mean(ham) - self.entropy(params)

    fit = MeanFieldVI.fit

    def posterior_samples(self, key, n: int):
        keys = random.split(key, n)
        smpls = jax.vmap(lambda k: self.sample(self.params, k))(keys)
        return Samples(pos=None, samples=smpls)

    @property
    def mean(self):
        return self._unravel(self.params["mean"])

    def covariance(self):
        l_mat = self._l_factor(self.params)
        return l_mat @ l_mat.T
