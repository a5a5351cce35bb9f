"""Object-oriented HMC/NUTS chain drivers.

A `Chain` run is one ``lax.scan`` over transitions — a single XLA
program per chain; vmap the ``generate_n_samples`` call for multi-chain
(see :func:`nifty_tpu.mcmc.nuts_sample` for the batteries-included
adaptive driver).

Behavioral parity with ``nifty/re/hmc_oo.py`` (Chain, NUTSChain,
HMCChain); independent implementation.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Tuple, TypeVar, Union

import numpy as np
from jax import grad, lax
from jax import numpy as jnp
from jax import random
from jax import tree_util

from .hmc import (
    QP,
    Tree,
    generate_hmc_acc_rej,
    generate_nuts_tree,
    leapfrog_step,
    sample_momentum_from_diagonal,
)
from .utils.tree import vdot, zeros_like

Q = TypeVar("Q")

__all__ = ["Chain", "NUTSChain", "HMCChain"]


def _parse_diag_mass_matrix(mass_matrix, position_proto: Q) -> Q:
    """Broadcast a scalar / pytree mass matrix onto the position pytree."""
    if isinstance(mass_matrix, (float, int)) or (
        hasattr(mass_matrix, "shape") and jnp.ndim(mass_matrix) == 0
    ):
        return tree_util.tree_map(
            lambda x: jnp.full(jnp.shape(x), mass_matrix, jnp.result_type(x)),
            position_proto,
        )
    # structure must match the position pytree
    if tree_util.tree_structure(mass_matrix) != tree_util.tree_structure(
        position_proto
    ):
        raise TypeError("mass matrix pytree does not match the position pytree")
    return tree_util.tree_map(
        lambda m, x: jnp.broadcast_to(m, jnp.shape(x)), mass_matrix, position_proto
    )


class Chain(NamedTuple):
    """Results of a chain run."""

    samples: Q
    divergences: jnp.ndarray
    acceptance: Union[jnp.ndarray, float]
    depths: jnp.ndarray = None
    trees: Any = None


class _Sampler:
    def __init__(
        self,
        potential_energy: Callable[[Q], Union[float, jnp.ndarray]],
        inverse_mass_matrix,
        position_proto: Q,
        step_size: Union[float, jnp.ndarray] = 1.0,
        max_energy_difference: Union[float, jnp.ndarray] = jnp.inf,
    ):
        if not callable(potential_energy):
            raise TypeError("potential_energy must be callable")
        self.potential_energy = potential_energy
        self.inverse_mass_matrix = _parse_diag_mass_matrix(
            inverse_mass_matrix, position_proto=position_proto
        )
        self.mass_matrix_sqrt = tree_util.tree_map(
            lambda m: m ** (-0.5), self.inverse_mass_matrix
        )
        self.step_size = step_size
        self.max_energy_difference = max_energy_difference

        def kinetic_energy(inverse_mass_matrix, momentum):
            sq = tree_util.tree_map(lambda p: p**2 / 2.0, momentum)
            return vdot(inverse_mass_matrix, sq)

        self.kinetic_energy = kinetic_energy
        kinetic_energy_gradient = lambda inv_m, p: tree_util.tree_map(  # noqa: E731
            jnp.multiply, inv_m, p
        )
        self.stepper = partial(
            leapfrog_step, grad(potential_energy), kinetic_energy_gradient
        )

    def sample_next_state(self, key, prev_position: Q):
        raise NotImplementedError()

    def generate_n_samples(
        self,
        key,
        initial_position: Q,
        num_samples: int,
        *,
        save_intermediates: bool = False,
    ) -> Tuple[Chain, Tuple[Any, Q]]:
        if isinstance(key, int):
            key = random.PRNGKey(key)

        def step(carry, _):
            key, pos = carry
            info, (key, pos) = self.sample_next_state(key, pos)
            out = self._chain_entry(pos, info, save_intermediates)
            return (key, pos), out

        (key, pos), outs = lax.scan(
            step, (key, initial_position), None, length=num_samples
        )
        chain = self._assemble_chain(outs, save_intermediates)
        return chain, (key, pos)


class NUTSChain(_Sampler):
    """No-U-Turn sampler chain (multinomial, iterative tree building)."""

    def __init__(
        self,
        potential_energy,
        inverse_mass_matrix,
        position_proto,
        step_size=1.0,
        max_tree_depth: int = 10,
        bias_transition: bool = True,
        max_energy_difference=jnp.inf,
    ):
        super().__init__(
            potential_energy,
            inverse_mass_matrix,
            position_proto,
            step_size,
            max_energy_difference,
        )
        self.max_tree_depth = int(max_tree_depth)
        self.bias_transition = bias_transition

    def sample_next_state(self, key, prev_position: Q):
        key, k_mom, k_tree = random.split(key, 3)
        momentum = sample_momentum_from_diagonal(
            key=k_mom, mass_matrix_sqrt=self.mass_matrix_sqrt
        )
        qp = QP(position=prev_position, momentum=momentum)
        tree = generate_nuts_tree(
            qp,
            k_tree,
            self.step_size,
            self.max_tree_depth,
            self.stepper,
            self.potential_energy,
            self.kinetic_energy,
            self.inverse_mass_matrix,
            bias_transition=self.bias_transition,
            max_energy_difference=self.max_energy_difference,
        )
        pos = tree.proposal_candidate.position
        return tree, (key, pos)

    def _chain_entry(self, pos, tree: Tree, save_intermediates):
        n_prop = jnp.maximum(1.0, jnp.exp2(tree.depth.astype(jnp.float32)) - 1.0)
        out = dict(
            sample=pos,
            divergence=tree.diverging,
            acceptance=tree.cumulative_acceptance / n_prop,
            depth=tree.depth,
        )
        if save_intermediates:
            out["tree"] = tree
        return out

    def _assemble_chain(self, outs, save_intermediates):
        return Chain(
            samples=outs["sample"],
            divergences=outs["divergence"],
            acceptance=jnp.mean(outs["acceptance"]),
            depths=outs["depth"],
            trees=outs.get("tree"),
        )


class HMCChain(_Sampler):
    """Plain HMC with a fixed number of leapfrog steps and Metropolis
    accept/reject."""

    def __init__(
        self,
        potential_energy,
        inverse_mass_matrix,
        position_proto,
        num_steps: int = 128,
        step_size=1.0,
        max_energy_difference=jnp.inf,
    ):
        super().__init__(
            potential_energy,
            inverse_mass_matrix,
            position_proto,
            step_size,
            max_energy_difference,
        )
        self.num_steps = int(num_steps)

    def sample_next_state(self, key, prev_position: Q):
        key, k_mom, k_acc = random.split(key, 3)
        momentum = sample_momentum_from_diagonal(
            key=k_mom, mass_matrix_sqrt=self.mass_matrix_sqrt
        )
        qp = QP(position=prev_position, momentum=momentum)
        acc_rej = generate_hmc_acc_rej(
            key=k_acc,
            initial_qp=qp,
            step_size=self.step_size,
            num_steps=self.num_steps,
            stepper=self.stepper,
            potential_energy=self.potential_energy,
            kinetic_energy=self.kinetic_energy,
            inverse_mass_matrix=self.inverse_mass_matrix,
            max_energy_difference=self.max_energy_difference,
        )
        pos = acc_rej.accepted_qp.position
        return acc_rej, (key, pos)

    def _chain_entry(self, pos, acc_rej, save_intermediates):
        out = dict(
            sample=pos,
            divergence=acc_rej.diverging,
            acceptance=acc_rej.accepted.astype(jnp.float32),
        )
        if save_intermediates:
            out["tree"] = acc_rej
        return out

    def _assemble_chain(self, outs, save_intermediates):
        return Chain(
            samples=outs["sample"],
            divergences=outs["divergence"],
            acceptance=jnp.mean(outs["acceptance"]),
            depths=None,
            trees=outs.get("tree"),
        )
