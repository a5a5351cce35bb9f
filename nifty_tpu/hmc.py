"""Hamiltonian Monte Carlo and multinomial NUTS, fully jittable.

The NUTS tree is built **iteratively** (Phan & Pradhan,
arXiv:1912.11554): a trajectory of up to ``2^max_tree_depth`` leapfrog
steps needs only a ``max_tree_depth``-deep checkpoint stack for the
U-turn checks, so the whole sampler is a fixed-shape ``lax.while_loop``
program — one XLA compilation, no host round-trips, vmap-able over
chains and shard-able over a device mesh.

Transition weights use the multinomial scheme (Betancourt,
arXiv:1701.02434) with progressive biased doubling.  All position /
momentum containers are arbitrary pytrees.

Behavioral parity with ``nifty/re/hmc.py`` (QP/Tree containers,
leapfrog, accept/reject HMC, iterative NUTS); independent
implementation.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, TypeVar, Union

from jax import lax
from jax import numpy as jnp
from jax import random
from jax import tree_util

from .lax import cond, fori_loop, while_loop
from .utils.tree import random_like, vdot

Q = TypeVar("Q")

__all__ = [
    "QP",
    "Tree",
    "AcceptedAndRejected",
    "flip_momentum",
    "sample_momentum_from_diagonal",
    "leapfrog_step",
    "generate_hmc_acc_rej",
    "generate_nuts_tree",
    "is_euclidean_uturn",
]


def select(pred, on_true, on_false):
    return tree_util.tree_map(partial(lax.select, pred), on_true, on_false)


class QP(NamedTuple):
    """A position/momentum phase-space point (both arbitrary pytrees)."""

    position: Q
    momentum: Q


def flip_momentum(qp: QP) -> QP:
    return QP(
        position=qp.position,
        momentum=tree_util.tree_map(jnp.negative, qp.momentum),
    )


def sample_momentum_from_diagonal(*, key, mass_matrix_sqrt):
    """Draw p ~ N(0, M) for a diagonal mass matrix given √M (a pytree)."""
    noise = random_like(key, mass_matrix_sqrt)
    return tree_util.tree_map(jnp.multiply, mass_matrix_sqrt, noise)


def leapfrog_step(
    potential_energy_gradient: Callable[[Q], Q],
    kinetic_energy_gradient: Callable[[Q, Q], Q],
    step_size: Union[float, jnp.ndarray],
    inverse_mass_matrix,
    qp: QP,
) -> QP:
    """One (velocity-Verlet) leapfrog step; `step_size` carries the
    integration direction via its sign."""
    q, p = qp.position, qp.momentum
    dU = potential_energy_gradient(q)
    p_half = tree_util.tree_map(lambda p_, g: p_ - 0.5 * step_size * g, p, dU)
    dT = kinetic_energy_gradient(inverse_mass_matrix, p_half)
    q_new = tree_util.tree_map(lambda q_, v: q_ + step_size * v, q, dT)
    dU_new = potential_energy_gradient(q_new)
    p_new = tree_util.tree_map(
        lambda p_, g: p_ - 0.5 * step_size * g, p_half, dU_new
    )
    return QP(position=q_new, momentum=p_new)


def total_energy_of_qp(qp, potential_energy, kinetic_energy_w_inv_mass):
    return potential_energy(qp.position) + kinetic_energy_w_inv_mass(qp.momentum)


# --- plain HMC ---------------------------------------------------------------


class AcceptedAndRejected(NamedTuple):
    accepted_qp: QP
    rejected_qp: QP
    accepted: Union[bool, jnp.ndarray]
    diverging: Union[bool, jnp.ndarray]


def generate_hmc_acc_rej(
    *,
    key,
    initial_qp: QP,
    step_size,
    num_steps,
    stepper,
    potential_energy,
    kinetic_energy,
    inverse_mass_matrix,
    max_energy_difference=jnp.inf,
) -> AcceptedAndRejected:
    """Fixed-length leapfrog trajectory with Metropolis accept/reject."""
    ke = partial(kinetic_energy, inverse_mass_matrix)
    energy_start = total_energy_of_qp(initial_qp, potential_energy, ke)

    new_qp = fori_loop(
        0,
        num_steps,
        lambda _, qp: stepper(step_size, inverse_mass_matrix, qp),
        initial_qp,
    )
    # flip momentum to make the proposal an involution
    new_qp = flip_momentum(new_qp)
    energy_end = total_energy_of_qp(new_qp, potential_energy, ke)
    energy_diff = energy_start - energy_end
    diverging = jnp.abs(energy_diff) > max_energy_difference

    acc_prob = jnp.exp(jnp.minimum(0.0, energy_diff))
    accept = random.uniform(key) < acc_prob
    accepted_qp, rejected_qp = select(
        accept, (new_qp, initial_qp), (initial_qp, new_qp)
    )
    return AcceptedAndRejected(
        accepted_qp=accepted_qp,
        rejected_qp=rejected_qp,
        accepted=accept,
        diverging=diverging,
    )


# --- NUTS --------------------------------------------------------------------


class Tree(NamedTuple):
    """A NUTS trajectory fragment.

    ``logweight`` is the logsumexp of the negative total energies of the
    tree's leaves (the multinomial weight); ``proposal_candidate`` is the
    progressively-sampled leaf; ``cumulative_acceptance`` sums the
    per-leaf Metropolis acceptance probabilities (for step-size
    adaptation).
    """

    left: QP
    right: QP
    logweight: Union[float, jnp.ndarray]
    proposal_candidate: QP
    turning: Union[bool, jnp.ndarray]
    diverging: Union[bool, jnp.ndarray]
    depth: Union[int, jnp.ndarray]
    cumulative_acceptance: Union[float, jnp.ndarray]


def is_euclidean_uturn(qp_left: QP, qp_right: QP):
    """Betancourt's Euclidean no-U-turn criterion across two endpoints."""
    dq = tree_util.tree_map(jnp.subtract, qp_right.position, qp_left.position)
    neg_dq = tree_util.tree_map(jnp.negative, dq)
    return (vdot(qp_right.momentum, dq) < 0.0) & (
        vdot(qp_left.momentum, neg_dq) < 0.0
    )


def _stack_proto(proto, size):
    return tree_util.tree_map(
        lambda x: jnp.zeros((size,) + jnp.shape(x), jnp.result_type(x)), proto
    )


def _stack_get(stack, idx):
    return tree_util.tree_map(lambda s: s[idx], stack)


def _stack_set(stack, idx, val):
    return tree_util.tree_map(lambda s, v: s.at[idx].set(v), stack, val)


def count_trailing_ones(n):
    """Number of trailing one-bits of `n` (jittable)."""
    _, c = while_loop(
        lambda s: (s[0] & 1) != 0, lambda s: (s[0] >> 1, s[1] + 1), (n, 0)
    )
    return c


def _leaf_tree(z, neg_energy, initial_neg_energy, max_energy_difference) -> Tree:
    diverging = jnp.abs(neg_energy - initial_neg_energy) > max_energy_difference
    acc = jnp.minimum(1.0, jnp.exp(neg_energy - initial_neg_energy))
    return Tree(
        left=z,
        right=z,
        logweight=neg_energy,
        proposal_candidate=z,
        turning=jnp.asarray(False),
        diverging=diverging,
        depth=jnp.asarray(0),
        cumulative_acceptance=acc,
    )


def _add_leaf_to_tree(
    key,
    tree: Tree,
    z: QP,
    go_right,
    neg_energy_of,
    initial_neg_energy,
    max_energy_difference,
):
    """Multinomial-progressively absorb the single new leaf `z`."""
    neg_e = neg_energy_of(z)
    diverging = jnp.abs(neg_e - initial_neg_energy) > max_energy_difference
    logw_tot = jnp.logaddexp(tree.logweight, neg_e)
    p_new = jnp.exp(neg_e - logw_tot)
    take_new = random.uniform(key) < p_new
    proposal = select(take_new, z, tree.proposal_candidate)
    left = select(go_right, tree.left, z)
    right = select(go_right, z, tree.right)
    acc = tree.cumulative_acceptance + jnp.minimum(
        1.0, jnp.exp(neg_e - initial_neg_energy)
    )
    return Tree(
        left=left,
        right=right,
        logweight=logw_tot,
        proposal_candidate=proposal,
        turning=tree.turning,
        diverging=tree.diverging | diverging,
        depth=tree.depth,
        cumulative_acceptance=acc,
    )


def iterative_build_tree(
    key,
    initial_tree: Tree,
    step_size,
    go_right,
    stepper,
    potential_energy,
    kinetic_energy,
    inverse_mass_matrix,
    max_tree_depth: int,
    initial_neg_energy,
    max_energy_difference,
) -> Tree:
    """Build a new subtree of ``2^initial_tree.depth`` leapfrog states
    adjacent to `initial_tree` in direction `go_right`.

    U-turn checks inside the subtree use the checkpoint scheme of
    arXiv:1912.11554 (alg. 2): even-numbered leaves are pushed onto a
    ``max_tree_depth``-slot stack at slot ``popcount(n)``; odd leaves
    check against the stacked left endpoints of every complete subtree
    they close.
    """
    ke = partial(kinetic_energy, inverse_mass_matrix)
    neg_energy_of = lambda qp: -total_energy_of_qp(qp, potential_energy, ke)  # noqa: E731

    z0 = select(go_right, initial_tree.right, initial_tree.left)
    depth = initial_tree.depth
    max_num_steps = 1 << depth
    signed_eps = jnp.where(go_right, 1.0, -1.0) * step_size

    stack = _stack_proto(z0, max_tree_depth + 1)
    z = stepper(signed_eps, inverse_mass_matrix, z0)
    subtree = _leaf_tree(
        z, neg_energy_of(z), initial_neg_energy, max_energy_difference
    )
    stack = _stack_set(stack, 0, z)

    def body(state):
        n, subtree, z, stack, key = state
        key, k_choose = random.split(key)
        z = stepper(signed_eps, inverse_mass_matrix, z)
        subtree = _add_leaf_to_tree(
            k_choose,
            subtree,
            z,
            go_right,
            neg_energy_of,
            initial_neg_energy,
            max_energy_difference,
        )

        def even_case(stack):
            return _stack_set(stack, lax.population_count(n), z), jnp.asarray(
                False
            )

        def odd_case(stack):
            n_closed = count_trailing_ones(n)
            i_max = lax.population_count(n - 1)
            i_min = i_max - n_closed + 1
            turning = fori_loop(
                i_min,
                i_max + 1,
                lambda k, t: t | is_euclidean_uturn(_stack_get(stack, k), z),
                jnp.asarray(False),
            )
            return stack, turning

        stack, turning = cond(n % 2 == 0, even_case, odd_case, stack)
        subtree = subtree._replace(turning=subtree.turning | turning)
        return n + 1, subtree, z, stack, key

    def cont(state):
        n, subtree, *_ = state
        return (n < max_num_steps) & ~subtree.turning & ~subtree.diverging

    n, subtree, *_ = while_loop(cont, body, (1, subtree, z, stack, key))
    # mark incomplete subtrees (aborted early) with depth -1
    return subtree._replace(
        depth=jnp.where(n == max_num_steps, depth, -1)
    )


def merge_trees(
    key, current_tree: Tree, new_subtree: Tree, go_right, bias_transition
) -> Tree:
    """Merge an adjacent complete subtree into the trajectory, sampling the
    combined proposal progressively (optionally biased toward the new
    subtree, Betancourt's doubling scheme)."""
    logw_tot = jnp.logaddexp(current_tree.logweight, new_subtree.logweight)
    denom = jnp.where(
        bias_transition, current_tree.logweight, logw_tot
    )
    p_new = jnp.minimum(1.0, jnp.exp(new_subtree.logweight - denom))
    take_new = random.uniform(key) < p_new
    proposal = select(
        take_new, new_subtree.proposal_candidate, current_tree.proposal_candidate
    )
    left = select(go_right, current_tree.left, new_subtree.left)
    right = select(go_right, new_subtree.right, current_tree.right)
    turning = is_euclidean_uturn(left, right)
    return Tree(
        left=left,
        right=right,
        logweight=logw_tot,
        proposal_candidate=proposal,
        turning=turning,
        diverging=current_tree.diverging | new_subtree.diverging,
        depth=current_tree.depth + 1,
        cumulative_acceptance=current_tree.cumulative_acceptance
        + new_subtree.cumulative_acceptance,
    )


def generate_nuts_tree(
    initial_qp: QP,
    key,
    step_size,
    max_tree_depth: int,
    stepper,
    potential_energy,
    kinetic_energy,
    inverse_mass_matrix,
    bias_transition: bool = True,
    max_energy_difference=jnp.inf,
) -> Tree:
    """One NUTS transition: repeatedly double the trajectory in a random
    direction until a U-turn / divergence / the depth cap, returning the
    multinomially-sampled proposal and diagnostics."""
    ke = partial(kinetic_energy, inverse_mass_matrix)
    initial_neg_energy = -total_energy_of_qp(initial_qp, potential_energy, ke)

    tree = Tree(
        left=initial_qp,
        right=initial_qp,
        logweight=initial_neg_energy,
        proposal_candidate=initial_qp,
        turning=jnp.asarray(False),
        diverging=jnp.asarray(False),
        depth=jnp.asarray(0),
        cumulative_acceptance=jnp.asarray(0.0),
    )

    def body(state):
        tree, key = state
        key, k_dir, k_sub, k_merge = random.split(key, 4)
        go_right = random.bernoulli(k_dir)
        new_subtree = iterative_build_tree(
            k_sub,
            tree,
            step_size,
            go_right,
            stepper,
            potential_energy,
            kinetic_energy,
            inverse_mass_matrix,
            max_tree_depth,
            initial_neg_energy,
            max_energy_difference,
        )
        complete = new_subtree.depth != -1

        def do_merge(args):
            tree, new_subtree = args
            return merge_trees(
                k_merge, tree, new_subtree, go_right, bias_transition
            )

        def no_merge(args):
            tree, new_subtree = args
            # propagate the stop reason; depth bumps to terminate the loop
            return tree._replace(
                turning=tree.turning | new_subtree.turning,
                diverging=tree.diverging | new_subtree.diverging,
                depth=tree.depth + 1,
                cumulative_acceptance=tree.cumulative_acceptance
                + new_subtree.cumulative_acceptance,
            )

        tree = cond(
            complete & ~new_subtree.turning & ~new_subtree.diverging,
            do_merge,
            no_merge,
            (tree, new_subtree),
        )
        return tree, key

    def loop_cont(state):
        tree, _ = state
        return (tree.depth < max_tree_depth) & ~tree.turning & ~tree.diverging

    tree, _ = while_loop(loop_cont, body, (tree, key))
    return tree
