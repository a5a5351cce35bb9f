"""Pallas TPU kernels executing an :class:`~nifty_tpu.ops.route.ExpandPlan`.

The forward kernel turns the per-unique-mode table into the packed
expansion (``out[p] = tab[idx[p]]``); the transpose kernel is its exact
adjoint (scatter-add).  Both are straight-line cascades of the TPU vector
core's fast primitives — lane shuffles (``take_along_axis`` along lanes),
(128,128) tile transposes, static tile rotations with masked selects, and
batched one-hot MXU matmuls.  See :mod:`nifty_tpu.ops.route` for the
design and the measured per-primitive costs that motivated it; the numpy
simulator there executes the identical op sequence and is the correctness
oracle (tests/test_pallas_expand.py).

Each direction is split into two ``pallas_call``s so VMEM holds only one
stage's routing tables at a time (the 1.6 MB inter-stage tensor
round-trips through HBM, ~2 µs).
"""

from __future__ import annotations

import jax
import numpy as np
from jax import numpy as jnp

C = 128


def _pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl, pltpu


def _ttr(x, T):
    """Per-tile (128,128) transpose of an (H,128) block."""
    return x.reshape(T, C, C).swapaxes(1, 2).reshape(T * C, C)


def _taa(x, idx):
    return jnp.take_along_axis(x, idx, axis=1)


def _tile_roll(x, delta):
    if delta == 0:
        return x
    k = delta * C
    return jnp.concatenate([x[-k:], x[:-k]], axis=0)


def _bal_ranges(plan):
    """Per source vreg w, the (static) range of dest vregs v with
    bal_base == w — used by the balance adjoint."""
    base = np.asarray(plan.bal_base)
    n_src = plan.U_rows // 8 + 2
    starts = np.searchsorted(base, np.arange(n_src), side="left")
    ends = np.searchsorted(base, np.arange(n_src), side="right")
    return starts, ends, n_src


def _vmem_call(kern, inputs, out_shape, interpret):
    pl, pltpu = _pl()
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*inputs)


def forward_fn(plan, tab_rows, *, interpret=False):
    """tab_rows: ((U_rows + 2) * 8? , 128) zero-padded table rows.
    Returns the (H, 128) network output (garbage in edge-less slots)."""
    H, T = plan.H, plan.T
    bal_base = [int(a) for a in plan.bal_base]

    def kernel_a(tab_ref, g_ref, s1_ref, m1_ref, out_ref):
        X0 = tab_ref[:]
        pairs = jnp.stack(
            [X0[8 * a : 8 * a + 16] for a in bal_base]
        )  # (nv, 16, C)
        X1 = jax.lax.dot_general(
            g_ref[:], pairs, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(H, C)
        X2 = _taa(X1, s1_ref[:])
        MT = _ttr(X2, T)
        out_ref[:] = _taa(MT, m1_ref[:])

    def kernel_b(mt_ref, mv_ref, m3_ref, s3_ref, out_ref):
        MT = mt_ref[:]
        mv = mv_ref[:]
        acc = jnp.zeros_like(MT)
        for d in range(T):
            acc = jnp.where(mv == d, _tile_roll(MT, d), acc)
        MT3 = _taa(acc, m3_ref[:])
        X3 = _ttr(MT3, T)
        out_ref[:] = _taa(X3, s3_ref[:])

    mt = _vmem_call(
        kernel_a,
        (
            tab_rows,
            jnp.asarray(plan.bal_G),
            jnp.asarray(plan.s1_idx),
            jnp.asarray(plan.mini_s1),
        ),
        (H, C),
        interpret,
    )
    return _vmem_call(
        kernel_b,
        (
            mt,
            jnp.asarray(plan.move),
            jnp.asarray(plan.mini_s3),
            jnp.asarray(plan.s3_idx),
        ),
        (H, C),
        interpret,
    )


def transpose_fn(plan, cot_rows, *, interpret=False):
    """cot_rows: (H, 128) cotangent (edge-less slots must be zero).
    Returns (n_src * 8, 128) table-row cotangents."""
    H, T = plan.H, plan.T
    starts, ends, n_src = _bal_ranges(plan)

    def kernel_a(cot_ref, i3_ref, im3_ref, imv_ref, out_ref):
        X4 = cot_ref[:]
        X3 = _taa(X4, i3_ref[:])
        MT3 = _ttr(X3, T)
        MT2 = _taa(MT3, im3_ref[:])
        imv = imv_ref[:]
        acc = jnp.zeros_like(MT2)
        for d in range(T):
            acc = jnp.where(imv == d, _tile_roll(MT2, -d), acc)
        out_ref[:] = acc

    def kernel_b(mt_ref, im1_ref, g_ref, *rest):
        s1t_refs = rest[:-1]
        out_ref = rest[-1]
        MT = mt_ref[:]
        X2 = _taa(MT, im1_ref[:])
        X2 = _ttr(X2, T)
        X1c = jnp.zeros_like(X2)
        for l_ref in s1t_refs:
            idx = l_ref[:]
            vals = _taa(X2, jnp.maximum(idx, 0))
            X1c = X1c + jnp.where(idx >= 0, vals, 0.0)
        # balance adjoint: per dest vreg a (16, C) contribution at rows
        # [8a_v, 8a_v+16); regroup per source vreg with static ranges
        contrib = jax.lax.dot_general(
            g_ref[:], X1c.reshape(H // 8, 8, C),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (nv, 16, C)
        rows = []
        zero = jnp.zeros((8, C), jnp.float32)
        for w in range(n_src):
            acc = zero
            for v in range(starts[w], ends[w]):
                acc = acc + contrib[v, :8]
            if w >= 1:
                for v in range(starts[w - 1], ends[w - 1]):
                    acc = acc + contrib[v, 8:]
            rows.append(acc)
        out_ref[:] = jnp.concatenate(rows, axis=0)

    mt = _vmem_call(
        kernel_a,
        (
            cot_rows,
            jnp.asarray(plan.inv_s3),
            jnp.asarray(plan.inv_mini_s3),
            jnp.asarray(plan.inv_move),
        ),
        (H, C),
        interpret,
    )
    return _vmem_call(
        kernel_b,
        (
            mt,
            jnp.asarray(plan.inv_mini_s1),
            jnp.asarray(plan.bal_G),
        )
        + tuple(jnp.asarray(plan.s1t_idx[l]) for l in range(plan.fanout)),
        (n_src * 8, C),
        interpret,
    )


def expand_forward(plan, tab, *, interpret=False):
    """out (P,) = tab[idx] — Pallas network + XLA side path."""
    # pad the row-matrix view to a vreg multiple so the balance stage's
    # static 16-row pair slices stay in bounds
    n_rows = 8 * -(-plan.U_rows // 8)
    tr = jnp.zeros((n_rows * C,), jnp.float32).at[: plan.U].set(tab)
    X4 = forward_fn(plan, tr.reshape(-1, C), interpret=interpret)
    out = X4.reshape(-1)[: plan.P]
    if plan.side_tab.size:
        side_vals = tab[jnp.asarray(plan.side_tab)]
        out = out.at[jnp.asarray(plan.side_pos)].set(
            side_vals[jnp.asarray(plan.side_src)]
        )
    return out


def expand_transpose(plan, cot, *, interpret=False):
    """tab_cot (U,) = scatter-add of cot (P,)."""
    cpad = jnp.zeros((plan.H * C,), jnp.float32).at[: plan.P].set(cot)
    if plan.side_tab.size:
        cpad = cpad.at[jnp.asarray(plan.side_pos)].set(0.0)
    X0 = transpose_fn(plan, cpad.reshape(plan.H, C), interpret=interpret)
    tab_cot = X0.reshape(-1)[: plan.U]
    if plan.side_tab.size:
        side_sum = jnp.zeros((plan.side_tab.size,), jnp.float32).at[
            jnp.asarray(plan.side_src)
        ].add(cot[jnp.asarray(plan.side_pos)])
        tab_cot = tab_cot.at[jnp.asarray(plan.side_tab)].add(side_sum)
    return tab_cot
