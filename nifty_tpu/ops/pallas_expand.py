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
    # index tables ship as int8 (4x smaller compile payload through the
    # tunneled backend); widen in-register before the lane gather
    return jnp.take_along_axis(x, idx.astype(jnp.int32), axis=1)


def _tile_roll(x, delta):
    if delta == 0:
        return x
    k = delta * C
    return jnp.concatenate([x[-k:], x[:-k]], axis=0)


def _bal_ranges(plan):
    """Per source vreg w, the (static) range of dest vregs v with
    bal_base == w — used by the balance adjoint.  Only vregs with a
    nonzero one-hot block count (padding vregs carry base 0 out of
    order, so no sortedness may be assumed)."""
    base = np.asarray(plan.bal_base)
    used = plan.bal_G.reshape(base.size, -1).any(axis=1)
    n_src = plan.U_rows // 8 + 2
    starts = np.zeros(n_src, np.int64)
    ends = np.zeros(n_src, np.int64)
    for w in range(n_src):
        vs = np.where(used & (base == w))[0]
        if vs.size:
            assert vs.max() - vs.min() + 1 == vs.size, "ranges not contiguous"
            starts[w], ends[w] = vs.min(), vs.max() + 1
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
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(H, C)
        X2 = _taa(X1, s1_ref[:])
        MT = _ttr(X2, T)
        out_ref[:] = _taa(MT, m1_ref[:])

    def kernel_b(mt_ref, mv_ref, m3_ref, s3_ref, out_ref):
        MT = mt_ref[:]
        mv = mv_ref[:].astype(jnp.int32)
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
            jnp.asarray(plan.s1_idx, jnp.int8),
            jnp.asarray(plan.mini_s1, jnp.int8),
        ),
        (H, C),
        interpret,
    )
    return _vmem_call(
        kernel_b,
        (
            mt,
            jnp.asarray(plan.move, jnp.int8),
            jnp.asarray(plan.mini_s3, jnp.int8),
            jnp.asarray(plan.s3_idx, jnp.int8),
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
        imv = imv_ref[:].astype(jnp.int32)
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
            idx = l_ref[:].astype(jnp.int32)
            vals = _taa(X2, jnp.maximum(idx, 0))
            X1c = X1c + jnp.where(idx >= 0, vals, 0.0)
        # balance adjoint: per dest vreg a (16, C) contribution at rows
        # [8a_v, 8a_v+16); regroup per source vreg with static ranges
        contrib = jax.lax.dot_general(
            g_ref[:], X1c.reshape(H // 8, 8, C),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
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
            jnp.asarray(plan.inv_s3, jnp.int8),
            jnp.asarray(plan.inv_mini_s3, jnp.int8),
            jnp.asarray(plan.inv_move, jnp.int8),
        ),
        (H, C),
        interpret,
    )
    return _vmem_call(
        kernel_b,
        (
            mt,
            jnp.asarray(plan.inv_mini_s1, jnp.int8),
            jnp.asarray(plan.bal_G),
        )
        + tuple(jnp.asarray(plan.s1t_idx[l], jnp.int8) for l in range(plan.fanout)),
        (n_src * 8, C),
        interpret,
    )


# Glue around the kernels is deliberately SCATTER-FREE on every tensor
# data-connected to a pallas_call (concat-pad + mask-multiply + slices):
# index-array scatters wired directly into/out of the Mosaic custom calls
# miscompiled on v5e (silent corruption of the kernel result — an
# XLA:TPU buffer interaction; reproduced and bisected on-chip).  The side
# path's scatters operate on fresh zero operands only and join through
# elementwise adds, a pattern verified safe.
_side_mask_cache: dict = {}


def _side_mask(plan):
    m = _side_mask_cache.get(id(plan))
    if m is None:
        m = np.ones(plan.P, np.float32)
        m[plan.side_pos] = 0.0
        _side_mask_cache[id(plan)] = m
    return jnp.asarray(m)  # numpy cached; device constant per trace


def expand_forward(plan, tab, *, interpret=False):
    """out (P,) = tab[idx] — Pallas network + XLA side path."""
    # pad the row-matrix view so the balance stage's static 16-row pair
    # slices stay in bounds (bases are clamped to max_src_vreg - 2)
    n_rows = 8 * max(-(-plan.U_rows // 8), 2)
    tr = jnp.concatenate(
        [tab.astype(jnp.float32), jnp.zeros(n_rows * C - plan.U, jnp.float32)]
    )
    X4 = forward_fn(plan, tr.reshape(-1, C), interpret=interpret)
    out = X4.reshape(-1)[: plan.P]
    if plan.side_tab.size:
        side_vals = tab[jnp.asarray(plan.side_tab)]
        side_dense = jnp.zeros((plan.P,), jnp.float32).at[
            jnp.asarray(plan.side_pos)
        ].set(side_vals[jnp.asarray(plan.side_src)].astype(jnp.float32))
        out = out * _side_mask(plan) + side_dense
    return out


def expand_transpose(plan, cot, *, interpret=False):
    """tab_cot (U,) = scatter-add of cot (P,)."""
    cot = cot.astype(jnp.float32)
    cin = cot * _side_mask(plan) if plan.side_tab.size else cot
    cpad = jnp.concatenate(
        [cin, jnp.zeros(plan.H * C - plan.P, jnp.float32)]
    )
    X0 = transpose_fn(plan, cpad.reshape(plan.H, C), interpret=interpret)
    tab_cot = X0.reshape(-1)[: plan.U]
    if plan.side_tab.size:
        side_sum = jnp.zeros((plan.side_tab.size,), jnp.float32).at[
            jnp.asarray(plan.side_src)
        ].add(cot[jnp.asarray(plan.side_pos)])
        side_dense = jnp.zeros((plan.U,), jnp.float32).at[
            jnp.asarray(plan.side_tab)
        ].add(side_sum)
        tab_cot = tab_cot + side_dense
    return tab_cot
