"""Pallas TPU kernels executing an :class:`~nifty_tpu.ops.route.ExpandPlan`.

The forward kernel turns the per-unique-mode table into the packed
expansion (``out[p] = tab[idx[p]]``); the transpose kernel is its exact
adjoint (scatter-add).  Both are straight-line cascades of the TPU vector
core's fast primitives — lane shuffles (``take_along_axis`` along lanes),
(128,128) tile transposes, tile rotations (``pltpu.roll`` with a dynamic
shift inside a ``fori_loop``), and the masked roll butterfly for the
balance stage.  See :mod:`nifty_tpu.ops.route` for the design and the
measured per-primitive costs that motivated it; the numpy simulator there
executes the identical op sequence and is the correctness oracle
(tests/test_pallas_expand.py).

Every loop is compile-time bounded — O(log H) butterfly stages plus two
``fori_loop``s — so the same kernels serve every layout size: the
205k-index 1280² layout and the 2.1M-index 4096²-exact layout (H ≈ 20k
rows, ~40 MB peak VMEM across the two calls) compile to the same program
shape.  Each direction is split into two ``pallas_call``s so VMEM holds
only one stage's routing tables at a time (the inter-stage tensor
round-trips through HBM).
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


def _roll_rows(x, k):
    """Static roll-down by k rows (out[i] = x[i - k])."""
    if k == 0:
        return x
    _, pltpu = _pl()
    return pltpu.roll(x, k, 0)


def _lane_dtype(plan):
    return jnp.int8 if plan.Tp <= C else jnp.int32


def _tile_move(x, idx, T, Tp):
    """Cross-tile movement: axis-rotate (T,128,128) → (128·128, Tp) so
    the tile index lives on LANES, gather per row ((Tp/128)² clamped
    shuffle+select passes — Mosaic's lane gather needs same-shape index
    blocks), rotate back.  O(1) data passes in T; the naive
    roll-and-select loop is O(T) (measured 50x slower at T=172)."""
    if Tp > T:
        x = jnp.concatenate([x, jnp.zeros(((Tp - T) * C, C), x.dtype)], 0)
    Z = jnp.transpose(x.reshape(Tp, C, C), (1, 2, 0)).reshape(C * C, Tp)
    nh = Tp // C
    outs = []
    for oh in range(nh):
        io = idx[:, oh * C : (oh + 1) * C].astype(jnp.int32)
        acc = jnp.zeros((C * C, C), x.dtype)
        for sh in range(nh):
            Zs = Z[:, sh * C : (sh + 1) * C]
            g = jnp.take_along_axis(Zs, jnp.clip(io - sh * C, 0, C - 1), axis=1)
            acc = jnp.where((io >= sh * C) & (io < (sh + 1) * C), g, acc)
        outs.append(acc)
    Z2 = outs[0] if nh == 1 else jnp.concatenate(outs, axis=1)
    Xb = jnp.transpose(Z2.reshape(C, C, Tp), (2, 0, 1)).reshape(Tp * C, C)
    return Xb[: T * C]


def _vmem_call(kern, inputs, out_shape, interpret):
    pl, pltpu = _pl()
    kw = {}
    if not interpret:
        try:
            # raise the per-kernel VMEM budget: at the 2.1M-index layout
            # the stage tensors + tables peak around 40 MB per call
            kw["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            )
        except (AttributeError, TypeError):  # pragma: no cover - older jax
            pass
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
        **kw,
    )(*inputs)


def forward_fn(plan, tab_pad, *, interpret=False):
    """tab_pad: (H, 128) zero-padded table rows.
    Returns the (H, 128) network output (garbage in edge-less slots)."""
    _, pltpu = _pl()
    H, T, NB = plan.H, plan.T, plan.n_bits

    def kernel_a(tab_ref, d_ref, s1_ref, m1_ref, out_ref):
        d = d_ref[:]

        # balance: masked roll butterfly, high bit first (collision-free
        # by monotone 1-Lipschitz displacement — see ops/route.py).  A
        # fori_loop with a dynamic-shift roll: the stage body compiles
        # once, keeping Mosaic compile time flat in the network height.
        def stage(i, Y):
            b = NB - 1 - i
            bit = jnp.bitwise_and(jnp.right_shift(d, b), 1) == 1
            return jnp.where(bit, pltpu.roll(Y, jnp.left_shift(1, b), 0), Y)

        Y = jax.lax.fori_loop(0, NB, stage, tab_ref[:])
        X2 = _taa(Y, s1_ref[:])
        MT = _ttr(X2, T)
        out_ref[:] = _taa(MT, m1_ref[:])

    def kernel_b(mt_ref, ls_ref, m3_ref, s3_ref, out_ref):
        MT2 = _tile_move(mt_ref[:], ls_ref[:], T, plan.Tp)
        MT3 = _taa(MT2, m3_ref[:])
        X3 = _ttr(MT3, T)
        out_ref[:] = _taa(X3, s3_ref[:])

    mt = _vmem_call(
        kernel_a,
        (
            tab_pad,
            jnp.asarray(plan.bal_d[:, None], jnp.int32),
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
            jnp.asarray(plan.lane_src, _lane_dtype(plan)),
            jnp.asarray(plan.mini_s3, jnp.int8),
            jnp.asarray(plan.s3_idx, jnp.int8),
        ),
        (H, C),
        interpret,
    )


def transpose_fn(plan, cot_rows, *, interpret=False):
    """cot_rows: (H, 128) cotangent (edge-less slots must be zero).
    Returns (H, 128) table-row cotangents (rows >= U_rows are garbage
    from the butterfly's padding region — slice to U in the caller)."""
    _, pltpu = _pl()
    H, T, NB = plan.H, plan.T, plan.n_bits

    def kernel_a(cot_ref, i3_ref, im3_ref, ld_ref, out_ref):
        X4 = cot_ref[:]
        X3 = _taa(X4, i3_ref[:])
        MT3 = _ttr(X3, T)
        MT2 = _taa(MT3, im3_ref[:])
        out_ref[:] = _tile_move(MT2, ld_ref[:], T, plan.Tp)

    def kernel_b(mt_ref, im1_ref, d_ref, s1t_ref, out_ref):
        MT = mt_ref[:]
        X2 = _taa(MT, im1_ref[:])
        X2 = _ttr(X2, T)

        # σ1ᵀ: fanout masked shuffle-add layers, as a fori_loop over the
        # stacked (fanout, H, C) table (compile-time O(1) in fanout, and
        # no SSA temporary per layer — unrolled layers blew the register
        # allocator with 210 MB of vmem spill slots at the 2.1M layout)
        def layer(l, acc):
            idx = s1t_ref[l].astype(jnp.int32)
            vals = _taa(X2, jnp.maximum(idx, 0))
            return acc + jnp.where(idx >= 0, vals, 0.0)

        X1c = jax.lax.fori_loop(0, plan.fanout, layer, jnp.zeros_like(X2))

        # balance adjoint: reversed roll butterfly, low bit first
        d = d_ref[:]

        def stage(b, c):
            bit = jnp.bitwise_and(jnp.right_shift(d, b), 1) == 1
            kept = jnp.where(bit, 0.0, c)
            moved = jnp.where(bit, c, 0.0)
            # roll up by 2^b rows (out[i] = moved[i + 2^b])
            return kept + pltpu.roll(moved, H - jnp.left_shift(1, b), 0)

        out_ref[:] = jax.lax.fori_loop(0, NB, stage, X1c)

    mt = _vmem_call(
        kernel_a,
        (
            cot_rows,
            jnp.asarray(plan.inv_s3, jnp.int8),
            jnp.asarray(plan.inv_mini_s3, jnp.int8),
            jnp.asarray(plan.lane_dst, _lane_dtype(plan)),
        ),
        (H, C),
        interpret,
    )
    return _vmem_call(
        kernel_b,
        (
            mt,
            jnp.asarray(plan.inv_mini_s1, jnp.int8),
            jnp.asarray(plan.bal_d[:, None], jnp.int32),
            jnp.asarray(plan.s1t_idx, jnp.int8),
        ),
        (H, C),
        interpret,
    )


# Glue around the kernels is deliberately SCATTER-FREE on every tensor
# data-connected to a pallas_call (concat-pad + mask-multiply + slices):
# index-array scatters wired directly into/out of the Mosaic custom calls
# miscompiled on v5e (silent corruption of the kernel result — an
# XLA:TPU buffer interaction; reproduced and bisected on-chip).  The side
# path's scatters operate on fresh zero operands only and join through
# elementwise adds, a pattern verified safe.


def _side_mask(plan):
    # cached ON the plan object (frozen dataclass -> object.__setattr__):
    # lifetime-tied, so a GC'd plan can never leak its mask to a new plan
    # allocated at the same id()
    m = getattr(plan, "_side_mask_np", None)
    if m is None:
        m = np.ones(plan.P, np.float32)
        m[plan.side_pos] = 0.0
        object.__setattr__(plan, "_side_mask_np", m)
    return jnp.asarray(m)  # numpy cached; device constant per trace


def expand_forward(plan, tab, *, interpret=False):
    """out (P,) = tab[idx] — Pallas network + XLA side path."""
    tr = jnp.concatenate(
        [tab.astype(jnp.float32), jnp.zeros(plan.H * C - plan.U, jnp.float32)]
    )
    X4 = forward_fn(plan, tr.reshape(plan.H, C), interpret=interpret)
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
