"""Offline Clos routing: arbitrary static gathers as TPU shuffle cascades.

A gather ``out[p] = tab[idx[p]]`` with arbitrary static indices runs at
~5-10 ns/element through XLA:TPU's scalar gather path — the dominant cost
of the reference-exact correlated-field spectrum expansion (the reference
leans on fast GPU gathers instead: ``nifty/re/correlated_field.py:
889-907``).  The TPU vector core's fast data movements (measured, v5e) are

* per-row lane shuffles of an ``(H, 128)`` block        ~0.14 ns/elem
* (128,128) tile transposes                              ~0.2  ns/elem
* static row shifts / masked selects / small matmuls     ~free

This module computes — at model-build time, in numpy — static routing
tables expressing the gather as a fixed cascade of those primitives:

    balance   duplicate hot table rows.  The copy map ``src_of_copy`` is
              monotone with increments in {0, 1}, so the per-row
              displacement d[i] = i − s[i] is monotone and 1-Lipschitz;
              the duplication then runs as a ⌈log₂ max d⌉-stage masked
              roll butterfly (stage b, high→low: rows whose displacement
              has bit b set take the value 2^b rows up).  Monotonicity +
              the Lipschitz bound make every stage collision-free —
              d[i−2^b] and d[i] share all bits above b whenever bit b of
              d[i] is set — so the cascade is exact, compile-time O(log)
              and contains no unrolled per-row work.
    stage 1   within-row lane shuffle: place each element at its color
    T         (128,128) tile transpose
    mini 1    within-row lane shuffle (mini-Clos stage 1 over tiles)
    move      cross-tile movement.  The (T, k, κ) tensor is axis-rotated
              to (k·128+κ, tile) — tile index on LANES — where the
              movement is a per-row lane gather ((Tp/128)² shuffle+select
              passes), then rotated back.  O(1) passes in T, vs the O(T)
              roll-and-select loop of the naive rotation (measured 50x
              at T=172: 116 µs vs ~5 ms for the full middle stage).
    mini 3    within-row lane shuffle (mini-Clos stage 3)
    T⁻¹       tile transpose back
    stage 3   within-row lane shuffle: final column placement

Existence of the color assignments is König's theorem: the bipartite
multigraph source-row → destination-row has max degree ≤ 128 after
balancing, so its edges 128-color with no color repeated at any row
(computed exactly by repeated Euler splitting, O(E log 128)); the same
argument applies per color to the tile→tile mini graph.  Elements with
multiplicity > `hot_cap` bypass the network through a tiny XLA side
gather so balancing stays bounded (with the defaults nothing is hot on
the isotropic-grid layouts: hot_cap·fanout ≥ max multiplicity).

The transpose (scatter-add) reuses the same decomposition backwards:
every stage is per-row invertible except stage 1, whose adjoint is a
small number of masked shuffle-adds (`fanout` layers), and balance,
whose adjoint runs the roll butterfly in reverse (masked roll-up adds
— a contiguous segment sum, since ``src_of_copy`` is monotone).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import numpy as np

__all__ = [
    "euler_color",
    "ExpandPlan",
    "build_expand_plan",
    "simulate_forward",
    "simulate_transpose",
]

C = 128  # lanes


# --------------------------------------------------------------------------
# bipartite edge coloring by Euler splitting
# --------------------------------------------------------------------------


def _euler_split_half(src, dst, n_left, n_right):
    """Partition the edges of a bipartite multigraph with even degrees
    everywhere into two halves balanced at every node (Euler circuits,
    alternating).  Returns a boolean mask (True = half A)."""
    E = src.size
    half = np.zeros(E, dtype=bool)
    used = np.zeros(E, dtype=bool)
    ladj = [[] for _ in range(n_left)]
    radj = [[] for _ in range(n_right)]
    for e in range(E):
        ladj[src[e]].append(e)
        radj[dst[e]].append(e)
    lptr = [0] * n_left
    rptr = [0] * n_right

    def nxt(adj, ptr, v):
        lst = adj[v]
        p = ptr[v]
        while p < len(lst) and used[lst[p]]:
            p += 1
        ptr[v] = p
        return lst[p] if p < len(lst) else -1

    for e0 in range(E):
        if used[e0]:
            continue
        e, take = e0, True
        while e >= 0 and not used[e]:
            used[e] = True
            half[e] = take
            v = dst[e] if take else src[e]
            e = nxt(radj, rptr, v) if take else nxt(ladj, lptr, v)
            take = not take
    return half


def euler_color(src, dst, n_left, n_right, n_colors=C):
    """Proper edge coloring of a bipartite multigraph with `n_colors`
    (a power of two) colors; max degree must be ≤ n_colors.  Runs the
    native (C++) Euler splitter when available — identical algorithm,
    ~50x faster at millions of edges — with this Python traversal as
    the fallback."""
    assert n_colors & (n_colors - 1) == 0
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    E = src.size
    nl = nr = max(n_left, n_right)
    try:
        from ..native.router import euler_color_native

        out = euler_color_native(src, dst, nl, n_colors)
    except Exception:  # pragma: no cover - native build issues
        out = None
    if out is not None:
        assert _coloring_ok(src, out), "left coloring clash"
        assert _coloring_ok(dst, out), "right coloring clash"
        return out
    ldeg = np.bincount(src, minlength=nl)
    rdeg = np.bincount(dst, minlength=nr)
    if (ldeg.max(initial=0) > n_colors) or (rdeg.max(initial=0) > n_colors):
        raise ValueError("degree exceeds n_colors")
    # fill every node to degree n_colors with dummy edges (stub pairing)
    lstub = np.repeat(np.arange(nl), n_colors - ldeg)
    rstub = np.repeat(np.arange(nr), n_colors - rdeg)
    assert lstub.size == rstub.size
    src_p = np.concatenate([src, lstub])
    dst_p = np.concatenate([dst, rstub])

    colors = np.zeros(src_p.size, dtype=np.int64)
    stack = [(np.arange(src_p.size), n_colors, 0)]
    while stack:
        ids, k, base = stack.pop()
        if k == 1:
            colors[ids] = base
            continue
        half = _euler_split_half(src_p[ids], dst_p[ids], nl, nr)
        stack.append((ids[half], k // 2, base))
        stack.append((ids[~half], k // 2, base + k // 2))
    out = colors[:E]
    # sanity: proper coloring
    assert _coloring_ok(src, out), "left coloring clash"
    assert _coloring_ok(dst, out), "right coloring clash"
    return out


def _coloring_ok(nodes, colors):
    key = nodes * (colors.max() + 1 if colors.size else 1) + colors
    return np.unique(key).size == key.size


# --------------------------------------------------------------------------
# plan
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class ExpandPlan:
    """Static tables for the TPU expansion network (all numpy).  Shapes:
    H = network height (rows, multiple of 128), T = H // 128 tiles."""

    U: int
    P: int
    H: int
    T: int
    U_rows: int                  # table rows (ceil(U/128))
    fanout: int                  # σ1ᵀ layer count
    # balance: monotone 1-Lipschitz per-row displacement (roll butterfly)
    bal_d: np.ndarray            # (H,) int32, d[i] = i - src_of_copy[i]
    # forward shuffles
    s1_idx: np.ndarray           # (H, C) int32
    mini_s1: np.ndarray          # (H, C) int32   (transposed space)
    lane_src: np.ndarray         # (C*C, Tp) int32: src tile per (k,κ,t_d)
    mini_s3: np.ndarray          # (H, C) int32   (transposed space)
    s3_idx: np.ndarray           # (H, C) int32
    # transpose direction
    inv_s3: np.ndarray           # (H, C) int32
    inv_mini_s3: np.ndarray      # (H, C) int32
    lane_dst: np.ndarray         # (C*C, Tp) int32: dst tile per (k,κ,t_s)
    inv_mini_s1: np.ndarray      # (H, C) int32
    s1t_idx: np.ndarray          # (fanout, H, C) int32, -1 = unused
    # side path (hot elements, straight XLA)
    side_tab: np.ndarray         # (n_hot,) int32 table entries
    side_pos: np.ndarray         # (n_uses,) int32 flat output slots
    side_src: np.ndarray         # (n_uses,) int32 index into side_tab

    @property
    def n_bits(self):
        """Stage count of the balance roll butterfly."""
        d_max = int(self.bal_d.max(initial=0))
        return d_max.bit_length()

    @property
    def Tp(self):
        """Tile count padded to a lane multiple (movement-stage width)."""
        return self.lane_src.shape[1]


def build_expand_plan(idx_flat, U, *, hot_cap=32, fanout=8, verbose=False):
    """Build the routing plan for ``out[p] = tab[idx_flat[p]]``.

    ``hot_cap``/``fanout`` trade balance duplication (network height H,
    which the rotate stage pays for linearly) against σ1ᵀ adjoint layers
    (``fanout`` masked shuffle-adds, ~free) and the XLA side path (hot
    elements).  The defaults keep every isotropic-grid layout fully
    in-network: at 4096²-exact (2.1M packed indices) they give H = 19968
    vs 31104 with the historical (hot_cap=8, fanout=2)."""
    idx_flat = np.asarray(idx_flat, dtype=np.int64)
    P = idx_flat.size
    U = int(U)
    U_rows = -(-U // C)
    R_out = -(-P // C)
    T_out = -(-R_out // C)  # output tiles

    mult = np.bincount(idx_flat, minlength=U)

    # --- side path: hot elements bypass the network
    hot = mult > hot_cap
    side_tab = np.where(hot)[0].astype(np.int32)
    hot_rank = np.full(U, -1, dtype=np.int64)
    hot_rank[side_tab] = np.arange(side_tab.size)
    is_side = hot[idx_flat]
    side_pos = np.where(is_side)[0].astype(np.int32)
    side_src = hot_rank[idx_flat[side_pos]].astype(np.int32)

    main_pos = np.where(~is_side)[0]
    main_src = idx_flat[main_pos]

    # --- balance: split each table row's uses into copies with
    #     ≤ C uses per copy and ≤ `fanout` uses per element per copy
    src_row = main_src // C
    src_lane = main_src % C
    order = np.lexsort((main_pos, main_src))  # group by table entry
    g_src = main_src[order]
    # per-use occurrence number within its table entry
    first = (
        np.concatenate([[True], g_src[1:] != g_src[:-1]])
        if g_src.size
        else np.zeros(0, dtype=bool)
    )
    occ = np.arange(g_src.size) - np.maximum.accumulate(
        np.where(first, np.arange(g_src.size), -1)
    )
    row_of_use = g_src // C
    uses_per_row = np.bincount(row_of_use, minlength=U_rows)
    # uses are bundled into ≤`fanout`-sized groups per element; groups of
    # one element must land on distinct copies, so copies cycle by group
    # index within the row — even load AND the per-copy fanout cap
    elem_id = np.cumsum(first) - 1
    elem_mult = np.bincount(elem_id)
    groups_per_elem = -(-elem_mult // fanout)
    elem_row = row_of_use[first]
    group_base = np.concatenate([[0], np.cumsum(groups_per_elem)[:-1]])
    row_first_elem = np.concatenate([[True], elem_row[1:] != elem_row[:-1]])
    row_group_start = np.maximum.accumulate(
        np.where(row_first_elem, group_base, 0)
    )
    group_in_row = (group_base - row_group_start)[elem_id] + occ // fanout
    d_fan = np.zeros(U_rows, dtype=np.int64)
    np.maximum.at(d_fan, elem_row, groups_per_elem)
    d_row = np.maximum(-(-uses_per_row // C), np.maximum(d_fan, 1))
    for _ in range(16):
        copy_of_use = group_in_row % d_row[row_of_use]
        key = row_of_use * (d_row.max() + 1) + copy_of_use
        cnt = np.bincount(key)
        bad_rows = np.unique(row_of_use[cnt[key] > C])
        if bad_rows.size == 0:
            break
        d_row[bad_rows] += 1
    else:
        raise RuntimeError("balancing did not converge")

    copy_base = np.concatenate([[0], np.cumsum(d_row)])
    R_bal = int(copy_base[-1])

    # --- geometry: H (a tile multiple) covers balanced rows and output
    # rows.  Slots without a real edge (beyond P, or side-covered) carry
    # garbage forward (sliced off / overwritten) and zeros backward
    # (masked at the σ1ᵀ layers), so they need no edges at all.
    H = C * max(-(-R_bal // C), T_out)
    T = H // C

    # --- edges of the top-level bipartite multigraph (real uses only)
    n_main = main_pos.size
    e_src_row = copy_base[row_of_use] + copy_of_use
    e_src_lane = g_src % C
    e_dst_slot = main_pos[order]
    e_dst_row = e_dst_slot // C
    e_dst_lane = e_dst_slot % C

    if verbose:
        print(
            f"plan: P={P} U={U} H={H} T={T} R_bal={R_bal} "
            f"side={side_tab.size}/{side_pos.size}"
        )

    # --- top-level coloring
    colors = euler_color(e_src_row, e_dst_row, H, H, C)

    # --- stage tables
    s1_idx = np.zeros((H, C), dtype=np.int32)
    s1_idx[e_src_row, colors] = e_src_lane
    s3_idx = np.zeros((H, C), dtype=np.int32)
    s3_idx[e_dst_row, e_dst_lane] = colors
    inv_s3 = np.zeros((H, C), dtype=np.int32)
    inv_s3[e_dst_row, colors] = e_dst_lane

    # σ1ᵀ fanout layers: for each (src_row, color) → src_lane mapping,
    # invert with multiplicity: layer ℓ holds the ℓ-th color reading a
    # given (row, lane)
    s1t_idx = np.full((fanout, H, C), -1, dtype=np.int32)
    pair_order = np.lexsort((colors[:n_main], e_src_lane[:n_main], e_src_row[:n_main]))
    pr, pl, pc = (
        e_src_row[:n_main][pair_order],
        e_src_lane[:n_main][pair_order],
        colors[:n_main][pair_order],
    )
    new = np.concatenate([[True], (pr[1:] != pr[:-1]) | (pl[1:] != pl[:-1])])
    layer = np.arange(pr.size) - np.maximum.accumulate(
        np.where(new, np.arange(pr.size), -1)
    )
    assert layer.max(initial=0) < fanout
    s1t_idx[layer, pr, pl] = pc

    # --- mini-Clos per color over tiles
    t_s, j_s = e_src_row // C, e_src_row % C
    t_d, j_d = e_dst_row // C, e_dst_row % C
    Tp = C * -(-T // C)
    mini_s1 = np.zeros((H, C), dtype=np.int32)
    mini_s3 = np.zeros((H, C), dtype=np.int32)
    lane_src = np.zeros((C * C, Tp), dtype=np.int32)
    lane_dst = np.zeros((C * C, Tp), dtype=np.int32)
    inv_mini_s1 = np.zeros((H, C), dtype=np.int32)
    inv_mini_s3 = np.zeros((H, C), dtype=np.int32)
    for k in range(C):
        sel = colors == k
        ts_k, td_k = t_s[sel], t_d[sel]
        kappa = euler_color(ts_k, td_k, T, T, C)
        # MT row of the element pre-movement: t_s*128 + k, lane κ
        mini_s1[ts_k * C + k, kappa] = j_s[sel]
        inv_mini_s1[ts_k * C + k, j_s[sel]] = kappa
        # movement tables live in the axis-rotated (k·C+κ, tile) layout
        lane_src[k * C + kappa, td_k] = ts_k
        lane_dst[k * C + kappa, ts_k] = td_k
        mini_s3[td_k * C + k, j_d[sel]] = kappa
        inv_mini_s3[td_k * C + k, kappa] = j_d[sel]

    # --- balance displacement (roll butterfly)
    # dest row r' (balanced row) reads table row src_of_copy[r'];
    # src_of_copy is monotone with increments in {0, 1} (each table row
    # gets >= 1 consecutive copies).  Padding rows [R_bal, H) continue
    # with increment 1 into the zero-padded region beyond U_rows, so the
    # butterfly's adjoint scatters their (zero) cotangents harmlessly
    # past the table.
    src_of_copy = np.zeros(H, dtype=np.int64)
    src_of_copy[:R_bal] = np.repeat(np.arange(U_rows), d_row)
    src_of_copy[R_bal:] = U_rows - 1 + np.arange(1, H - R_bal + 1)
    bal_d = (np.arange(H) - src_of_copy).astype(np.int32)
    assert bal_d.min(initial=0) >= 0
    assert np.all(np.diff(bal_d) >= 0) and np.all(np.diff(bal_d) <= 1), (
        "balance displacement not monotone 1-Lipschitz"
    )

    return ExpandPlan(
        U=U,
        P=P,
        H=H,
        T=T,
        U_rows=U_rows,
        fanout=fanout,
        bal_d=bal_d,
        s1_idx=s1_idx,
        mini_s1=mini_s1,
        lane_src=lane_src,
        mini_s3=mini_s3,
        s3_idx=s3_idx,
        inv_s3=inv_s3,
        inv_mini_s3=inv_mini_s3,
        lane_dst=lane_dst,
        inv_mini_s1=inv_mini_s1,
        s1t_idx=s1t_idx,
        side_tab=side_tab,
        side_pos=side_pos,
        side_src=side_src,
    )


# --------------------------------------------------------------------------
# numpy simulator — the exact op sequence the Pallas kernels execute
# --------------------------------------------------------------------------


def _taa(x, idx):
    return np.take_along_axis(x, idx, axis=1)


def _ttr(x, T):
    return x.reshape(T, C, C).swapaxes(1, 2).reshape(T * C, C)


def _bal_butterfly_fwd(plan, X0pad):
    """Balance duplication: (H, C) zero-padded table rows -> (H, C)
    balanced rows, via the masked roll butterfly (high bit first)."""
    Y = X0pad
    d = plan.bal_d[:, None]
    for b in reversed(range(plan.n_bits)):
        k = 1 << b
        bit = (d >> b) & 1
        Y = np.where(bit == 1, np.roll(Y, k, axis=0), Y)
    return Y


def _bal_butterfly_adj(plan, X1c):
    """Exact adjoint of :func:`_bal_butterfly_fwd` (low bit first)."""
    c = X1c
    d = plan.bal_d[:, None]
    for b in range(plan.n_bits):
        k = 1 << b
        bit = ((d >> b) & 1) == 1
        c = np.where(bit, 0.0, c) + np.roll(np.where(bit, c, 0.0), -k, axis=0)
    return c


def _tile_move(plan, MT, idx_table):
    """Cross-tile movement in the axis-rotated layout: (T·C, C) → axis
    rotation to (k·C+κ, tile) → per-row lane gather by ``idx_table`` →
    rotate back.  The exact op sequence of the Pallas kernels."""
    T, Tp = plan.T, plan.Tp
    Xp = np.zeros((Tp * C, C), MT.dtype)
    Xp[: T * C] = MT
    Z = np.transpose(Xp.reshape(Tp, C, C), (1, 2, 0)).reshape(C * C, Tp)
    nh = Tp // C
    outs = []
    for oh in range(nh):
        io = idx_table[:, oh * C : (oh + 1) * C]
        acc = np.zeros((C * C, C), MT.dtype)
        for sh in range(nh):
            Zs = Z[:, sh * C : (sh + 1) * C]
            g = _taa(Zs, np.clip(io - sh * C, 0, C - 1))
            acc = np.where((io >= sh * C) & (io < (sh + 1) * C), g, acc)
        outs.append(acc)
    Z2 = np.concatenate(outs, axis=1)
    Xb = np.transpose(Z2.reshape(C, C, Tp), (2, 0, 1)).reshape(Tp * C, C)
    return Xb[: T * C]


def simulate_forward(plan, tab):
    """out_flat (P,) = tab[idx_flat] via the network + side path."""
    p = plan
    H, T = p.H, p.T
    # table in row layout, zero-padded to the full network height
    X0r = np.zeros((H * C,), tab.dtype)
    X0r[: p.U] = tab
    X1 = _bal_butterfly_fwd(p, X0r.reshape(H, C))
    # stage 1
    X2 = _taa(X1, p.s1_idx)
    # transpose, mini stage 1
    MT = _ttr(X2, T)
    MT = _taa(MT, p.mini_s1)
    # cross-tile movement (axis-rotated lane gather)
    MT2 = _tile_move(p, MT, p.lane_src)
    # mini stage 3, transpose back
    MT3 = _taa(MT2, p.mini_s3)
    X3 = _ttr(MT3, T)
    # stage 3
    X4 = _taa(X3, p.s3_idx)
    out = X4.reshape(-1)[: p.P].copy()
    # side path
    if p.side_tab.size:
        out[p.side_pos] = tab[p.side_tab][p.side_src]
    return out


def simulate_transpose(plan, cot):
    """tab_cot (U,) = scatter-add of cot (P,) through the network."""
    p = plan
    H, T = p.H, p.T
    cpad = np.zeros((H * C,), cot.dtype)
    cpad[: p.P] = cot
    if p.side_tab.size:
        cpad[p.side_pos] = 0.0
    X4 = cpad.reshape(H, C)
    X3 = _taa(X4, p.inv_s3)
    MT3 = _ttr(X3, T)
    MT2 = _taa(MT3, p.inv_mini_s3)
    MT = _tile_move(p, MT2, p.lane_dst)
    X2 = _taa(MT, p.inv_mini_s1)
    X2 = _ttr(X2, T)  # transpose back to row space
    # σ1ᵀ: masked fanout adds
    X1c = np.zeros((H, C), cot.dtype)
    for l in range(p.fanout):
        idx = p.s1t_idx[l]
        vals = _taa(X2, np.maximum(idx, 0))
        X1c += np.where(idx >= 0, vals, 0.0)
    # balanceᵀ: reversed roll butterfly (contiguous segment sums)
    X0c = _bal_butterfly_adj(p, X1c)
    tab_cot = X0c.reshape(-1)[: p.U].copy()
    if p.side_tab.size:
        np.add.at(tab_cot, p.side_tab[p.side_src], cot[p.side_pos])
    return tab_cot
