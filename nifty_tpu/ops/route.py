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

    balance   duplicate hot table rows (batched one-hot MXU matmul;
              row duplication is lane-independent, so it is a matmul)
    stage 1   within-row lane shuffle: place each element at its color
    T         (128,128) tile transpose
    mini 1    within-row lane shuffle (mini-Clos stage 1 over tiles)
    rotate    cross-tile movement: sum over δ of (move==δ)·tile-roll-δ
    mini 3    within-row lane shuffle (mini-Clos stage 3)
    T⁻¹       tile transpose back
    stage 3   within-row lane shuffle: final column placement

Existence of the color assignments is König's theorem: the bipartite
multigraph source-row → destination-row has max degree ≤ 128 after
balancing, so its edges 128-color with no color repeated at any row
(computed exactly by repeated Euler splitting, O(E log 128)); the same
argument applies per color to the tile→tile mini graph.  Elements with
multiplicity > `hot_cap` bypass the network through a tiny XLA side
gather so balancing stays bounded.

The transpose (scatter-add) reuses the same decomposition backwards:
every stage is per-row invertible except stage 1, whose adjoint is a
small number of masked shuffle-adds (`fanout` layers), and balance,
whose adjoint is the transposed one-hot matmul plus overlapped
window adds.
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
    (a power of two) colors; max degree must be ≤ n_colors."""
    assert n_colors & (n_colors - 1) == 0
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    E = src.size
    nl = nr = max(n_left, n_right)
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
    # balance: per dest vreg a source-vreg base and a one-hot matrix
    bal_base: np.ndarray         # (H//8,) int32, source vreg index
    bal_G: np.ndarray            # (H//8, 8, 16) f32 one-hot
    # forward shuffles
    s1_idx: np.ndarray           # (H, C) int32
    mini_s1: np.ndarray          # (H, C) int32   (transposed space)
    move: np.ndarray             # (H, C) int32 in [0, T)   (dest-indexed)
    mini_s3: np.ndarray          # (H, C) int32   (transposed space)
    s3_idx: np.ndarray           # (H, C) int32
    # transpose direction
    inv_s3: np.ndarray           # (H, C) int32
    inv_mini_s3: np.ndarray      # (H, C) int32
    inv_move: np.ndarray         # (H, C) int32   (source-indexed)
    inv_mini_s1: np.ndarray      # (H, C) int32
    s1t_idx: np.ndarray          # (fanout, H, C) int32, -1 = unused
    # side path (hot elements, straight XLA)
    side_tab: np.ndarray         # (n_hot,) int32 table entries
    side_pos: np.ndarray         # (n_uses,) int32 flat output slots
    side_src: np.ndarray         # (n_uses,) int32 index into side_tab


def _tile_roll(x, delta, T):
    """x (H, C) viewed as (T, 128, C): roll tiles down by delta."""
    if delta == 0:
        return x
    k = delta * 128
    return np.concatenate([x[-k:], x[:-k]], axis=0)


def tile_transpose(x, T):
    return (
        x.reshape(T, 128, x.shape[-1]).swapaxes(1, 2).reshape(x.shape)
        if x.shape[-1] == 128
        else None
    )


def build_expand_plan(idx_flat, U, *, hot_cap=8, fanout=2, verbose=False):
    """Build the routing plan for ``out[p] = tab[idx_flat[p]]``."""
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
    mini_s1 = np.zeros((H, C), dtype=np.int32)
    mini_s3 = np.zeros((H, C), dtype=np.int32)
    move = np.zeros((H, C), dtype=np.int32)
    inv_mini_s1 = np.zeros((H, C), dtype=np.int32)
    inv_mini_s3 = np.zeros((H, C), dtype=np.int32)
    inv_move = np.zeros((H, C), dtype=np.int32)
    for k in range(C):
        sel = colors == k
        ts_k, td_k = t_s[sel], t_d[sel]
        kappa = euler_color(ts_k, td_k, T, T, C)
        # MT row of the element pre-rotation: t_s*128 + k, lane κ
        mini_s1[ts_k * C + k, kappa] = j_s[sel]
        inv_mini_s1[ts_k * C + k, j_s[sel]] = kappa
        move[td_k * C + k, kappa] = (td_k - ts_k) % T
        inv_move[ts_k * C + k, kappa] = (td_k - ts_k) % T
        mini_s3[td_k * C + k, j_d[sel]] = kappa
        inv_mini_s3[td_k * C + k, kappa] = j_d[sel]

    # --- balance tables (vreg-pair one-hot matmuls)
    # dest row r' (balanced row) reads table row src_of_copy[r']
    src_of_copy = np.zeros(H, dtype=np.int64)
    src_of_copy[:R_bal] = np.repeat(np.arange(U_rows), d_row)
    # rows ≥ R_bal: dummy/padding — all-zero G rows
    n_vreg = H // 8
    bal_base = np.zeros(n_vreg, dtype=np.int32)
    bal_G = np.zeros((n_vreg, 8, 16), dtype=np.float32)
    max_src_vreg = max(U_rows // 8 + (1 if U_rows % 8 else 0), 2)
    for v in range(n_vreg):
        rows = src_of_copy[8 * v : 8 * v + 8]
        lo = 8 * v
        if lo >= R_bal:
            bal_base[v] = 0
            continue
        n_real = min(R_bal - lo, 8)
        a = int(rows[0] // 8)
        a = min(a, max(max_src_vreg - 2, 0))
        bal_base[v] = a
        for i in range(n_real):
            off = int(rows[i]) - 8 * a
            assert 0 <= off < 16, (v, i, rows[i], a)
            bal_G[v, i, off] = 1.0

    return ExpandPlan(
        U=U,
        P=P,
        H=H,
        T=T,
        U_rows=U_rows,
        fanout=fanout,
        bal_base=bal_base,
        bal_G=bal_G,
        s1_idx=s1_idx,
        mini_s1=mini_s1,
        move=move,
        mini_s3=mini_s3,
        s3_idx=s3_idx,
        inv_s3=inv_s3,
        inv_mini_s3=inv_mini_s3,
        inv_move=inv_move,
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


def simulate_forward(plan, tab):
    """out_flat (P,) = tab[idx_flat] via the network + side path."""
    p = plan
    H, T = p.H, p.T
    # table in row layout, padded
    X0r = np.zeros((p.U_rows * C,), tab.dtype)
    X0r[: p.U] = tab
    X0 = X0r.reshape(-1, C)
    # balance: vreg-pair stacks + one-hot matmul
    X1 = np.zeros((H, C), tab.dtype)
    for v in range(H // 8):
        a = int(p.bal_base[v])
        pair = np.zeros((16, C), tab.dtype)
        lo = a * 8
        hi = min(lo + 16, X0.shape[0])
        pair[: hi - lo] = X0[lo:hi]
        X1[8 * v : 8 * v + 8] = p.bal_G[v] @ pair
    # stage 1
    X2 = _taa(X1, p.s1_idx)
    # transpose, mini stage 1
    MT = _ttr(X2, T)
    MT = _taa(MT, p.mini_s1)
    # cross-tile rotation
    MT2 = np.zeros_like(MT)
    for d in range(T):
        MT2 = np.where(p.move == d, _tile_roll(MT, d, T), MT2)
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
    MT = np.zeros_like(MT2)
    for d in range(T):
        MT = np.where(p.inv_move == d, _tile_roll(MT2, -d, T), MT)
    X2 = _taa(MT, p.inv_mini_s1)
    X2 = _ttr(X2, T)  # transpose back to row space
    # σ1ᵀ: masked fanout adds
    X1c = np.zeros((H, C), cot.dtype)
    for l in range(p.fanout):
        idx = p.s1t_idx[l]
        vals = _taa(X2, np.maximum(idx, 0))
        X1c += np.where(idx >= 0, vals, 0.0)
    # balanceᵀ: G^T matmul + overlapped window adds
    X0c = np.zeros((-(-p.U // C) * C,), cot.dtype)
    X0m = X0c.reshape(-1, C)
    for v in range(H // 8):
        a = int(p.bal_base[v])
        contrib = p.bal_G[v].T @ X1c[8 * v : 8 * v + 8]  # (16, C)
        lo = a * 8
        hi = min(lo + 16, X0m.shape[0])
        X0m[lo:hi] += contrib[: hi - lo]
    tab_cot = X0c[: p.U].copy()
    if p.side_tab.size:
        np.add.at(tab_cot, p.side_tab[p.side_src], cot[p.side_pos])
    return tab_cot
