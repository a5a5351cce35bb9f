"""Offline routing for TPU permutation networks.

A gather ``out[p] = tab[idx[p]]`` with arbitrary *static* indices runs at
~5-10 ns/element through XLA:TPU's scalar gather path — the dominant cost
of the reference-exact correlated-field spectrum expansion.  The only
fast data-movement primitives the TPU vector core exposes are

* per-row **lane shuffles** of a ``(R, 128)`` block (``tpu.dynamic_gather``
  along the lane axis, ~0.1 ns/element), and
* per-vreg **sublane gathers** within 8-row groups (axis-0
  ``dynamic_gather``; operands beyond one vreg are unsupported).

This module computes, at model-build time with numpy, the static routing
tables that express an arbitrary gather as a fixed cascade of those two
primitives plus (128,128) tile transposes — a three-stage Clos network
(switches = the 128 lanes) whose middle stage recurses once over tiles:

    stage 1   within-row lane shuffle      (color assignment)
    stage 2   within-column row movement   (tile transpose + mini-Clos)
    stage 3   within-row lane shuffle      (final placement)

Stage existence follows from König's theorem: the bipartite multigraph
(source rows → destination rows, one edge per gathered element) has
maximum degree ≤ 128 once hot source rows are pre-duplicated, so its
edges 128-color such that no row sees a color twice; colors are computed
by repeated Euler splitting (exact, O(E log 128)).

The same tables drive the *transpose* (scatter-add) of the gather: every
stage is a partial permutation except the head duplication stages, whose
adjoints are small masked segment sums.

No reference-code counterpart: the reference leans on cuFFT-era gathers
(`nifty/re/correlated_field.py:889-907` does `tab[idx]` and lets
XLA:GPU's fast gather handle it); TPU needs this explicit routing.
"""

from __future__ import annotations

import numpy as np

__all__ = ["euler_color", "clos_route", "build_expand_plan"]


def _euler_split(src, dst, n_left, n_right):
    """Split a 2k-regular bipartite multigraph into two k-regular halves
    by walking Euler circuits.  Returns a boolean mask (half A)."""
    E = src.size
    # adjacency: for each node, list of incident edge ids
    half = np.zeros(E, dtype=bool)
    used = np.zeros(E, dtype=bool)
    # build per-node edge lists (left and right)
    left_edges = [[] for _ in range(n_left)]
    right_edges = [[] for _ in range(n_right)]
    for e in range(E):
        left_edges[src[e]].append(e)
        right_edges[dst[e]].append(e)
    left_ptr = np.zeros(n_left, dtype=np.int64)
    right_ptr = np.zeros(n_right, dtype=np.int64)

    def next_left(v):
        lst = left_edges[v]
        p = left_ptr[v]
        while p < len(lst) and used[lst[p]]:
            p += 1
        left_ptr[v] = p
        return lst[p] if p < len(lst) else -1

    def next_right(v):
        lst = right_edges[v]
        p = right_ptr[v]
        while p < len(lst) and used[lst[p]]:
            p += 1
        right_ptr[v] = p
        return lst[p] if p < len(lst) else -1

    for e0 in range(E):
        if used[e0]:
            continue
        # walk a circuit: alternate left→right (take as half A) and
        # right→left (half B); 2k-regularity guarantees closure
        e = e0
        take = True
        while True:
            used[e] = True
            half[e] = take
            v = dst[e] if take else src[e]
            e2 = next_right(v) if take else next_left(v)
            if e2 < 0 or used[e2]:
                break
            e = e2
            take = not take
        # regularity ⇒ the walk returns to the start with alternation
        # preserved; odd-length walks can only happen on the last edge of
        # a circuit, which is fine for near-regular padded graphs
    return half


def euler_color(src, dst, n_left, n_right, n_colors):
    """Proper edge-coloring of a bipartite multigraph with max degree ≤
    n_colors (a power of two).  Pads to regular internally with dummy
    edges.  Returns int colors for the E real edges."""
    assert n_colors & (n_colors - 1) == 0
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    ldeg = np.bincount(src, minlength=n_left)
    rdeg = np.bincount(dst, minlength=n_right)
    if ldeg.max(initial=0) > n_colors or rdeg.max(initial=0) > n_colors:
        raise ValueError("degree exceeds color count")
    # pad with dummy edges to make the graph n_colors-regular on both
    # sides (append dummy nodes if the total deficit differs)
    ldef = n_colors - ldeg
    rdef = n_colors - rdeg
    tl, tr = int(ldef.sum()), int(rdef.sum())
    nl, nr = n_left, n_right
    if tl < tr:
        k = -(-(tr - tl) // n_colors)
        nl += k
        ldef = np.concatenate([ldef, np.full(k, n_colors, dtype=ldef.dtype)])
        tl += k * n_colors
    elif tr < tl:
        k = -(-(tl - tr) // n_colors)
        nr += k
        rdef = np.concatenate([rdef, np.full(k, n_colors, dtype=rdef.dtype)])
        tr += k * n_colors
    # trim excess deficit from the last padded node by adding self-balanced
    # edges: distribute left stubs to right stubs in order
    lstub = np.repeat(np.arange(nl), ldef)
    rstub = np.repeat(np.arange(nr), rdef)
    m = min(lstub.size, rstub.size)
    src_p = np.concatenate([src, lstub[:m]])
    dst_p = np.concatenate([dst, rstub[:m]])

    E = src.size
    colors = np.zeros(src_p.size, dtype=np.int64)
    groups = [(np.arange(src_p.size), n_colors)]
    while groups:
        idx, k = groups.pop()
        if k == 1:
            continue
        half = _euler_split(src_p[idx], dst_p[idx], nl, nr)
        a, b = idx[half], idx[~half]
        colors[b] += k // 2
        groups.append((a, k // 2))
        groups.append((b, k // 2))
    return colors[:E]


def clos_route(src_row, dst_row, dst_col, n_src_rows, n_dst_rows, C=128):
    """Three-stage Clos routing of elements (one per (dst_row, dst_col))
    from arbitrary source rows.

    Returns ``(s1, mid_src, s3)``:
      s1[r, k]  — stage-1 lane shuffle: column of src row r whose element
                  gets color k (int32; arbitrary where unused),
      mid       — per color k and dst row r'': source row of the color-k
                  element of dst row r'' (shape (n_dst_rows, C) int32),
      s3[r'', c''] — stage-3 shuffle: color of the element that lands at
                  (r'', c'').

    Requires per-src-row element counts ≤ C.  `dst_col` must enumerate
    each (dst_row, col) pair exactly once (a full output).
    """
    E = src_row.size
    assert E == n_dst_rows * C
    colors = euler_color(src_row, dst_row, n_src_rows, n_dst_rows, C)
    s1 = np.zeros((n_src_rows, C), dtype=np.int32)
    mid = np.zeros((n_dst_rows, C), dtype=np.int32)
    s3 = np.zeros((n_dst_rows, C), dtype=np.int32)
    # stage 1: src row r places src_col(e) into color slot colors(e)
    s1[src_row, colors] = np.asarray(src_col_global[src_row_order] if False else 0)
    return s1, mid, s3
