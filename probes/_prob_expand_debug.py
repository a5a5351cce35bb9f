"""Piecewise on-chip debug: compare each transpose kernel against the
numpy simulator's intermediate values (1280^2 layout)."""

import time

import jax
import numpy as np
from jax import numpy as jnp

from nifty_tpu.models.correlated_field import make_grid
from nifty_tpu.ops.mode_expand import build_expand_layout
from nifty_tpu.ops.route import build_expand_plan, _taa as np_taa  # noqa
from nifty_tpu.ops import route
from nifty_tpu.ops import pallas_expand as pe

n = 1280
g = make_grid((n, n), 1.0 / n, "fourier")
pd = np.asarray(g.harmonic_grid.power_distributor, dtype=np.int64)
core = pd[tuple(slice(0, s // 2 + 1) for s in pd.shape)]
packed, layout = build_expand_layout(core, int(g.harmonic_grid.mode_lengths.size))
idx = np.asarray(packed).ravel()
plan = build_expand_plan(idx, layout.n_unique)
H, T, C = plan.H, plan.T, 128

rng = np.random.default_rng(0)
cot = rng.standard_normal(idx.size).astype(np.float32)

# --- simulator intermediates (mirror simulate_transpose) -------------------
cpad = np.zeros((H * C,), np.float32)
cpad[: plan.P] = cot
if plan.side_tab.size:
    cpad[plan.side_pos] = 0.0
X4 = cpad.reshape(H, C)
X3 = np.take_along_axis(X4, plan.inv_s3, axis=1)
MT3 = route._ttr(X3, T)
MT2 = np.take_along_axis(MT3, plan.inv_mini_s3, axis=1)
MT = np.zeros_like(MT2)
for d in range(T):
    MT = np.where(plan.inv_move == d, route._tile_roll(MT2, -d, T), MT)
simA = MT  # kernel_a output

X2 = np.take_along_axis(MT, plan.inv_mini_s1, axis=1)
X2 = route._ttr(X2, T)
X1c = np.zeros((H, C), np.float32)
for l in range(plan.fanout):
    ii = plan.s1t_idx[l]
    vals = np.take_along_axis(X2, np.maximum(ii, 0), axis=1)
    X1c += np.where(ii >= 0, vals, 0.0)
from nifty_tpu.ops.pallas_expand import _bal_ranges
starts, ends, n_src = _bal_ranges(plan)
contrib = np.einsum("vij,vjc->vic", plan.bal_G.transpose(0, 2, 1), X1c.reshape(H // 8, 8, C))
simB = np.zeros((n_src * 8, C), np.float32)
for w in range(n_src):
    acc = np.zeros((8, C), np.float32)
    for v in range(starts[w], ends[w]):
        acc += contrib[v, :8]
    if w >= 1:
        for v in range(starts[w - 1], ends[w - 1]):
            acc += contrib[v, 8:]
    simB[8 * w : 8 * w + 8] = acc

# --- on-chip kernels, separately ------------------------------------------
from nifty_tpu.ops.pallas_expand import _vmem_call


def run_kernel_a(x):
    def kernel_a(cot_ref, i3_ref, im3_ref, imv_ref, out_ref):
        X4 = cot_ref[:]
        X3 = pe._taa(X4, i3_ref[:])
        MT3 = pe._ttr(X3, T)
        MT2 = pe._taa(MT3, im3_ref[:])
        imv = imv_ref[:].astype(jnp.int32)
        acc = jnp.zeros_like(MT2)
        for d in range(T):
            acc = jnp.where(imv == d, pe._tile_roll(MT2, -d), acc)
        out_ref[:] = acc

    return _vmem_call(
        kernel_a,
        (
            x,
            jnp.asarray(plan.inv_s3, jnp.int8),
            jnp.asarray(plan.inv_mini_s3, jnp.int8),
            jnp.asarray(plan.inv_move, jnp.int8),
        ),
        (H, C),
        False,
    )


devA = np.asarray(jax.jit(run_kernel_a)(jnp.asarray(X4)))
errA = np.abs(devA - simA).max()
print(f"kernel_a err: {errA:.3e}", flush=True)

devB = np.asarray(
    jax.jit(lambda m: pe.transpose_fn.__wrapped__(plan, m) if hasattr(pe.transpose_fn, '__wrapped__') else None)(jnp.asarray(simA))
    if False
    else jax.jit(lambda m: _run_b(m))(jnp.asarray(simA))
) if False else None

# kernel_b fed with the SIMULATOR's intermediate (isolates kernel_b)
def _run_b(m):
    def kernel_b(mt_ref, im1_ref, g_ref, *rest):
        s1t_refs = rest[:-1]
        out_ref = rest[-1]
        MT = mt_ref[:]
        X2 = pe._taa(MT, im1_ref[:])
        X2 = pe._ttr(X2, T)
        X1c = jnp.zeros_like(X2)
        for l_ref in s1t_refs:
            ii = l_ref[:].astype(jnp.int32)
            vals = pe._taa(X2, jnp.maximum(ii, 0))
            X1c = X1c + jnp.where(ii >= 0, vals, 0.0)
        contrib = jax.lax.dot_general(
            g_ref[:], X1c.reshape(H // 8, 8, C),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
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

    return _vmem_call(
        kernel_b,
        (
            m,
            jnp.asarray(plan.inv_mini_s1, jnp.int8),
            jnp.asarray(plan.bal_G),
        )
        + tuple(jnp.asarray(plan.s1t_idx[l], jnp.int8) for l in range(plan.fanout)),
        (n_src * 8, C),
        False,
    )


devB = np.asarray(jax.jit(_run_b)(jnp.asarray(simA)))
errB = np.abs(devB - simB).max()
print(f"kernel_b err: {errB:.3e}", flush=True)

# and forward once more with HIGHEST precision
tab = rng.standard_normal(layout.n_unique).astype(np.float32)
out = np.asarray(jax.jit(lambda t: pe.expand_forward(plan, t))(jnp.asarray(tab)))
print("fwd err:", np.abs(out - tab[idx]).max(), flush=True)
