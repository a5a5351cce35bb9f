"""On-chip experiments: fast table-gather/scatter for the exact mode
expansion (ops/mode_expand.py) on TPU.

Usage: python probes/_prob_gather.py <case> [n]
Cases:
  xla      - time current mode_expand forward + transpose (XLA gather path)
  pallas   - compile+time a Pallas VMEM-table gather kernel (jnp.take)
  pallas_s - compile+time a Pallas scatter-add (sort-free, one-hot-free?)
  smoke    - tiny Pallas gather compile smoke test
"""

import sys
import time
from functools import partial

import jax
import numpy as np
from jax import numpy as jnp

from nifty_tpu.models.correlated_field import make_grid
from nifty_tpu.ops.mode_expand import build_expand_layout, mode_expand


def timeit(fn, *args, k=64, n_=4, label=""):
    @partial(jax.jit, static_argnums=())
    def chain(*a):
        def body(i, x):
            y = fn(*a[:-1], x)
            # reduce back to the carried shape
            return x * 0.5 + jnp.sum(y) * 1e-20
        x = jax.lax.fori_loop(0, k, body, a[-1])
        return jnp.sum(x * 0)

    t0 = time.perf_counter()
    float(chain(*args))
    print(f"  [{label}] compile {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(n_):
        t0 = time.perf_counter()
        float(chain(*args))
        ts.append((time.perf_counter() - t0) / k)
    print(f"{label}: {np.median(ts)*1e3:.3f} ms/apply", flush=True)
    return float(np.median(ts))


def get_layout(n=1280):
    g = make_grid((n, n), 1.0 / n, "fourier")
    pd = np.asarray(g.harmonic_grid.power_distributor, dtype=np.int32)
    core = pd[tuple(slice(0, s // 2 + 1) for s in pd.shape)]
    packed, layout = build_expand_layout(
        core, int(g.harmonic_grid.mode_lengths.size)
    )
    print(
        f"n={n}: packed {layout.packed_shape} = {np.prod(layout.packed_shape)}"
        f" idx, n_unique={layout.n_unique}, kind={layout.kind}",
        flush=True,
    )
    return packed, layout


def case_xla(n):
    packed, layout = get_layout(n)
    U = layout.n_unique
    tab = jnp.asarray(np.random.default_rng(0).standard_normal(U), jnp.float32)

    def fwd(idx, tab):
        return mode_expand(tab, idx, layout)

    # time fwd: chain over tab
    def fwd_chain(idx, tab):
        out = mode_expand(tab, idx, layout)
        return tab * 0.5 + jnp.sum(out) * 1e-20

    timeit(lambda idx, t: mode_expand(t, idx, layout), packed, tab,
           label=f"xla fwd {n}")

    # transpose: raw gather (no unpack) vs full
    cot = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (layout.core_shape)).astype(np.float32))

    f = lambda t: mode_expand(t, packed, layout)
    _, vjp = jax.vjp(f, tab)

    def trans(idx, c):
        return vjp(c)[0]

    timeit(lambda idx, c: vjp(c)[0], packed, cot, label=f"xla vjp {n}")

    # raw packed gather without unpack (isolate gather cost)
    def raw_gather(idx, t):
        t2 = jnp.stack([t, t], axis=-1)
        return t2[idx][..., 0]

    timeit(raw_gather, packed, tab, label=f"xla raw wide gather {n}")

    def raw_scatter(idx, c):
        return jnp.zeros((U,), c.dtype).at[idx.ravel()].add(c.ravel())

    cpk = jnp.asarray(
        np.random.default_rng(2).standard_normal(layout.packed_shape
                                                 ).astype(np.float32))
    timeit(raw_scatter, packed, cpk, label=f"xla raw scatter {n}")


def _pallas_gather_fn(P_pad, U_pad, BLK):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take(
            tab_ref[:], idx_ref[:], axis=0, indices_are_sorted=False
        )

    def run(idx, tab):
        return pl.pallas_call(
            kernel,
            grid=(P_pad // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((U_pad,), lambda i: (0,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (BLK,), lambda i: (i,), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((P_pad,), tab.dtype),
        )(idx, tab)

    return run


def case_smoke(n):
    # tiny compile smoke: 2D blocked take
    U, P = 1024, 4096
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, U, size=P), jnp.int32)
    tab = jnp.asarray(rng.standard_normal(U), jnp.float32)
    run = _pallas_gather_fn(P, U, 2048)
    t0 = time.perf_counter()
    out = np.asarray(jax.jit(run)(idx, tab))
    print(f"pallas smoke compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    ref = np.asarray(tab)[np.asarray(idx)]
    print("max err", np.abs(out - ref).max(), flush=True)


def case_pallas(n):
    packed, layout = get_layout(n)
    U = layout.n_unique
    P = int(np.prod(layout.packed_shape))
    BLK = 8 * 1024
    P_pad = -(-P // BLK) * BLK
    U_pad = -(-U // 1024) * 1024
    rng = np.random.default_rng(0)
    idx_flat = np.zeros(P_pad, np.int32)
    idx_flat[:P] = np.asarray(packed).ravel()
    idx = jnp.asarray(idx_flat)
    tab = jnp.asarray(rng.standard_normal(U_pad), jnp.float32)
    run = _pallas_gather_fn(P_pad, U_pad, BLK)
    t0 = time.perf_counter()
    out = np.asarray(jax.jit(run)(idx, tab))
    print(f"pallas gather compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    ref = np.asarray(tab)[idx_flat]
    print("max err", np.abs(out - ref).max(), flush=True)
    timeit(lambda i, t: run(i, t), idx, tab, label=f"pallas gather {n}")


if __name__ == "__main__":
    case = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    dict(
        xla=case_xla, smoke=case_smoke, pallas=case_pallas
    )[case](n)
