"""Headline benchmark: Fisher-metric application for a 2-D correlated field.

Replicates the reference's JOSS benchmark kernel (``misc/re/paper/
minimal_benchmark.py``): M_p = (likelihood Fisher metric + 1) applied to a
random tangent for a CorrelatedFieldMaker + Poisson model — the operation
dominating MGVI/geoVI wall time.  Sizes are FFT-friendly (2^a·5^b) stand-ins
for the reference's 1309² / 10000² grid points; baselines are the
reference's measured numbers on an NVIDIA A100 SXM4 80GB (``BASELINE.md``):
~1.5 ms at ~1.7e6 dof and ~65 ms at 1e8 dof.

The likelihood is passed *as an argument* into the jitted metric so the
data array is a runtime input, not an inlined constant.

Emits one JSON line per configuration as it completes plus a final
composite line (geometric-mean speedup vs the A100 baseline across the
completed standard rows) — the last stdout line is the recorded headline;
an out-of-budget kill at a larger size never loses the banked rows.
"""

import json
import os
import sys
import time

import jax
import numpy as np
from jax import numpy as jnp
from jax import random

# NOTE: do NOT enable jax's persistent compilation cache here — executable
# (de)serialization through the tunneled TPU plugin takes minutes and can
# hang (measured: 10 s compile without the cache, 359 s with).

TIME_BUDGET_S = 560.0
_T0 = time.time()

# (shape, baseline_ms, n_mode_knots, chain_k): cheap-to-compile rows first
# so a budget kill at a larger size keeps the banked results.  chain_k is
# the number of metric applies chained into one program — sized so the
# per-call device work (k × apply) dwarfs the ~25-35 ms (and jittering)
# host↔device roundtrip floor of the tunneled backend.
# n_mode_knots=None is the reference's exact unique-|k| spectrum
# (bit-parity model); an integer K is the TPU-recommended pixel-expansion
# configuration (spectrum deviations on K log-spaced knots, gather-free;
# statistically equivalent prior — tests/test_knot_equivalence.py), the
# documented default for >=2048^2 grids.
SIZES = [
    # cheapest row first (banks a result + warms the backend), then the
    # exact rows (Pallas expansion network; native routing-plan build
    # ~0.5 s at 1280² / ~17 s at 4096², plus the Mosaic compiles), then
    # the large knot rows
    ((1280, 1280), 1.5, 64, 256),
    ((1280, 1280), 1.5, None, 64),
    ((4096, 4096), 12.0, 64, 16),
    ((10240, 10240), 65.0, 64, 8),
    # the 4096²-exact row last: its setup is the longest (routing plan +
    # two Mosaic compiles), and a budget cutoff must not cost the rows
    # above their spot in the composite
    ((4096, 4096), 12.0, None, 16),
]


def _np_tree_like(shapes, rng):
    return jax.tree_util.tree_map(
        lambda s: rng.standard_normal(s.shape).astype(s.dtype)
        if jnp.issubdtype(s.dtype, jnp.floating)
        else np.zeros(s.shape, s.dtype),
        shapes,
    )


def build_likelihood(shape, n_mode_knots=None):
    """All setup runs on the host / CPU backend: the TPU sees exactly one
    compiled program (the metric apply) per size — important because the
    tunneled compile path slows down drastically after a few programs."""
    import nifty_tpu as nt

    cfm = nt.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(
        shape,
        distances=1.0 / shape[0],
        fluctuations=(1.0, 5e-1),
        loglogavgslope=(-3.0, 2e-1),
        flexibility=(1e0, 2e-1),
        n_mode_knots=n_mode_knots,
    )
    cf = cfm.finalize()
    # ChainModel keeps cf's mode tables/distributor as dynamic pytree leaves
    # → they reach the compiled metric as runtime parameters, not inlined
    # constants (mandatory at ≥1e8 dof: the remote-compile payload would
    # otherwise be ~1 GB of HLO literals)
    fwd = nt.ChainModel(jnp.exp, cf)

    rng = np.random.default_rng(42)
    shapes = jax.eval_shape(cf.init, random.PRNGKey(0))
    pos_np = _np_tree_like(shapes, rng)
    # the Fisher metric is data-independent — synthetic counts suffice
    data = rng.poisson(1.0, size=shape).astype(np.int32)
    lh = nt.Poissonian(jnp.asarray(data)).amend(fwd)
    tangent_np = _np_tree_like(shapes, np.random.default_rng(44))
    pos = nt.Vector(jax.tree_util.tree_map(jax.device_put, pos_np))
    tangent = nt.Vector(jax.tree_util.tree_map(jax.device_put, tangent_np))
    return lh, pos, tangent


from functools import partial


@partial(jax.jit, static_argnums=(3,))
def _metric_chain(lh, p, t, k):
    """k data-dependent metric applies in one program, reduced to a scalar.

    Timing a single dispatch + `block_until_ready` is NOT reliable on every
    backend (the tunneled TPU plugin acks before execution completes); a
    chained loop whose scalar result is fetched to the host is.  The 0.5×
    rescale keeps the tangent from growing across iterations.
    """

    def body(i, t):
        m = lh.metric(p, t)
        return jax.tree_util.tree_map(lambda a, b: (a + b) * 0.5, m, t)

    t = jax.lax.fori_loop(0, k, body, t)
    return sum(
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda a: jnp.sum(a * 0), t)
        )
    )


def _roundtrip_floor_s(n=10):
    """Median host↔device scalar-fetch latency (subtracted from timings)."""
    f = jax.jit(lambda x: x + 1)
    z = jnp.zeros(())
    float(f(z))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(z))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def time_apply(lh, pos, tangent, chain_k=16, n_iter=4):
    floor = _roundtrip_floor_s()
    float(_metric_chain(lh, pos, tangent, chain_k))  # compile + warm
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        float(_metric_chain(lh, pos, tangent, chain_k))
        times.append((time.perf_counter() - t0 - floor) / chain_k)
    return max(float(np.median(times)), 1e-9)


def main():
    ratios = []
    names = []
    for shape, baseline_ms, knots, chain_k in SIZES:
        if ratios and time.time() - _T0 > TIME_BUDGET_S * 0.75:
            print(
                f"bench: budget cutoff before {shape} (elapsed"
                f" {time.time() - _T0:.0f}s)",
                file=sys.stderr,
            )
            break
        try:
            lh, pos, tangent = build_likelihood(shape, n_mode_knots=knots)
            t = time_apply(lh, pos, tangent, chain_k=chain_k)
        except Exception as e:  # noqa: BLE001
            print(f"bench: {shape} failed ({e!r})", file=sys.stderr)
            continue
        variant = "_exact" if knots is None else f"_knots{knots}"
        name = f"{shape[0]}x{shape[1]}{variant}"
        ratio = baseline_ms / (t * 1e3)
        ratios.append(ratio)
        names.append(name)
        print(
            f"bench: {name}: {t * 1e3:.3f} ms ({ratio:.3f}x A100, elapsed"
            f" {time.time() - _T0:.0f}s)",
            file=sys.stderr,
        )
        # emit the row and a refreshed composite immediately — a timeout
        # kill at a later size must not lose the banked rows, and the
        # recorded headline (last stdout line) must always be the
        # composite over everything completed so far
        print(
            json.dumps(
                {
                    "metric": f"cf2d_poisson_metric_apply_{name}",
                    "value": round(t * 1e3, 3),
                    "unit": "ms",
                    "vs_baseline": round(ratio, 3),
                }
            ),
            flush=True,
        )
        geo = float(np.exp(np.mean(np.log(ratios))))
        print(
            json.dumps(
                {
                    "metric": "cf2d_poisson_metric_apply_geomean["
                    + ",".join(names)
                    + "]",
                    "value": round(geo, 3),
                    "unit": "x_vs_A100_geomean",
                    "vs_baseline": round(geo, 3),
                }
            ),
            flush=True,
        )
    if not ratios:
        raise SystemExit("benchmark failed at every size")


if __name__ == "__main__":
    main()
