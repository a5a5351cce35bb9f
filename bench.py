"""Headline benchmark: Fisher-metric application for a 2-D correlated field.

Replicates the reference's JOSS benchmark kernel (``misc/re/paper/
minimal_benchmark.py``): M_p = (likelihood Fisher metric + 1) applied to a
random tangent for a CorrelatedFieldMaker + Poisson model — the operation
dominating MGVI/geoVI wall time.  Headline size 10000² px (1e8 degrees of
freedom); baseline is the reference's measured ~65 ms on an NVIDIA A100
SXM4 80GB (``BASELINE.md``).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import numpy as np
from jax import numpy as jnp
from jax import random


def build_metric_apply(shape):
    import nifty_tpu as nt

    cfm = nt.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(
        shape,
        distances=1.0 / shape[0],
        fluctuations=(1.0, 5e-1),
        loglogavgslope=(-3.0, 2e-1),
        flexibility=(1e0, 2e-1),
    )
    cf = cfm.finalize()

    class Forward(nt.Model):
        def __init__(self, cf):
            self.cf = cf
            super().__init__(init=cf.init)

        def __call__(self, x):
            return jnp.exp(self.cf(x))

    fwd = Forward(cf)
    key = random.PRNGKey(42)
    pos = nt.Vector(fwd.init(key))
    rate = fwd(pos)
    data = random.poisson(random.PRNGKey(43), rate, shape).astype(jnp.int32)
    lh = nt.Poissonian(data).amend(fwd)

    @jax.jit
    def metric_plus_one(p, t):
        m = lh.metric(p, t)
        return jax.tree_util.tree_map(jnp.add, m, t)

    tangent = nt.random_like(random.PRNGKey(44), pos)
    return metric_plus_one, pos, tangent


def time_apply(fn, pos, tangent, n_iter=20):
    out = fn(pos, tangent)  # compile
    jax.block_until_ready(out)
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        out = fn(pos, tangent)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    shape = (10_000, 10_000)  # 1e8 dof — the reference benchmark's largest size
    baseline_ms = 65.0  # nifty.re on A100 SXM4 80GB (BASELINE.md)
    try:
        fn, pos, tangent = build_metric_apply(shape)
        t = time_apply(fn, pos, tangent)
    except Exception as e:  # noqa: BLE001 — fall back to a smaller size
        print(f"bench fallback ({e!r})", file=sys.stderr)
        shape = (1309, 1309)
        baseline_ms = 1.5  # A100 at 1309²
        fn, pos, tangent = build_metric_apply(shape)
        t = time_apply(fn, pos, tangent)
    value_ms = t * 1e3
    print(
        json.dumps(
            {
                "metric": f"cf2d_poisson_metric_apply_{shape[0]}x{shape[1]}",
                "value": round(value_ms, 3),
                "unit": "ms",
                "vs_baseline": round(baseline_ms / value_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
