"""Compile + verify + time the Pallas expansion network on the real TPU
for the 1280^2 exact layout."""

import time

import jax
import numpy as np
from jax import numpy as jnp

from nifty_tpu.models.correlated_field import make_grid
from nifty_tpu.ops.mode_expand import build_expand_layout
from nifty_tpu.ops.route import build_expand_plan
from nifty_tpu.ops import pallas_expand as pe

n = 1280
g = make_grid((n, n), 1.0 / n, "fourier")
pd = np.asarray(g.harmonic_grid.power_distributor, dtype=np.int64)
core = pd[tuple(slice(0, s // 2 + 1) for s in pd.shape)]
packed, layout = build_expand_layout(core, int(g.harmonic_grid.mode_lengths.size))
idx = np.asarray(packed).ravel()
t0 = time.perf_counter()
plan = build_expand_plan(idx, layout.n_unique, verbose=True)
print(f"plan build {time.perf_counter()-t0:.1f}s", flush=True)

rng = np.random.default_rng(0)
tab = rng.standard_normal(layout.n_unique).astype(np.float32)
cot = rng.standard_normal(idx.size).astype(np.float32)

fwd = jax.jit(lambda t: pe.expand_forward(plan, t))
trn = jax.jit(lambda c: pe.expand_transpose(plan, c))

t0 = time.perf_counter()
out = np.asarray(fwd(jnp.asarray(tab)))
print(f"fwd compile+run {time.perf_counter()-t0:.0f}s", flush=True)
err = np.abs(out - tab[idx]).max()
print("fwd err:", err, flush=True)

t0 = time.perf_counter()
tc = np.asarray(trn(jnp.asarray(cot)))
print(f"transpose compile+run {time.perf_counter()-t0:.0f}s", flush=True)
ref = np.zeros(layout.n_unique, np.float32)
np.add.at(ref, idx, cot)
errt = np.abs(tc - ref).max() / np.abs(ref).max()
print("transpose rel err:", errt, flush=True)

# timing: chained loop
for name, f, x, size in (
    ("fwd", lambda t: pe.expand_forward(plan, t), jnp.asarray(tab), tab.size),
    ("trn", lambda c: pe.expand_transpose(plan, c), jnp.asarray(cot), cot.size),
):
    reps = 128

    @jax.jit
    def chain(x0):
        def body(i, x):
            y = f(x)
            s = jnp.sum(y) * 1e-20
            return x * 0.5 + jnp.zeros_like(x).at[0].set(s)

        return jnp.sum(jax.lax.fori_loop(0, reps, body, x0) * 0)

    t0 = time.perf_counter()
    float(chain(x))
    print(f"{name} chain compile {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(chain(x))
        ts.append(time.perf_counter() - t0)
    t = (np.median(ts) - 0.030) / reps
    print(f"{name}: {t*1e6:.1f} us/apply", flush=True)
