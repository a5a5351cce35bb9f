"""Real-TPU correctness lane (gated: NIFTY_TPU_DEVICE_TESTS=1).

Every other test runs on the CPU backend (conftest forces it); nothing
there proves that f32-on-TPU numerics — MXU einsum FFTs, bf16 paths, the
Pallas expansion network — reproduce the CPU results.  This lane computes
f32 reference values on CPU inside the pytest process, then spawns one
subprocess on the default (TPU) backend that runs the core flows and
compares.  Analogue of the reference's device sweep inside
``check_linear_operator`` (``nifty/cl/extra.py:44,519``).

The subprocess chains everything into a handful of programs — single
dispatches are not reliably timeable/cheap through the tunneled TPU
plugin (see bench.py) — and asserts internally; pytest checks its exit
status and summary line.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

GATED = os.environ.get("NIFTY_TPU_DEVICE_TESTS", "") != "1"

WORKER = r"""
import sys
import numpy as np
import jax
from jax import numpy as jnp, random

assert jax.default_backend() not in ("cpu",), jax.default_backend()

import nifty_tpu as nt
from nifty_tpu.ops.sht import healpix_synthesis

ref = np.load(sys.argv[1])
rtol_fwd = 2e-3

# --- correlated field forward (exact + knot spectra) vs CPU-f32 ------------
def build_cf(knots):
    cfm = nt.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(
        (64, 64), distances=1.0 / 64,
        fluctuations=(1.0, 5e-1), loglogavgslope=(-3.0, 2e-1),
        flexibility=(1e0, 2e-1), n_mode_knots=knots,
    )
    return cfm.finalize()

for tag, knots in (("exact", None), ("knot", 16)):
    cf = build_cf(knots)
    pos = {k: jnp.asarray(ref[f"cf_{tag}_pos_{k}"]) for k in cf.domain}
    out = np.asarray(jax.jit(cf)(pos))
    want = ref[f"cf_{tag}_out"]
    err = np.abs(out - want).max() / np.abs(want).max()
    print(f"cf_{tag}: rel err {err:.2e}", flush=True)
    assert err < rtol_fwd, (tag, err)

# --- likelihood metric identity: metric == lsm ∘ rsm on-device -------------
cf = build_cf(None)
data = jnp.asarray(ref["data"])
lh = nt.Gaussian(data, noise_cov_inv=lambda x: x / 0.1).amend(cf)
pos = nt.Vector({k: jnp.asarray(ref[f"cf_exact_pos_{k}"]) for k in cf.domain})
tan = nt.Vector({k: jnp.asarray(ref[f"tan_{k}"]) for k in cf.domain})

@jax.jit
def identity_gap(p, t):
    m = lh.metric(p, t)
    lsm_rsm = lh.left_sqrt_metric(p, lh.right_sqrt_metric(p, t))
    num = nt.norm(jax.tree_util.tree_map(lambda a, b: a - b, m, lsm_rsm), ord=2)
    den = nt.norm(m, ord=2)
    return num / den

gap = float(identity_gap(pos, tan))
print(f"metric lsm.rsm identity gap: {gap:.2e}", flush=True)
assert gap < 1e-3, gap

# --- one MGVI iteration: finite, energy decreases --------------------------
key = random.PRNGKey(3)
samples, state = nt.optimize_kl(
    lh, pos, n_total_iterations=1, n_samples=1, key=key,
    draw_linear_kwargs=dict(cg_name=None, cg_kwargs=dict(maxiter=10)),
    kl_kwargs=dict(minimize_kwargs=dict(name=None, xtol=1e-4, maxiter=3)),
    sample_mode="linear_resample", odir=None,
)
e = float(state.minimization_state.fun)
print(f"MGVI energy after 1 it: {e:.6e}", flush=True)
assert np.isfinite(e)

# --- SHT synthesis vs CPU golden -------------------------------------------
alm = jnp.asarray(ref["alm"])
m = np.asarray(jax.jit(
    lambda a: healpix_synthesis(a, 16, lmax=32, mmax=32))(alm))
want = ref["sht_map"]
err = np.abs(m - want).max() / np.abs(want).max()
print(f"sht: rel err {err:.2e}", flush=True)
assert err < 5e-4, err

# --- expansion network at the real 1280^2-exact layout ---------------------
# The Mosaic/XLA miscompile neighborhood (ops/pallas_expand.py): verify the
# Clos-routed Pallas forward/transpose on-chip against exact numpy goldens
# at the exact layout bench.py times (205,761 packed indices).
from nifty_tpu.models.correlated_field import make_grid
from nifty_tpu.ops.mode_expand import build_expand_layout
from nifty_tpu.ops.route import build_expand_plan
from nifty_tpu.ops import pallas_expand as pe

n = 1280
g = make_grid((n, n), 1.0 / n, "fourier")
pd = np.asarray(g.harmonic_grid.power_distributor, dtype=np.int64)
core = pd[tuple(slice(0, s // 2 + 1) for s in pd.shape)]
packed, layout = build_expand_layout(
    core, int(g.harmonic_grid.mode_lengths.size)
)
idx = np.asarray(packed).ravel()
plan = build_expand_plan(idx, layout.n_unique)
rng = np.random.default_rng(5)
tab = rng.standard_normal(layout.n_unique).astype(np.float32)
cot = rng.standard_normal(idx.size).astype(np.float32)
out = np.asarray(jax.jit(lambda t: pe.expand_forward(plan, t))(jnp.asarray(tab)))
err = np.abs(out - tab[idx]).max()
print(f"expand fwd 1280^2-exact: abs err {err:.2e}", flush=True)
assert err == 0.0, err
tc = np.asarray(jax.jit(lambda c: pe.expand_transpose(plan, c))(jnp.asarray(cot)))
ref_t = np.zeros(layout.n_unique, np.float32)
np.add.at(ref_t, idx, cot)
errt = np.abs(tc - ref_t).max() / np.abs(ref_t).max()
print(f"expand transpose 1280^2-exact: rel err {errt:.2e}", flush=True)
assert errt < 1e-6, errt

# --- exact-path CF forward: network vs XLA gather path, on-chip ------------
from nifty_tpu import config as nt_config

def build_exact_cf():
    cfm = nt.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(
        (n, n), distances=1.0 / n,
        fluctuations=(1.0, 5e-1), loglogavgslope=(-3.0, 2e-1),
        flexibility=(1e0, 2e-1),
    )
    return cfm.finalize()

cf_net = build_exact_cf()  # registers the network plan (TPU default)
pos = cf_net.init(random.PRNGKey(7))
out_net = np.asarray(jax.jit(cf_net)(pos))
nt_config.update("expand_network", "off")  # _active_plan consults config
cf_xla = build_exact_cf()
out_xla = np.asarray(jax.jit(cf_xla)(pos))
nt_config.update("expand_network", "auto")
err = np.abs(out_net - out_xla).max() / np.abs(out_xla).max()
print(f"cf exact 1280^2 network-vs-xla: rel err {err:.2e}", flush=True)
assert err < 1e-5, err

# --- vmapped-samples exact-path metric apply (batched wide-slice gather) ---
# The batched VI path bypasses the (unbatched-only) Pallas network; check
# its numerics on-chip against per-sample unbatched applies.
cf_net2 = build_exact_cf()  # re-register the network plan
data2 = jnp.asarray(
    out_net + 0.3 * rng.standard_normal((n, n)).astype(np.float32)
)
lh2 = nt.Gaussian(data2, noise_cov_inv=lambda x: x / 0.1).amend(cf_net2)
tans = {
    k: jnp.asarray(
        rng.standard_normal((2,) + tuple(v.shape)).astype(np.float32)
    )
    for k, v in jax.eval_shape(cf_net2.init, random.PRNGKey(0)).items()
}
posv = nt.Vector(pos)
batched = jax.jit(
    jax.vmap(lambda t: lh2.metric(posv, nt.Vector(t)), in_axes=(0,))
)(tans)
single = jax.jit(lambda t: lh2.metric(posv, nt.Vector(t)))
for i in range(2):
    want_i = single({k: v[i] for k, v in tans.items()})
    for k in tans:
        a = np.asarray(batched.tree[k][i])
        b = np.asarray(want_i.tree[k])
        errk = np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)
        assert errk < 2e-4, (i, k, errk)
print("vmapped exact-path metric matches unbatched on-chip", flush=True)

print("DEVICE LANE OK", flush=True)
"""


@pytest.mark.skipif(GATED, reason="set NIFTY_TPU_DEVICE_TESTS=1 (needs a TPU)")
def test_device_lane(tmp_path):
    import jax
    from jax import numpy as jnp, random

    import nifty_tpu as nt
    from nifty_tpu.ops.sht import healpix_synthesis

    # CPU f32 reference values
    with jax.enable_x64(False):
        vals = {}

        def build_cf(knots):
            cfm = nt.CorrelatedFieldMaker("cf")
            cfm.set_amplitude_total_offset(
                offset_mean=1.0, offset_std=(1e-1, 3e-2)
            )
            cfm.add_fluctuations(
                (64, 64),
                distances=1.0 / 64,
                fluctuations=(1.0, 5e-1),
                loglogavgslope=(-3.0, 2e-1),
                flexibility=(1e0, 2e-1),
                n_mode_knots=knots,
            )
            return cfm.finalize()

        rng = np.random.default_rng(0)
        for tag, knots in (("exact", None), ("knot", 16)):
            cf = build_cf(knots)
            shapes = jax.eval_shape(cf.init, random.PRNGKey(0))
            pos = {
                k: np.asarray(rng.standard_normal(v.shape), np.float32)
                for k, v in shapes.items()
            }
            for k, v in pos.items():
                vals[f"cf_{tag}_pos_{k}"] = v
            vals[f"cf_{tag}_out"] = np.asarray(cf(pos))
        cf = build_cf(None)
        shapes = jax.eval_shape(cf.init, random.PRNGKey(0))
        for k, v in shapes.items():
            vals[f"tan_{k}"] = np.asarray(
                rng.standard_normal(v.shape), np.float32
            )
        vals["data"] = np.asarray(
            vals["cf_exact_out"] + 0.3 * rng.standard_normal((64, 64)),
            np.float32,
        )
        alm = np.asarray(rng.standard_normal((33 * 33,)), np.float32)
        vals["alm"] = alm
        vals["sht_map"] = np.asarray(
            healpix_synthesis(jnp.asarray(alm), 16, lmax=32, mmax=32)
        )

    fn = tmp_path / "ref.npz"
    np.savez(fn, **vals)
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, str(script), str(fn)],
        capture_output=True,
        text=True,
        timeout=5400,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    print(r.stdout, flush=True)  # the per-check numbers are the artifact
    assert r.returncode == 0, f"device lane failed:\n{r.stdout}\n{r.stderr}"
    assert "DEVICE LANE OK" in r.stdout, r.stdout
