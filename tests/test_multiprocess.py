"""Two-process `jax.distributed` smoke test (gated: NIFTY_TPU_MULTIPROC=1).

Exercises `parallel.multihost.initialize`/`global_mesh` with a *real*
distributed runtime: two CPU processes form a cluster via a local
coordinator, build the global mesh, run one psum and one tiny
sample-sharded KL step.  This is the jax-native replacement for the
reference's MPI test lane (`test/test_cl/test_mpi/`, run under mpiexec;
ref: ``nifty/cl/utilities.py:309-420``).
"""

import os
import subprocess
import sys

import pytest

GATED = os.environ.get("NIFTY_TPU_MULTIPROC", "") != "1"

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]

# 2 virtual CPU devices per process -> 4 global devices
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")

from nifty_tpu.parallel import multihost

multihost.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=proc_id,
)
assert multihost.process_count() == nproc, multihost.process_count()
assert multihost.process_index() == proc_id
assert len(jax.devices()) == 2 * nproc, jax.devices()

import numpy as np
from jax import numpy as jnp, random
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = multihost.global_mesh(("samples",))
assert mesh.devices.size == 2 * nproc

# one global psum: mean over a globally sharded array
from jax.experimental.multihost_utils import host_local_array_to_global_array
local = np.full((2, 4), float(proc_id + 1))
garr = host_local_array_to_global_array(local, mesh, P("samples"))
total = jax.jit(
    lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
)(garr)
# fully-addressable scalar result
expect = 4.0 * sum(range(1, nproc + 1)) * 2 / 2
assert abs(float(total) - 4.0 * (1 + 2) * 2) < 1e-12, float(total)

# host-local slicing helper
lo, hi = multihost.host_local_slice(5)
all_ranges = {0: (0, 3), 1: (3, 5)}
assert (lo, hi) == all_ranges[proc_id], (lo, hi)

# tiny sample-sharded KL step: 4 mirrored samples over the 4 global devices
import nifty_tpu as nt

cfm = nt.CorrelatedFieldMaker("cf")
cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1e-1, 3e-2))
cfm.add_fluctuations((16,), 1.0 / 16, (1.0, 0.5), (-3.0, 0.2))
cf = cfm.finalize()
rng = np.random.default_rng(0)
data = jnp.asarray(rng.normal(size=(16,)))
lh = nt.Gaussian(data, noise_cov_inv=lambda x: x / 0.1).amend(cf)
shapes = jax.eval_shape(cf.init, random.PRNGKey(0))
shapes = shapes.tree if hasattr(shapes, "tree") else shapes
pos = nt.Vector(jax.tree_util.tree_map(
    lambda s: jnp.asarray(rng.normal(size=s.shape) * 0.1), shapes
))
samples, state = nt.optimize_kl(
    lh,
    pos,
    n_total_iterations=1,
    n_samples=2,
    key=random.PRNGKey(7),
    devices=list(mesh.devices.ravel()),
    draw_linear_kwargs=dict(cg_kwargs=dict(absdelta=1e-6, maxiter=30)),
    kl_kwargs=dict(minimize_kwargs=dict(xtol=1e-5, maxiter=5)),
    sample_mode="linear_resample",
    odir=None,
)
fields = [np.asarray(cf(s.tree if hasattr(s, "tree") else s)) for s in samples]
e = float(np.mean([np.sum(f**2) for f in fields]))
assert np.isfinite(e), e
print(f"proc {proc_id}: ok, E={e:.4e}", flush=True)
"""


@pytest.mark.skipif(GATED, reason="set NIFTY_TPU_MULTIPROC=1 (spawns 2 processes)")
def test_two_process_distributed(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: ok" in out, out
