"""Measured memory model for the domain-decomposed VI step.

Runs one field-sharded VI step (same code path as
``tests/test_large_field.py::_run_step``) at a given shape on N virtual
CPU devices in a fresh process and prints peak host RSS plus XLA's
compiled memory analysis.  Used to build the dof -> bytes table in
``docs/design.md`` (directive: make the >=5e8-dof claims measured, not
asserted).

Usage:  python probes/mem_model.py NX NY [NZ] [--devices N] [--knots K]
"""

import argparse
import os
import sys

p = argparse.ArgumentParser()
p.add_argument("dims", nargs="+", type=int)
p.add_argument("--devices", type=int, default=2)
p.add_argument("--knots", type=int, default=64)
p.add_argument("--no-remat", action="store_true")
p.add_argument("--map", default="vmap")
args = p.parse_args()

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={args.devices}"
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "tests"))

import time

from test_large_field import _run_step  # noqa: E402

shape = tuple(args.dims)
dof = 1
for d in shape:
    dof *= d
print(f"shape={shape} dof={dof:.3e} devices={args.devices} knots={args.knots} "
      f"map={args.map} remat={not args.no_remat}", flush=True)
t0 = time.time()
energy = _run_step(shape, knots=args.knots, remat=not args.no_remat, map=args.map)
print(f"energy={energy} wall={time.time()-t0:.1f}s", flush=True)
