"""Per-component XLA temp-memory breakdown for the field-sharded VI step.

Lowers each phase of the step separately and prints its compiled
temp_size — identifies which phase sets the peak that the memory model in
docs/design.md must budget for.

Usage: python probes/mem_breakdown.py NX NY NZ [--devices N] [--knots K]
"""

import argparse
import os
import sys

p = argparse.ArgumentParser()
p.add_argument("dims", nargs="+", type=int)
p.add_argument("--devices", type=int, default=2)
p.add_argument("--knots", type=int, default=64)
p.add_argument("--no-remat", action="store_true")
args = p.parse_args()

os.environ["XLA_FLAGS"] = (
    f" --xla_force_host_platform_device_count={args.devices}"
)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from functools import partial

import numpy as np
from jax import numpy as jnp
from jax import random
from jax.sharding import Mesh, NamedSharding, PartitionSpec

import nifty_tpu as nt
from nifty_tpu.optimize_kl import _kl_met, _kl_vg

shape = tuple(args.dims)
mesh = Mesh(np.asarray(jax.devices()), ("fx",))
cfm = nt.CorrelatedFieldMaker("cf")
cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1e-1, 3e-2))
cfm.add_fluctuations(
    shape,
    distances=1.0 / shape[0],
    fluctuations=(1.0, 5e-1),
    loglogavgslope=(-3.0, 2e-1),
    flexibility=(1e0, 2e-1),
    n_mode_knots=args.knots,
)
cf = cfm.finalize(field_mesh=mesh)
fwd = cf if args.no_remat else nt.RematModel(cf)
data_sharding = NamedSharding(mesh, PartitionSpec("fx", *(None,) * (len(shape) - 1)))
data = jax.jit(lambda: jnp.zeros(shape, jnp.float32), out_shardings=data_sharding)()
lh = nt.Gaussian(data, noise_std_inv=lambda x: 3.0 * x).amend(fwd)
pos = nt.Vector(
    jax.jit(cf.init, out_shardings=cf.position_sharding())(random.PRNGKey(0))
)
keys = random.split(random.PRNGKey(1), 1)

dof = int(np.prod(shape))


def report(name, fn, *a, **kw):
    try:
        ma = jax.jit(fn, **kw).lower(*a).compile().memory_analysis()
        print(
            f"{name:32s} temp/dev {ma.temp_size_in_bytes/2**30:7.2f} GiB  "
            f"args {ma.argument_size_in_bytes/2**30:6.2f}  "
            f"out {ma.output_size_in_bytes/2**30:6.2f}  "
            f"[{ma.temp_size_in_bytes*args.devices/dof:6.1f} B/dof total]",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        print(f"{name:32s} FAILED: {e!r}", flush=True)


report("forward", lambda p: cf(p), pos)
report("forward remat", lambda p: fwd(p), pos)
report("energy vg", jax.value_and_grad(lambda p: lh(p)), pos)
report("metric apply", lambda p, t: lh.metric(p, t), pos, pos)


def draw(p, k):
    return nt.draw_linear_residual(
        lh, p, k, cg=nt.static_cg,
        cg_kwargs=dict(maxiter=3, miniter=3, resnorm=-1.0),
    )


report("draw_linear_residual x1", lambda p, k: jax.vmap(draw, in_axes=(None, 0))(p, k), pos, keys)

smpls, _ = jax.jit(lambda p, k: jax.vmap(draw, in_axes=(None, 0))(p, k))(pos, keys)
smpls = jax.tree_util.tree_map(lambda s: jnp.concatenate([s, -s], axis=0), smpls)
samples = nt.Samples(pos=pos, samples=smpls, keys=keys)


def ncg(p):
    res = nt.static_newton_cg(
        x0=p,
        fun_and_grad=partial(_kl_vg, lh, primals_samples=samples),
        hessp=partial(_kl_met, lh, primals_samples=samples),
        maxiter=1,
        cg_kwargs=dict(maxiter=2, miniter=2, resnorm=-1.0),
    )
    return res.x, res.fun


report("newton_cg kl step", ncg, pos)
report("kl_vg", partial(_kl_vg, lh, primals_samples=samples), pos)
report("kl_met", partial(_kl_met, lh, primals_samples=samples), pos, pos)
