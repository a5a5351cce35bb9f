"""Domain-decomposed inference: a correlated field sharded over a device
mesh (the ≥10⁹-parameter execution mode).

The field's leading axis is row-sharded over the mesh axis ``"fx"``: the
Hartley transform runs as a pencil FFT with explicit ``all_to_all``
transposes, every reduction in CG/Newton-CG lowers to a ``psum``, and
per-device memory is O(N/p).  Run on any multi-device platform; on a
CPU-only machine set::

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        NIFTY_TPU_DEMO_CPU=1 python demos/6_field_sharded.py
"""

import os

import jax

if os.environ.get("NIFTY_TPU_DEMO_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)

import numpy as np
from jax import numpy as jnp
from jax import random
from jax.sharding import Mesh

import nifty_tpu as nt


def main():
    n_dev = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()), ("fx",))
    shape = (32 * n_dev, 64)
    print(f"devices: {n_dev}, field: {shape} ({np.prod(shape):.0f} dof)")

    cfm = nt.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(
        shape,
        distances=1.0 / shape[0],
        fluctuations=(1.0, 5e-1),
        loglogavgslope=(-3.0, 2e-1),
        flexibility=(1e0, 2e-1),
    )
    # the one line that turns on domain decomposition
    cf = cfm.finalize(field_mesh=mesh)

    key = random.PRNGKey(42)
    k_truth, k_noise, k_opt = random.split(key, 3)
    pos_truth = jax.device_put(cf.init(k_truth), cf.position_sharding())
    truth = cf(pos_truth)
    data = truth + 0.2 * random.normal(k_noise, shape)

    lh = nt.Gaussian(data, noise_std_inv=lambda x: 5.0 * x).amend(cf)
    pos0 = jax.tree_util.tree_map(lambda x: 0.1 * x, cf.init(random.PRNGKey(0)))

    samples, state = nt.optimize_kl(
        lh,
        pos0,
        n_total_iterations=4,
        n_samples=2,
        key=k_opt,
        draw_linear_kwargs=dict(cg_kwargs=dict(absdelta=1e-6, maxiter=60)),
        kl_kwargs=dict(minimize_kwargs=dict(xtol=1e-6, maxiter=20)),
        sample_mode="linear_resample",
        odir=None,
        position_sharding=cf.position_sharding(),
    )

    mean = jnp.mean(jnp.stack([cf(s) for s in samples]), axis=0)
    xi = samples.pos["cfxi"] if not hasattr(samples.pos, "tree") else samples.pos.tree["cfxi"]
    print("posterior-mean xi sharding:", xi.sharding.spec)
    nrmse = float(
        jnp.sqrt(jnp.mean((mean - truth) ** 2) / jnp.mean(truth**2))
    )
    print(f"nrmse vs truth: {nrmse:.3f}")
    assert nrmse < 0.6


if __name__ == "__main__":
    main()
