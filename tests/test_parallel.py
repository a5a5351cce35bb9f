"""Device-mesh parallelism: sharded FFT/Hartley on a virtual CPU mesh."""

import jax
import numpy as np
import pytest
from jax import numpy as jnp
from jax import random
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nifty_tpu.ops.fft import hartley
from nifty_tpu.parallel.fft import sharded_fft2, sharded_hartley2
from nifty_tpu.parallel.mesh import sample_mesh


def _mesh(n=None, name="fx"):
    devs = jax.devices()
    n = len(devs) if n is None else n
    return Mesh(np.asarray(devs[:n]), (name,))


def test_sharded_fft2_matches_local():
    mesh = _mesh()
    p = len(mesh.devices.ravel())
    n0, n1 = 8 * p, 16
    x = random.normal(random.PRNGKey(0), (n0, n1))
    xs = jax.device_put(x, NamedSharding(mesh, P("fx", None)))
    out = jax.jit(lambda a: sharded_fft2(a, mesh))(xs)
    ref = np.fft.fft2(np.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-8)
    # output stays row-sharded
    assert out.sharding.spec == P("fx", None)


def test_sharded_hartley2_matches_local():
    mesh = _mesh()
    p = len(mesh.devices.ravel())
    n0, n1 = 4 * p, 2 * p
    x = random.normal(random.PRNGKey(1), (n0, n1))
    xs = jax.device_put(x, NamedSharding(mesh, P("fx", None)))
    out = jax.jit(lambda a: sharded_hartley2(a, mesh))(xs)
    ref = np.asarray(hartley(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-8)


def test_sharded_hartley_self_inverse():
    mesh = _mesh()
    p = len(mesh.devices.ravel())
    n0, n1 = 4 * p, 2 * p
    x = random.normal(random.PRNGKey(2), (n0, n1))
    xs = jax.device_put(x, NamedSharding(mesh, P("fx", None)))
    twice = jax.jit(
        lambda a: sharded_hartley2(sharded_hartley2(a, mesh), mesh)
    )(xs)
    np.testing.assert_allclose(np.asarray(twice), np.asarray(x) * n0 * n1, atol=1e-6)


def test_sharded_cf_forward_consistency():
    """A 2-D correlated field evaluated with the harmonic transform
    sharded over the mesh matches the single-device forward."""
    import nifty_tpu as nt

    mesh = _mesh()
    p = len(mesh.devices.ravel())
    shape = (8 * p, 32)
    cfm = nt.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(0.0, (1e-1, 3e-2))
    cfm.add_fluctuations(shape, 1.0 / shape[0], (1.0, 0.5), (-3.0, 0.2))
    cf = cfm.finalize()
    pos = cf.init(random.PRNGKey(3))
    local = np.asarray(cf(pos))

    # same model maths, harmonic transform replaced by the sharded one
    amp = cf.normalized_amplitudes[0]
    grid = cf.target_grids[0]
    distributor = jnp.asarray(grid.harmonic_grid.power_distributor)
    azm = cfm.azm

    def sharded_cf(x):
        cf_h = azm(x) * amp(x)[distributor] * x["cfxi"]
        return (1.0 / grid.total_volume) * sharded_hartley2(cf_h, mesh)

    xi = jax.device_put(pos["cfxi"], NamedSharding(mesh, P("fx", None)))
    pos_sharded = dict(pos, cfxi=xi)
    out = jax.jit(sharded_cf)(pos_sharded)
    np.testing.assert_allclose(np.asarray(out), local, atol=1e-8)


def test_multihost_helpers_single_host():
    from nifty_tpu.parallel import global_mesh, host_local_slice

    m = global_mesh(("samples",))
    assert m.devices.size == len(jax.devices())
    m2 = global_mesh(("samples", "fx"), (2, len(jax.devices()) // 2))
    assert m2.axis_names == ("samples", "fx")
    # shareRange semantics
    ranges = [host_local_slice(10, count=3, index=i) for i in range(3)]
    assert ranges == [(0, 4), (4, 7), (7, 10)]
    assert host_local_slice(5, count=1, index=0) == (0, 5)


# --- integrated field-axis sharding (finalize(field_mesh=...)) ---------------


def _build_cf(shape, fm=None, K=None):
    import nifty_tpu as nt

    cfm = nt.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(0.5, (1e-1, 3e-2))
    cfm.add_fluctuations(
        shape, 1.0 / shape[0], (1.0, 0.5), (-3.0, 0.2), (1.0, 0.2),
        n_mode_knots=K,
    )
    return cfm.finalize(field_mesh=fm)


@pytest.mark.parametrize("K", [None, 8])
def test_field_sharded_cf_forward_equality(K):
    """finalize(field_mesh=...) reproduces the unsharded forward exactly
    (pencil-FFT Hartley + sharded amplitude expansion)."""
    mesh = _mesh()
    p = len(mesh.devices.ravel())
    shape = (4 * p, 2 * p)
    cf = _build_cf(shape, K=K)
    cfs = _build_cf(shape, fm=mesh, K=K)
    pos = cf.init(random.PRNGKey(0))
    pos_s = jax.device_put(pos, cfs.position_sharding())
    out = jax.jit(cfs)(pos_s)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(cf(pos)), atol=1e-12
    )
    # the output field is genuinely row-sharded, not gathered
    assert out.sharding.spec[0] == "fx"


def test_field_sharded_cf_3d_forward_equality():
    mesh = _mesh()
    p = len(mesh.devices.ravel())
    shape = (2 * p, p, 4)
    cf = _build_cf(shape)
    cfs = _build_cf(shape, fm=mesh)
    pos = cf.init(random.PRNGKey(4))
    pos_s = jax.device_put(pos, cfs.position_sharding())
    np.testing.assert_allclose(
        np.asarray(jax.jit(cfs)(pos_s)), np.asarray(cf(pos)), atol=1e-12
    )


def test_field_sharded_metric_equality():
    import nifty_tpu as nt

    mesh = _mesh()
    p = len(mesh.devices.ravel())
    shape = (4 * p, 2 * p)
    cf = _build_cf(shape)
    cfs = _build_cf(shape, fm=mesh)
    data = jnp.asarray(
        np.random.default_rng(0).poisson(1.0, shape).astype(np.int32)
    )
    lh = nt.Poissonian(data).amend(nt.ChainModel(jnp.exp, cf))
    lhs = nt.Poissonian(data).amend(nt.ChainModel(jnp.exp, cfs))
    pos = cf.init(random.PRNGKey(0))
    tan = cf.init(random.PRNGKey(1))
    pos_s = jax.device_put(pos, cfs.position_sharding())
    tan_s = jax.device_put(tan, cfs.position_sharding())
    m_ref = lh.metric(pos, tan)
    m_s = jax.jit(lhs.metric)(pos_s, tan_s)
    for a, b in zip(
        jax.tree_util.tree_leaves(m_s), jax.tree_util.tree_leaves(m_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)


def test_field_sharded_optimize_kl_matches_unsharded():
    """One full VI iteration (sampling + KL Newton-CG) with the field
    domain-decomposed over the mesh equals the single-device run."""
    import nifty_tpu as nt

    mesh = _mesh()
    p = len(mesh.devices.ravel())
    shape = (4 * p, 2 * p)
    cf = _build_cf(shape)
    cfs = _build_cf(shape, fm=mesh)
    rng = np.random.default_rng(5)
    pos_true = cf.init(random.PRNGKey(10))
    data = jnp.asarray(np.asarray(cf(pos_true)) + 0.2 * rng.normal(size=shape))

    def run(model, position_sharding=None):
        lh = nt.Gaussian(data, noise_std_inv=lambda x: 5.0 * x).amend(model)
        pos0 = jax.tree_util.tree_map(
            lambda x: 0.1 * x, model.init(random.PRNGKey(0))
        )
        samples, state = nt.optimize_kl(
            lh,
            pos0,
            n_total_iterations=1,
            n_samples=2,
            key=random.PRNGKey(42),
            draw_linear_kwargs=dict(cg_kwargs=dict(absdelta=1e-10, maxiter=100)),
            kl_kwargs=dict(minimize_kwargs=dict(xtol=1e-8, maxiter=10)),
            sample_mode="linear_resample",
            odir=None,
            position_sharding=position_sharding,
        )
        return samples

    s_ref = run(cf)
    s_shd = run(cfs, position_sharding=cfs.position_sharding())
    for a, b in zip(
        jax.tree_util.tree_leaves(s_ref.pos),
        jax.tree_util.tree_leaves(s_shd.pos),
    ):
        # iterative solvers accumulate reduction-order fp differences;
        # after one full VI iteration the positions agree to ~1e-5
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_combined_sample_field_mesh_optimize_kl():
    """Full 2-D decomposition: samples over one mesh axis, the field over
    the other (partial-manual pencil FFT); equal to the unsharded run."""
    import nifty_tpu as nt

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    mesh2 = Mesh(np.asarray(devs).reshape(2, 4), ("samples", "fx"))
    shape = (16, 8)

    def build(fm=None):
        return _build_cf(shape, fm=fm)

    cf, cfs = build(), build(mesh2)
    rng = np.random.default_rng(5)
    truth = np.asarray(cf(cf.init(random.PRNGKey(10))))
    data = jnp.asarray(truth + 0.2 * rng.normal(size=shape))

    def run(model, position_sharding=None):
        lh = nt.Gaussian(data, noise_std_inv=lambda x: 5.0 * x).amend(model)
        pos0 = jax.tree_util.tree_map(
            lambda x: 0.1 * x, model.init(random.PRNGKey(0))
        )
        samples, _ = nt.optimize_kl(
            lh,
            pos0,
            n_total_iterations=1,
            n_samples=2,
            key=random.PRNGKey(42),
            draw_linear_kwargs=dict(cg_kwargs=dict(absdelta=1e-10, maxiter=100)),
            kl_kwargs=dict(minimize_kwargs=dict(xtol=1e-8, maxiter=10)),
            sample_mode="linear_resample",
            odir=None,
            position_sharding=position_sharding,
        )
        return samples

    s_ref = run(cf)
    s_shd = run(cfs, position_sharding=cfs.position_sharding())
    for a, b in zip(
        jax.tree_util.tree_leaves(s_ref.pos),
        jax.tree_util.tree_leaves(s_shd.pos),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)
    # the stacked residual samples live on the 2-D mesh
    xi_s = s_shd._samples["cfxi"]
    assert set(xi_s.sharding.mesh.axis_names) == {"samples", "fx"}
