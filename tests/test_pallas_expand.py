"""Routing-network expansion: offline Clos router + Pallas kernels.

The numpy simulator in ops/route.py executes the exact op sequence of the
Pallas kernels; interpret-mode pallas_call cross-checks the kernels
themselves on CPU.  On-TPU execution is covered by the device lane
(tests/test_tpu_device.py) and bench.py.
"""

import numpy as np
import pytest
from jax import numpy as jnp

from nifty_tpu.ops.route import (
    build_expand_plan,
    euler_color,
    simulate_forward,
    simulate_transpose,
)


def _random_case(P, U, seed):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, U, P)
    idx[rng.integers(0, P, min(U, P))] = np.arange(min(U, P))
    return idx, rng


@pytest.mark.parametrize("P,U", [(5000, 3000), (2000, 1999), (300, 7)])
def test_euler_color_proper(P, U):
    idx, rng = _random_case(P, U, 1)
    src = idx // 8 % 64
    dst = np.arange(P) // 8 % 64
    # thin to degree <= 128
    keep = np.zeros(P, bool)
    cnt_s = np.zeros(64, int)
    cnt_d = np.zeros(64, int)
    for e in range(P):
        if cnt_s[src[e]] < 128 and cnt_d[dst[e]] < 128:
            keep[e] = True
            cnt_s[src[e]] += 1
            cnt_d[dst[e]] += 1
    src, dst = src[keep], dst[keep]
    colors = euler_color(src, dst, 64, 64, 128)
    # properness asserted inside euler_color; check range
    assert colors.min() >= 0 and colors.max() < 128


@pytest.mark.parametrize(
    "P,U,seed", [(5000, 3000, 0), (2000, 1999, 1), (300, 7, 2), (40000, 9000, 3)]
)
def test_simulator_exact(P, U, seed):
    idx, rng = _random_case(P, U, seed)
    plan = build_expand_plan(idx, U)
    tab = rng.standard_normal(U)
    assert np.abs(simulate_forward(plan, tab) - tab[idx]).max() == 0.0
    cot = rng.standard_normal(P)
    ref = np.zeros(U)
    np.add.at(ref, idx, cot)
    err = np.abs(simulate_transpose(plan, cot) - ref).max()
    assert err < 1e-10 * max(np.abs(ref).max(), 1.0)


def test_pallas_kernels_interpret_mode():
    from nifty_tpu.ops import pallas_expand as pe

    idx, rng = _random_case(40000, 9000, 4)
    plan = build_expand_plan(idx, 9000)
    tab = rng.standard_normal(9000).astype(np.float32)
    out = np.asarray(pe.expand_forward(plan, jnp.asarray(tab), interpret=True))
    assert np.abs(out - tab[idx]).max() == 0.0
    cot = rng.standard_normal(40000).astype(np.float32)
    tc = np.asarray(pe.expand_transpose(plan, jnp.asarray(cot), interpret=True))
    ref = np.zeros(9000, np.float32)
    np.add.at(ref, idx, cot)
    assert np.abs(tc - ref).max() / np.abs(ref).max() < 1e-6


def test_real_layout_1280_simulator():
    """The actual 1280² exact-spectrum layout routes exactly (slow-ish:
    ~10 s plan build)."""
    import jax

    from nifty_tpu.models.correlated_field import make_grid
    from nifty_tpu.ops.mode_expand import build_expand_layout

    n = 1280
    g = make_grid((n, n), 1.0 / n, "fourier")
    pd = np.asarray(g.harmonic_grid.power_distributor, dtype=np.int64)
    core = pd[tuple(slice(0, s // 2 + 1) for s in pd.shape)]
    packed, layout = build_expand_layout(
        core, int(g.harmonic_grid.mode_lengths.size)
    )
    idx = np.asarray(packed).ravel()
    plan = build_expand_plan(idx, layout.n_unique)
    rng = np.random.default_rng(0)
    tab = rng.standard_normal(layout.n_unique)
    assert np.abs(simulate_forward(plan, tab) - tab[idx]).max() == 0.0
    cot = rng.standard_normal(idx.size)
    ref = np.zeros(layout.n_unique)
    np.add.at(ref, idx, cot)
    err = np.abs(simulate_transpose(plan, cot) - ref).max()
    assert err < 1e-10 * np.abs(ref).max()


def test_cf_exact_path_through_network_interpret():
    """End-to-end: a small exact-spectrum CorrelatedField evaluated with
    the expansion network (interpret mode) matches the XLA gather path —
    forward, jvp, and vjp (the metric's ingredients)."""
    import jax

    import nifty_tpu as nt
    from nifty_tpu import config as cfg
    from nifty_tpu.ops import mode_expand as me

    def build():
        cfm = nt.CorrelatedFieldMaker("cf")
        cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
        cfm.add_fluctuations(
            (48, 48),
            distances=1.0 / 48,
            fluctuations=(1.0, 5e-1),
            loglogavgslope=(-3.0, 2e-1),
            flexibility=(1e0, 2e-1),
        )
        return cfm.finalize()

    with jax.enable_x64(False):
        cf_ref = build()
        from jax import random

        pos = cf_ref.init(random.PRNGKey(0))
        tan = cf_ref.init(random.PRNGKey(1))
        out_ref = np.asarray(cf_ref(pos))
        _, jvp_ref = jax.jvp(cf_ref, (pos,), (tan,))
        _, vjpf = jax.vjp(cf_ref, pos)
        cot = random_cot = jnp.asarray(
            np.random.default_rng(2).standard_normal(out_ref.shape),
            jnp.float32,
        )
        vjp_ref = vjpf(cot)[0]

        cfg.update("expand_network", "interpret")
        try:
            cf_net = build()
            assert me._NETWORK_PLANS, "network plan was not registered"
            out_net = np.asarray(cf_net(pos))
            np.testing.assert_allclose(out_net, out_ref, atol=2e-5)
            _, jvp_net = jax.jvp(cf_net, (pos,), (tan,))
            np.testing.assert_allclose(
                np.asarray(jvp_net), np.asarray(jvp_ref), atol=2e-5
            )
            _, vjpf_net = jax.vjp(cf_net, pos)
            vjp_net = vjpf_net(cot)[0]
            for k in vjp_ref:
                np.testing.assert_allclose(
                    np.asarray(vjp_net[k]),
                    np.asarray(vjp_ref[k]),
                    atol=2e-4,
                    err_msg=k,
                )
        finally:
            cfg.update("expand_network", "auto")
            me._NETWORK_PLANS.clear()


def test_vmapped_metric_never_batches_network_kernels():
    """A raw Pallas call in the linearized jaxpr gets lifted by the
    default pallas batching rule under vmap (a prepended grid axis) —
    which OOMs scoped VMEM for tall networks (observed on-chip at
    4096²-exact, H=22016).  The flat expand/collapse primitives must
    therefore fall back to the XLA paths whenever the value is batched:
    no pallas_call may survive in a vmapped metric jaxpr."""
    import jax
    import numpy as np
    from jax import numpy as jnp

    import nifty_tpu as nt
    from nifty_tpu import config as nt_config

    nt_config.update("expand_network", "interpret")
    try:
        cfm = nt.CorrelatedFieldMaker("cf")
        cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
        cfm.add_fluctuations(
            (17, 17), distances=1.0 / 17,
            fluctuations=(1.0, 5e-1), loglogavgslope=(-3.0, 2e-1),
            flexibility=(1e0, 2e-1),
        )
        cf = cfm.finalize()
        data = jnp.zeros((17, 17), jnp.float32)
        lh = nt.Gaussian(data, noise_std_inv=lambda x: 2.0 * x).amend(cf)
        pos = nt.Vector(
            jax.tree_util.tree_map(
                lambda v: jnp.asarray(v, jnp.float32), cf.init(jax.random.PRNGKey(0))
            )
        )
        tans = jax.tree_util.tree_map(
            lambda v: jnp.stack([v, 2.0 * v]), pos.tree
        )
        with jax.enable_x64(False):
            vm = jax.vmap(lambda t: lh.metric(pos, nt.Vector(t)))
            jaxpr = jax.make_jaxpr(vm)(tans)
            assert "pallas" not in str(jaxpr).lower()
            out = vm(tans)  # and it runs
            assert np.all(np.isfinite(jax.tree_util.tree_leaves(out.tree)[0]))
            # the expand/collapse machinery went through the primitives
            # (whose impls choose pallas-vs-XLA at lowering time)
            assert "nifty_mode" in str(jaxpr)
            # batched equals per-sample unbatched (which rides the network)
            single = jax.jit(lambda t: lh.metric(pos, nt.Vector(t)))
            for i in range(2):
                want = single({k: v[i] for k, v in tans.items()})
                den = max(
                    float(np.abs(np.asarray(l)).max())
                    for l in jax.tree_util.tree_leaves(want.tree)
                )
                for k in tans:
                    a = np.asarray(out.tree[k][i])
                    b = np.asarray(want.tree[k])
                    assert np.abs(a - b).max() / den < 1e-4, k
    finally:
        nt_config.update("expand_network", "auto")
