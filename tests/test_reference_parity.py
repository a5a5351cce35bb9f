"""Numerical parity against the reference NIFTy library itself.

The reference checkout at /root/reference is imported directly (its
``nifty.re`` variant needs only jax) with a small importlib.metadata shim;
every test is skipped cleanly when the checkout is unavailable.  Template:
the reference's own cross-variant harness
(``misc/re/paper/minimal_benchmark.py:93-120``).

Conventions: the reference defaults to ducc's *non-canonical* Hartley
(fft.real + fft.imag); this build uses the canonical one (real − imag) —
statistically identical priors (the flip reflects the white noise), but
for bit-parity the reference is switched to canonical here.
"""

import sys

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

from jax import numpy as jnp
from jax import random

import nifty_tpu as nt


def _import_reference():
    import importlib.metadata as im

    if "/root/reference" not in sys.path:
        orig = im.version

        def patched(name, _orig=orig):
            if name == "nifty":
                return "9.2.0"
            return _orig(name)

        im.version = patched
        sys.path.insert(0, "/root/reference")
    from nifty import config as nifty_config

    nifty_config.update("hartley_convention", "canonical_hartley")
    import nifty.re as jft

    return jft


try:
    jft = _import_reference()
    HAVE_REF = True
except Exception:  # pragma: no cover - environment without the checkout
    jft = None
    HAVE_REF = False

pytestmark = pytest.mark.skipif(
    not HAVE_REF, reason="reference checkout not importable"
)

CFM_KW = dict(
    fluctuations=(1.0, 5e-1),
    loglogavgslope=(-3.0, 2e-1),
    flexibility=(1e0, 2e-1),
    asperity=None,
)


def _build_cfm(mod, shape, *, kind="amplitude", offset_mean=1.0, **kw):
    cfm = mod.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(
        offset_mean=offset_mean, offset_std=(1e-1, 3e-2)
    )
    cfm.add_fluctuations(
        shape, distances=1.0 / shape[0], non_parametric_kind=kind, **CFM_KW, **kw
    )
    return cfm.finalize()


def _as_dict(tree):
    return tree.tree if hasattr(tree, "tree") else tree


@pytest.mark.parametrize("shape", [(24, 24), (15, 10), (32,)])
@pytest.mark.parametrize("kind", ["amplitude", "power"])
def test_cfm_forward_equality(shape, kind):
    """Identical latents → identical correlated fields (exact unique-|k|
    path; ref ``nifty/re/correlated_field.py:850-918``)."""
    cf_r = _build_cfm(jft, shape, kind=kind)
    cf_o = _build_cfm(nt, shape, kind=kind)
    pos = cf_r.init(random.PRNGKey(42))
    out_r = np.asarray(cf_r(pos))
    out_o = np.asarray(cf_o(_as_dict(pos)))
    np.testing.assert_allclose(out_o, out_r, rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("kind", ["amplitude", "power"])
def test_cfm_amplitude_equality(kind):
    cf_r = _build_cfm(jft, (24, 24), kind=kind)
    cf_o = _build_cfm(nt, (24, 24), kind=kind)
    pos = cf_r.init(random.PRNGKey(7))
    a_r = np.asarray(cf_r.normalized_amplitudes[0](pos))
    a_o = np.asarray(cf_o.normalized_amplitudes[0](_as_dict(pos)))
    np.testing.assert_allclose(a_o, a_r, rtol=1e-13, atol=0)


def test_cfm_matern_forward_equality():
    def build(mod):
        cfm = mod.CorrelatedFieldMaker("cf")
        cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1e-1, 3e-2))
        cfm.add_fluctuations_matern(
            (20, 20),
            distances=1.0 / 20,
            scale=(1.0, 0.3),
            cutoff=(2.0, 1.0),
            loglogslope=(-4.0, 0.5),
            renormalize_amplitude=True,
        )
        return cfm.finalize()

    cf_r, cf_o = build(jft), build(nt)
    pos = cf_r.init(random.PRNGKey(5))
    np.testing.assert_allclose(
        np.asarray(cf_o(_as_dict(pos))),
        np.asarray(cf_r(pos)),
        rtol=1e-12,
        atol=1e-12,
    )


def _lh_pairs(key):
    """(ours, reference) likelihood pairs on shared data."""
    rng = np.random.default_rng(99)
    shp = (12,)
    data = jnp.asarray(rng.normal(size=shp))
    counts = jnp.asarray(rng.poisson(3.0, size=shp).astype(np.int64))
    inv_std = jnp.asarray(np.exp(rng.normal(size=shp)))
    builders = {
        "gaussian": lambda mod: mod.Gaussian(
            data, noise_std_inv=lambda x: inv_std * x
        ),
        "poissonian": lambda mod: mod.Poissonian(counts),
        "studentt": lambda mod: mod.StudentT(
            data, 4.0, noise_std_inv=lambda x: inv_std * x
        ),
        "varcov": lambda mod: mod.VariableCovarianceGaussian(data),
    }
    b = builders[key]
    return (b(nt), b(jft)), rng


@pytest.mark.parametrize(
    "which", ["gaussian", "poissonian", "studentt", "varcov"]
)
def test_likelihood_energy_and_metric_equality(which):
    """energy / metric / left-sqrt-metric agree with the reference on
    shared inputs (ref ``nifty/re/likelihood_impl.py``)."""
    (lh_o, lh_r), rng = _lh_pairs(which)
    shp = (12,)
    if which == "varcov":
        p = (
            jnp.asarray(rng.normal(size=shp)),
            jnp.asarray(np.exp(rng.normal(size=shp))),
        )
        t = (
            jnp.asarray(rng.normal(size=shp)),
            jnp.asarray(rng.normal(size=shp)),
        )
    else:
        p = jnp.asarray(np.abs(rng.normal(size=shp)) + 0.5)
        t = jnp.asarray(rng.normal(size=shp))
    np.testing.assert_allclose(
        float(lh_o.energy(p)), float(lh_r.energy(p)), rtol=1e-13
    )
    m_o = lh_o.metric(p, t)
    m_r = lh_r.metric(p, t)
    for a, b in zip(
        jax.tree_util.tree_leaves(m_o), jax.tree_util.tree_leaves(m_r)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_wiener_filter_posterior_equality():
    """The (deterministic) Wiener-filter posterior mean matches the
    reference's for the same linear model and data
    (ref ``nifty/re/evi.py:399``)."""
    shape = (16, 16)
    cf_r = _build_cfm(jft, shape, offset_mean=0.0)
    cf_o = _build_cfm(nt, shape, offset_mean=0.0)
    key = random.PRNGKey(1)
    pos = cf_r.init(key)
    rng = np.random.default_rng(3)
    data = jnp.asarray(
        np.asarray(cf_r(pos)) + 0.1 * rng.normal(size=shape)
    )
    noise_std_inv = 10.0

    lh_r = jft.Gaussian(data, noise_std_inv=lambda x: noise_std_inv * x).amend(
        cf_r
    )
    lh_o = nt.Gaussian(data, noise_std_inv=lambda x: noise_std_inv * x).amend(
        cf_o
    )

    # deterministic comparison: apply (metric + 1)^{-1} to the same vector
    # via CG from zero — the core of the Wiener-filter/MGVI sampling solve
    probe = cf_r.init(random.PRNGKey(8))
    probe_d = _as_dict(probe)
    zero_r = jax.tree_util.tree_map(jnp.zeros_like, pos)
    pos_v = jft.Vector(_as_dict(pos))
    met_r = lambda x: jax.tree_util.tree_map(
        jnp.add, lh_r.metric(pos_v, x), x
    )
    met_o = lambda x: jax.tree_util.tree_map(
        jnp.add, lh_o.metric(_as_dict(pos), x), x
    )
    from nifty.re import cg as ref_cg

    probe = jft.Vector(_as_dict(probe))
    zero_r = jft.Vector(_as_dict(zero_r))
    res_r = ref_cg(met_r, probe, x0=zero_r, resnorm=1e-10, maxiter=500)
    sol_r = res_r[0] if isinstance(res_r, tuple) else res_r.x
    sol_o = nt.cg(
        met_o, probe_d, x0=_as_dict(zero_r), resnorm=1e-10, maxiter=500
    ).x
    for a, b in zip(
        jax.tree_util.tree_leaves(sol_o), jax.tree_util.tree_leaves(sol_r)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_posterior_moments_match_within_mc_error():
    """Full-loop check: MGVI posterior moments of a small 0_intro-class
    problem agree between the builds within Monte-Carlo error
    (ref ``demos/re/0_intro.py``; both runs use their own RNG paths, so
    agreement is statistical, not bitwise)."""
    shape = (16, 16)
    key = random.PRNGKey(11)

    def run(mod, build_cf):
        cf = build_cf(mod)
        k_data, k_opt = random.split(key)
        pos_true = cf.init(k_data)
        truth = np.asarray(cf(pos_true if mod is jft else _as_dict(pos_true)))
        rng = np.random.default_rng(17)
        data = jnp.asarray(truth + 0.25 * rng.normal(size=shape))
        lh = mod.Gaussian(data, noise_std_inv=lambda x: 4.0 * x).amend(cf)
        pos0 = jax.tree_util.tree_map(
            lambda x: 0.1 * x, _as_dict(cf.init(random.PRNGKey(0)))
        )
        if mod is jft:
            pos0 = jft.Vector(pos0)
        samples, state = mod.optimize_kl(
            lh,
            pos0,
            n_total_iterations=4,
            n_samples=4,
            key=k_opt,
            draw_linear_kwargs=dict(
                cg_kwargs=dict(absdelta=1e-6, maxiter=100)
            ),
            kl_kwargs=dict(minimize_kwargs=dict(xtol=1e-6, maxiter=20)),
            sample_mode="linear_resample",
            odir=None,
        )
        fields = np.stack(
            [np.asarray(cf(s if mod is jft else _as_dict(s))) for s in samples]
        )
        return fields.mean(axis=0), fields.std(axis=0), truth

    m_r, s_r, truth = run(jft, lambda mod: _build_cfm(mod, shape))
    m_o, s_o, _ = run(nt, lambda mod: _build_cfm(mod, shape))
    # posterior means agree within a few posterior stds everywhere and the
    # global moments match
    scale = np.maximum(s_r, 1e-3)
    assert np.max(np.abs(m_r - m_o) / scale) < 5.0
    assert abs(m_r.mean() - m_o.mean()) < 0.1 * max(abs(m_r).max(), 1.0)
    assert 0.5 < (s_o.mean() / s_r.mean()) < 2.0


def test_nd_variable_covariance_gaussian_parity():
    """Full-covariance Gaussian: energy/metric/lsm match the reference
    (ref ``nifty/re/likelihood_impl.py:376``)."""
    rng = np.random.default_rng(0)
    n, d = 5, 3
    data = jnp.asarray(rng.normal(size=(n, d)))
    for covariance in (True, False):
        lh_o = nt.NDVariableCovarianceGaussian(data, covariance=covariance)
        lh_r = jft.NDVariableCovarianceGaussian(data, covariance=covariance)
        m = rng.normal(size=(n, d, d))
        mat = jnp.asarray(m @ np.swapaxes(m, -1, -2) + 2 * np.eye(d))
        mean = jnp.asarray(rng.normal(size=(n, d)))
        p = (mean, mat)
        np.testing.assert_allclose(
            float(lh_o.energy(p)), float(lh_r.energy(p)), rtol=1e-12
        )
        tm = jnp.asarray(rng.normal(size=(n, d)))
        tM = rng.normal(size=(n, d, d))
        tM = jnp.asarray(tM + np.swapaxes(tM, -1, -2))
        t = (tm, tM)
        for a, b in zip(
            jax.tree_util.tree_leaves(lh_o.metric(p, t)),
            jax.tree_util.tree_leaves(lh_r.metric(p, t)),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)
        for a, b in zip(
            jax.tree_util.tree_leaves(lh_o.left_sqrt_metric(p, t)),
            jax.tree_util.tree_leaves(lh_r.left_sqrt_metric(p, t)),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_elbo_parity():
    """estimate_evidence_lower_bound agrees with the reference on a shared
    model and identical samples (ref ``nifty/re/evidence_lower_bound.py:341``:
    scipy/ARPACK eigsh there, native deflated Lanczos here)."""
    shape = (12, 12)
    cf_r = _build_cfm(jft, shape)
    cf_o = _build_cfm(nt, shape)
    rng = np.random.default_rng(5)
    data = jnp.asarray(rng.normal(size=shape))
    lh_r = jft.Gaussian(data, noise_std_inv=lambda x: 2.0 * x).amend(cf_r)
    lh_o = nt.Gaussian(data, noise_std_inv=lambda x: 2.0 * x).amend(cf_o)

    shapes = _as_dict(jax.eval_shape(cf_r.init, random.PRNGKey(0)))
    def draw(seed):
        r = np.random.default_rng(seed)
        return {k: jnp.asarray(r.normal(size=v.shape)) for k, v in shapes.items()}

    pos = jax.tree_util.tree_map(lambda x: 0.2 * x, draw(1))
    resid = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([0.5 * x for x in xs]), draw(2), draw(3), draw(4)
    )
    smpl_r = jft.Samples(pos=jft.Vector(pos), samples=jft.Vector(resid))
    smpl_o = nt.Samples(pos=nt.Vector(pos), samples=nt.Vector(resid))

    kw = dict(n_eigenvalues=40, min_lh_eval=1e-12, n_batches=4, verbose=False)
    es_r, st_r = jft.estimate_evidence_lower_bound(lh_r, smpl_r, **kw)
    es_o, st_o = nt.estimate_evidence_lower_bound(lh_o, smpl_o, **kw)
    np.testing.assert_allclose(np.sort(es_o), np.sort(es_r), rtol=2e-3)
    assert abs(st_o["elbo_mean"] - st_r["elbo_mean"]) < 2e-3 * abs(st_r["elbo_mean"])


def test_nuts_moments_parity():
    """NUTS chains on a shared 1-D CF posterior: posterior moments agree
    within MC error (ref ``nifty/re/hmc_oo.py:138``/``hmc.py:243``; both
    runs use their own tree-sampling RNG, so the check is statistical)."""
    import warnings

    shape = (16,)
    cf_r = _build_cfm(jft, shape)
    cf_o = _build_cfm(nt, shape)
    rng = np.random.default_rng(6)
    truth = np.asarray(cf_r(cf_r.init(random.PRNGKey(1))))
    data = jnp.asarray(truth + 0.3 * rng.normal(size=shape))
    lh_r = jft.Gaussian(data, noise_std_inv=lambda x: x / 0.3).amend(cf_r)
    lh_o = nt.Gaussian(data, noise_std_inv=lambda x: x / 0.3).amend(cf_o)

    shapes = _as_dict(jax.eval_shape(cf_r.init, random.PRNGKey(0)))
    pos0 = {k: jnp.zeros(v.shape) for k, v in shapes.items()}

    def run(mod, lh, cf):
        ham = lambda x: lh(x) + 0.5 * mod.vdot(x, x)
        p0 = mod.Vector(pos0)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            chain = mod.NUTSChain(
                potential_energy=ham,
                inverse_mass_matrix=1.0,
                position_proto=p0,
                step_size=0.25,
                max_tree_depth=10,
            )
        out, _ = chain.generate_n_samples(random.PRNGKey(42), p0, 2500)
        fields = jax.vmap(lambda s: cf(_as_dict(s)))(out.samples)
        burn = 500
        f = np.asarray(fields)[burn:]
        return f.mean(axis=0), f.std(axis=0)

    m_r, s_r = run(jft, lh_r, cf_r)
    m_o, s_o = run(nt, lh_o, cf_o)
    scale = np.maximum(np.maximum(s_r, s_o), 1e-3)
    assert np.max(np.abs(m_r - m_o) / scale) < 1.0, (m_r, m_o, scale)
    assert np.all((0.6 < s_o / s_r) & (s_o / s_r < 1.67)), s_o / s_r


def _import_reference_cl():
    """Import the reference's classical variant with a ducc0 shim (its
    C++ kernels are absent here; the LOS path never calls them)."""
    import types

    _import_reference()  # sys.path + metadata shim

    class _Shim(types.ModuleType):
        __path__ = []  # package-like: submodule imports resolve via sys.modules

        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            full = self.__name__ + "." + name
            sub = sys.modules.get(full) or _Shim(full)
            sys.modules[full] = sub
            setattr(self, name, sub)
            return sub

        def __call__(self, *a, **k):
            return 8

    if "ducc0" not in sys.modules or not isinstance(
        sys.modules["ducc0"], types.ModuleType
    ):
        pass
    ducc = sys.modules.get("ducc0")
    if ducc is None:
        ducc = _Shim("ducc0")
        sys.modules["ducc0"] = ducc
        for sub in ("misc", "misc.experimental", "fft"):
            sys.modules["ducc0." + sub] = _Shim("ducc0." + sub)
        ducc.misc = sys.modules["ducc0.misc"]
        ducc.misc.experimental = sys.modules["ducc0.misc.experimental"]
        ducc.fft = sys.modules["ducc0.fft"]
    import nifty.cl as ift

    return ift


@pytest.mark.parametrize("with_sigmas", [False, True])
def test_exact_los_matches_reference(with_sigmas):
    """ExactGridLOS reproduces the reference's sparse exact-traversal
    LOSResponse (`nifty/cl/library/los_response.py:103`) element for
    element, with and without Gaussian endpoint (parallax) uncertainty."""
    ift = _import_reference_cl()
    from nifty_tpu.los import ExactGridLOS

    shape, distances = (11, 7), (0.13, 0.23)
    extent = np.array(shape) * np.array(distances)
    rng = np.random.default_rng(42)
    n_los = 17
    starts = rng.uniform(0.05, 0.95, (n_los, 2)) * extent
    ends = rng.uniform(0.05, 0.95, (n_los, 2)) * extent
    if with_sigmas:
        lengths = np.linalg.norm(ends - starts, axis=1)
        sigmas = rng.uniform(0.02, 0.1, n_los) / lengths
    else:
        sigmas = None

    dom = ift.RGSpace(shape, distances=distances)
    R_ref = ift.LOSResponse(
        dom, starts.T, ends.T, sigmas=sigmas, truncation=3.0
    )
    R = ExactGridLOS(
        starts, ends, shape=shape, distances=distances,
        sigmas=sigmas, truncation=3.0,
    )

    x = rng.standard_normal(shape)
    want = R_ref(ift.makeField(dom, x)).asnumpy()
    got = np.asarray(R(jnp.asarray(x)))
    assert np.max(np.abs(got - want)) / np.abs(want).max() < 1e-5

    # adjoint parity too (reference rmatvec vs JAX linear_transpose)
    y = rng.standard_normal(n_los)
    want_adj = R_ref.adjoint(
        ift.makeField(R_ref.target, y)
    ).asnumpy()
    lt = jax.linear_transpose(lambda v: R(v), jnp.zeros(shape))
    got_adj = np.asarray(lt(jnp.asarray(y))[0])
    assert np.max(np.abs(got_adj - want_adj)) / np.abs(want_adj).max() < 1e-5
