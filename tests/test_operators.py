"""Structural operator zoo: linearity + adjointness via linear_transpose,
and behavior checks (reference: the nifty.cl operator test sweep,
``test/test_cl/test_operators/test_adjoint.py``)."""

import jax
import numpy as np
import pytest
from jax import numpy as jnp
from jax import random

import nifty_tpu.operators as ops
from nifty_tpu.extra import check_linear_model
from nifty_tpu.utils.tree import ShapeWithDtype

jax.config.update("jax_enable_x64", True)


def _dom(shape, dtype=np.float64):
    return ShapeWithDtype(shape, dtype)


LINEAR_CASES = [
    ("scaling", ops.scaling(2.5), (8, 8)),
    ("diagonal", ops.diagonal(jnp.linspace(0.5, 2.0, 64).reshape(8, 8)), (8, 8)),
    ("mask", ops.mask(np.arange(64).reshape(8, 8) % 3 == 0), (8, 8)),
    ("mask_adjoint", ops.mask_adjoint(np.arange(64).reshape(8, 8) % 3 == 0), (22,)),
    ("zero_pad", ops.zero_pad((12, 14)), (8, 8)),
    ("zero_pad_center", ops.zero_pad((12, 14), center=True), (8, 8)),
    ("central_slice", ops.central_slice((4, 6), center=True), (8, 8)),
    ("extract", ops.extract_at_indices([0, 3, 5], axis=1), (4, 8)),
    ("contraction", ops.contraction(1), (4, 8)),
    ("contraction_w", ops.contraction(0, weights=0.25, mean=True), (4, 8)),
    ("outer", ops.outer_product(jnp.arange(3.0)), (5,)),
    ("matmul", ops.matrix_product(jnp.eye(8) * 2 + 1, axis=0), (8, 4)),
    ("transpose", ops.transpose_field((1, 0)), (4, 8)),
    ("regrid_up", ops.regrid((16, 12)), (8, 8)),
    ("regrid_down", ops.regrid((5, 6)), (8, 8)),
    (
        "interp",
        ops.linear_interpolation(
            np.stack([np.linspace(0.3, 6.5, 11), np.linspace(0.1, 6.8, 11)]),
            distances=1.0,
        ),
        (8, 8),
    ),
    (
        "conv",
        ops.func_convolution((16,), 0.5, lambda r: np.exp(-0.5 * (r / 1.3) ** 2)),
        (16,),
    ),
    ("squeeze", ops.squeeze(1), (4, 1, 3)),
    ("value_insert", ops.value_inserter((4, 4), (1, 2)), ()),
    ("einsum", ops.linear_einsum("ij,j->i", m=jnp.ones((3, 5)) + jnp.eye(3, 5)), (5,)),
]


@pytest.mark.parametrize("dtype", [np.float64, np.float32, np.complex128])
@pytest.mark.parametrize(
    "fn,shape", [(f, s) for _, f, s in LINEAR_CASES],
    ids=[n for n, _, _ in LINEAR_CASES],
)
def test_linear_and_adjoint(fn, shape, dtype):
    """Adjointness/linearity swept over operator × dtype (the reference's
    `test_adjoint.py` grid, incl. complex inputs)."""
    tol = 1e-4 if dtype == np.float32 else 1e-6
    try:
        check_linear_model(
            fn, _dom(shape, dtype), random.PRNGKey(42), rtol=tol, atol=tol
        )
    except TypeError:
        if dtype is not np.complex128:
            raise
        pytest.skip("operator is real-only")


def test_mask_roundtrip():
    keep = np.arange(64).reshape(8, 8) % 3 == 0
    m, ma = ops.mask(keep), ops.mask_adjoint(keep)
    x = np.random.default_rng(0).standard_normal((8, 8))
    y = np.asarray(ma(m(jnp.asarray(x))))
    np.testing.assert_allclose(y[keep], x[keep])
    assert np.all(y[~keep] == 0)


def test_adjoint_helper_matches_linear_transpose():
    keep = np.arange(64).reshape(8, 8) % 5 == 0
    m = ops.mask(keep)
    adj = ops.adjoint(m, jnp.zeros((8, 8)))
    y = jnp.arange(float(keep.sum()))
    np.testing.assert_allclose(
        np.asarray(adj(y)), np.asarray(ops.mask_adjoint(keep)(y))
    )


def test_regrid_preserves_constants():
    r = ops.regrid((13, 7))
    x = jnp.full((8, 8), 3.25)
    np.testing.assert_allclose(np.asarray(r(x)), 3.25, rtol=1e-12)


def test_convolution_matches_direct():
    n = 16
    f = lambda r: np.exp(-0.5 * (r / 1.0) ** 2)
    conv = ops.func_convolution((n,), 1.0, f)
    x = np.zeros(n)
    x[3] = 1.0  # delta → kernel centered at 3 (periodic)
    out = np.asarray(conv(jnp.asarray(x)))
    r = np.minimum(np.abs(np.arange(n) - 3), n - np.abs(np.arange(n) - 3))
    np.testing.assert_allclose(out, f(r.astype(float)), atol=1e-10)


def test_block_diagonal_and_dict_ops():
    fns = {"a": ops.scaling(2.0), "b": ops.scaling(-1.0)}
    bd = ops.block_diagonal(fns)
    x = {"a": jnp.ones(3), "b": jnp.ones(2), "c": jnp.ones(1)}
    out = bd(x)
    np.testing.assert_allclose(np.asarray(out["a"]), 2.0)
    np.testing.assert_allclose(np.asarray(out["b"]), -1.0)
    np.testing.assert_allclose(np.asarray(out["c"]), 1.0)

    pk = ops.prepend_key("lvl")
    assert set(pk(x)) == {"lvl"} and set(pk(x)["lvl"]) == {"a", "b", "c"}


def test_multifield_vector_roundtrip():
    x = {"a": jnp.arange(3.0), "b": jnp.ones((2, 2))}
    flat = ops.multifield_to_vector(x)
    assert flat.shape == (7,)
    back = ops.vector_to_multifield(x)(flat)
    for k in x:
        np.testing.assert_allclose(np.asarray(back[k]), np.asarray(x[k]))


def test_partial_conjugate():
    x = {"a": jnp.array([1 + 2j]), "b": jnp.array([3 + 4j])}
    out = ops.partial_conjugate(["a"])(x)
    assert np.asarray(out["a"]).imag[0] == -2
    assert np.asarray(out["b"]).imag[0] == 4


def test_interp_values():
    pos = np.array([[1.5], [2.0]])
    li = ops.linear_interpolation(pos, distances=1.0)
    x = jnp.asarray(np.add.outer(np.arange(4.0), np.zeros(4)))
    np.testing.assert_allclose(np.asarray(li(x)), [1.5])


def test_operators_compose_with_models():
    """An operator slots into a likelihood chain like any callable."""
    import nifty_tpu as nt

    keep = np.arange(16) % 2 == 0
    cfm = nt.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(0.0, (1e-1, 3e-2))
    cfm.add_fluctuations((16,), 1.0 / 16, (1.0, 0.5), (-3.0, 0.2))
    cf = cfm.finalize()
    fwd = nt.ChainModel(ops.mask(keep), cf)
    p = fwd.init(random.PRNGKey(0))
    out = jax.jit(fwd)(p)
    assert out.shape == (int(keep.sum()),)
    lh = nt.Gaussian(
        jnp.zeros(int(keep.sum())), noise_cov_inv=lambda x: x / 0.01
    ).amend(fwd)
    val = jax.jit(lh)(p)
    assert np.isfinite(float(val))


def test_zero_pad_center_nyquist_split():
    """center=True upsamples an FFT-layout spectrum: rfft of the padded
    signal keeps the original harmonic content in the low-|k| head/tail
    (reference FieldZeroPadder central=True,
    nifty/cl/operators/field_zero_padder.py:85-95)."""
    n, N = 8, 16
    x = jnp.asarray(np.fft.fft(np.random.default_rng(0).normal(size=n)))
    pad = ops.zero_pad((N,), center=True)
    y = np.asarray(pad(x))
    # head: low frequencies 0..n//2 stay put
    np.testing.assert_allclose(y[: n // 2 + 1], np.asarray(x)[: n // 2 + 1])
    # tail: negative frequencies move to the end
    np.testing.assert_allclose(y[N - n // 2 :], np.asarray(x)[n - n // 2 :])
    # middle is zero
    np.testing.assert_allclose(y[n // 2 + 1 : N - n // 2], 0.0)
    # band-limited interpolation check: padding the spectrum of a pure
    # low-frequency cosine and inverse-transforming reproduces the cosine
    # sampled at the finer rate (amplitude rescaled by N/n)
    t_c = np.cos(2 * np.pi * 2 * np.arange(n) / n)
    spec = jnp.asarray(np.fft.fft(t_c))
    fine = np.fft.ifft(np.asarray(pad(spec))) * (N / n)
    expect = np.cos(2 * np.pi * 2 * np.arange(N) / N)
    np.testing.assert_allclose(fine.real, expect, atol=1e-12)


def test_block_diagonal_unknown_key_raises():
    bd = ops.block_diagonal({"a": ops.scaling(2.0), "typo": ops.scaling(1.0)})
    with pytest.raises(KeyError):
        bd({"a": jnp.ones(3), "b": jnp.ones(2)})


def test_linear_interpolation_periodic_wrap():
    """Sampling positions wrap around the torus (reference
    LinearInterpolator convention)."""
    n = 8
    x = jnp.asarray(np.random.default_rng(1).normal(size=n))
    # position exactly one period out ≡ position 0
    li = ops.linear_interpolation(np.array([[0.0, float(n), n - 0.5]]), distances=1.0)
    out = np.asarray(li(x))
    np.testing.assert_allclose(out[1], out[0], atol=1e-12)
    np.testing.assert_allclose(out[2], 0.5 * (x[-1] + x[0]), atol=1e-12)
