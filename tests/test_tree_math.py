import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import random

import nifty_tpu as nt


def test_vector_arithmetic():
    a = nt.Vector({"x": jnp.arange(3.0), "y": 2.0})
    b = nt.Vector({"x": jnp.ones(3), "y": 1.0})
    c = a + 2 * b - b / 2
    np.testing.assert_allclose(c["x"], np.arange(3.0) + 1.5)
    np.testing.assert_allclose(c["y"], 3.5)
    np.testing.assert_allclose((-a)["x"], -np.arange(3.0))
    assert (a**2)["y"] == 4.0


def test_vector_through_jit():
    a = nt.Vector({"x": jnp.arange(3.0)})

    @jax.jit
    def f(v):
        return v * 2 + 1

    out = f(a)
    np.testing.assert_allclose(out["x"], 2 * np.arange(3.0) + 1)


def test_vdot_norm_size():
    t = {"a": jnp.array([3.0, 4.0]), "b": jnp.array(2.0)}
    assert nt.vdot(t, t) == pytest.approx(29.0)
    assert nt.norm(t, ord=2) == pytest.approx(np.sqrt(29.0))
    assert nt.norm(t, ord=np.inf) == pytest.approx(4.0)
    from nifty_tpu.utils.tree import size

    assert size(t) == 3


def test_random_like_per_leaf_keys():
    prim = {"a": jnp.zeros((4,)), "b": jnp.zeros((2, 2))}
    s = nt.random_like(random.PRNGKey(42), prim)
    assert s["a"].shape == (4,)
    assert s["b"].shape == (2, 2)
    # distinct keys per leaf: draws must differ
    assert not np.allclose(np.ravel(s["a"])[:4], np.ravel(s["b"])[:4])
    # deterministic
    s2 = nt.random_like(random.PRNGKey(42), prim)
    np.testing.assert_array_equal(s["a"], s2["a"])


def test_stack_unstack_mean():
    trees = [{"a": jnp.full((2,), float(i))} for i in range(3)]
    st = nt.stack(trees)
    assert st["a"].shape == (3, 2)
    back = nt.unstack(st)
    assert len(back) == 3
    np.testing.assert_allclose(back[1]["a"], 1.0)
    m = nt.mean(st)
    np.testing.assert_allclose(m["a"], 1.0)
    m2, s2 = nt.mean_and_std(st)
    np.testing.assert_allclose(m2["a"], 1.0)
    np.testing.assert_allclose(s2["a"], 1.0)


def test_smap_lmap_match_vmap():
    def f(x, y):
        return x * y + jnp.sum(x)

    xs = jnp.arange(12.0).reshape(4, 3)
    y = jnp.ones(3)
    ref = jax.vmap(f, in_axes=(0, None))(xs, y)
    for m in (nt.smap, nt.lmap):
        got = m(f, in_axes=(0, None))(xs, y)
        np.testing.assert_allclose(got, ref)


def test_shape_with_dtype():
    swd = nt.ShapeWithDtype((2, 3), jnp.float32)
    assert swd.size == 6
    assert swd.shape == (2, 3)
    z = nt.zeros_like({"a": swd})
    assert z["a"].shape == (2, 3)
    assert z["a"].dtype == jnp.float32


def test_tree_linalg_spectral_functions():
    """sqrtm/logm/inv/solve against dense numpy references, plus the
    Daleckii–Krein JVP against finite differences."""
    from nifty_tpu.utils.tree_linalg import (
        sym_inv, sym_logm, sym_solve, sym_sqrtm,
    )
    import scipy.linalg as sl

    rng = np.random.default_rng(0)
    d = 4
    A = rng.normal(size=(3, d, d))
    A = A @ np.swapaxes(A, -1, -2) + 2 * np.eye(d)
    Aj = jnp.asarray(A)

    S = np.asarray(sym_sqrtm(Aj))
    for i in range(3):
        np.testing.assert_allclose(S[i] @ S[i], A[i], atol=1e-10)
    L = np.asarray(sym_logm(Aj))
    for i in range(3):
        np.testing.assert_allclose(L[i], sl.logm(A[i]), atol=1e-9)
    Iv = np.asarray(sym_inv(Aj))
    for i in range(3):
        np.testing.assert_allclose(Iv[i] @ A[i], np.eye(d), atol=1e-10)

    b = jnp.asarray(rng.normal(size=(3, d)))
    x = np.asarray(sym_solve(Aj, b))
    for i in range(3):
        np.testing.assert_allclose(A[i] @ x[i], np.asarray(b)[i], atol=1e-10)

    B = jnp.asarray(rng.normal(size=(3, d, d)))
    X = np.asarray(sym_solve(Aj, B, matrix_eqn=True))
    for i in range(3):
        np.testing.assert_allclose(A[i] @ X[i], np.asarray(B)[i], atol=1e-10)

    # JVP of sqrtm vs finite differences (single matrix)
    M = jnp.asarray(A[0])
    dM = rng.normal(size=(d, d))
    dM = jnp.asarray(dM + dM.T)
    _, jv = jax.jvp(sym_sqrtm, (M,), (dM,))
    eps = 1e-6
    fd = (np.asarray(sym_sqrtm(M + eps * dM)) - np.asarray(sym_sqrtm(M - eps * dM))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(jv), fd, atol=1e-6)

    # degenerate eigenvalues: JVP stays finite (the Daleckii–Krein limit)
    Mdeg = jnp.asarray(2.0 * np.eye(d))
    _, jv2 = jax.jvp(sym_sqrtm, (Mdeg,), (dM,))
    assert np.isfinite(np.asarray(jv2)).all()
    np.testing.assert_allclose(
        np.asarray(jv2), np.asarray(dM) / (2 * np.sqrt(2.0)), atol=1e-10
    )
