"""Fused Pallas 2-D Hartley: correctness in interpret mode (CPU lane).

On CPU the kernels run through the Pallas interpreter with plain f32
dots; on TPU the same kernels run compiled with manual bf16x3 MXU passes
(~1e-5 relative accuracy — validated on hardware, see BENCHMARKS.md).
Reference behavior: the Hartley convention of ``ops.fft.hartley``
(H = Re F − Im F, matching ``nifty/re/correlated_field.py:24-30``).
"""

import jax
import numpy as np
import pytest
from jax import numpy as jnp

from nifty_tpu.ops.fft import hartley
from nifty_tpu.ops.pallas_fft import (
    hartley2d_pallas,
    pallas_hartley_supported,
)


@pytest.mark.parametrize(
    "shape",
    [(256, 256), (512, 256), (256, 512), (1280, 1280), (512, 768)],
)
def test_matches_fft(shape):
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    y = hartley2d_pallas(x)
    F = np.fft.fft2(np.asarray(x, np.float64))
    ref = F.real - F.imag
    np.testing.assert_allclose(np.asarray(y, np.float64), ref, rtol=2e-5,
                               atol=2e-5 * np.abs(ref).max())


def test_matches_hartley_dispatch():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((512, 768)).astype(np.float32))
    ref = np.asarray(hartley(x))
    np.testing.assert_allclose(
        np.asarray(hartley2d_pallas(x)), ref,
        rtol=2e-5, atol=2e-5 * np.abs(ref).max(),
    )


def test_linear_and_self_transpose():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))
    # H is linear: jvp(t) == H(t); H is symmetric: transpose == H
    yt = jax.jvp(hartley2d_pallas, (x,), (t,))[1]
    np.testing.assert_array_equal(np.asarray(yt),
                                  np.asarray(hartley2d_pallas(t)))
    ct = jax.linear_transpose(hartley2d_pallas, x)(t)[0]
    np.testing.assert_array_equal(np.asarray(ct),
                                  np.asarray(hartley2d_pallas(t)))


def test_self_inverse():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((256, 512)).astype(np.float32))
    y = hartley2d_pallas(hartley2d_pallas(x)) / x.size
    np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                               rtol=1e-4, atol=1e-4)


def test_vmap():
    rng = np.random.default_rng(3)
    xb = jnp.asarray(rng.standard_normal((3, 256, 256)).astype(np.float32))
    yb = jax.vmap(hartley2d_pallas)(xb)
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(yb[i]), np.asarray(hartley2d_pallas(xb[i]))
        )


def test_supported_predicate():
    assert pallas_hartley_supported((256, 256), jnp.float32)
    assert pallas_hartley_supported((1280, 10240), jnp.float32)
    assert not pallas_hartley_supported((255, 256), jnp.float32)
    assert not pallas_hartley_supported((128, 256), jnp.float32)
    assert not pallas_hartley_supported((256,), jnp.float32)
    assert not pallas_hartley_supported((256, 256, 256), jnp.float32)
    assert not pallas_hartley_supported((256, 256), jnp.float64)


def test_dispatch_config(monkeypatch):
    import nifty_tpu.config as cfg
    from nifty_tpu.ops import fft

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))
    ref = np.asarray(fft.hartley(x))
    monkeypatch.setitem(cfg._config, "fft_impl", "pallas")
    y = np.asarray(fft.hartley(x))
    np.testing.assert_allclose(y, ref, rtol=2e-5,
                               atol=2e-5 * np.abs(ref).max())


def test_correlated_field_under_pallas_impl(monkeypatch):
    """CF forward with the Pallas Hartley matches the splitreal path."""
    import nifty_tpu as nt
    import nifty_tpu.config as cfg

    cfm = nt.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(
        (256, 256), distances=1.0 / 256, fluctuations=(1.0, 5e-1),
        loglogavgslope=(-3.0, 2e-1), flexibility=(1e0, 2e-1),
        n_mode_knots=16,
    )
    cf = cfm.finalize()
    pos = cf.init(jax.random.PRNGKey(7))
    # force f32 latents (pallas path requires f32)
    pos = jax.tree_util.tree_map(lambda l: jnp.asarray(l, jnp.float32), pos)
    ref = np.asarray(cf(pos))
    monkeypatch.setitem(cfg._config, "fft_impl", "pallas")
    y = np.asarray(cf(pos))
    np.testing.assert_allclose(y, ref, rtol=1e-4,
                               atol=1e-4 * np.abs(ref).max())
