"""Dynamics models: causal Green's functions and light cones."""

import jax
import numpy as np
import pytest
from jax import numpy as jnp
from jax import random

from nifty_tpu.models.dynamics import (
    dynamic_lightcone_operator,
    dynamic_operator,
    light_cone,
    signed_fft_coords,
)


def test_signed_fft_coords():
    c = signed_fft_coords((8,), (0.5,))
    assert c.shape == (1, 8)
    np.testing.assert_allclose(
        c[0], [0.0, 0.5, 1.0, 1.5, 2.0, -1.5, -1.0, -0.5]
    )


def test_light_cone_shape_and_range():
    c = jnp.asarray([1.0])
    cone = light_cone(c, (16, 16), (1.0, 1.0), sigx=2.0)
    cone = np.asarray(cone)
    assert cone.shape == (16, 16)
    assert cone.max() <= 1.0 + 1e-12 and cone.min() >= 0.0
    # time-like region (|t| > |x|) is 1; space-like separations decay
    assert np.isclose(cone[8, 0], 1.0, atol=1e-6)  # large t, x=0
    assert cone[0, 8] < 0.1  # t=0, large |x|


def test_dynamic_operator_causal_kernel():
    """causal=True: the time-domain kernel vanishes for t < 0."""
    shape = (32, 8)
    model, ops = dynamic_operator(
        shape=shape,
        distances=(1.0, 1.0),
        key="dyn",
        sm_s0=1.0,
        sm_x0=2.0,
        harmonic_padding=8,
        causal=True,
    )
    x = model.init(random.PRNGKey(0))
    m = model(x)
    assert m.shape == shape
    kern = np.asarray(jnp.fft.ifftn(m))
    t = signed_fft_coords(shape, (1.0, 1.0))[0]
    neg = np.abs(kern[t < 0])
    pos = np.abs(kern[t > 0])
    assert neg.max() < 1e-10 * max(pos.max(), 1e-30)


def test_dynamic_operator_minimum_phase_causal():
    shape = (32,)
    model, _ = dynamic_operator(
        shape=shape,
        distances=(1.0,),
        key="dyn",
        sm_s0=0.5,
        sm_x0=3.0,
        causal=True,
        minimum_phase=True,
    )
    x = model.init(random.PRNGKey(1))
    m = jax.jit(model)(x)
    assert np.all(np.isfinite(np.asarray(m).view(float)))


def test_dynamic_lightcone_operator():
    shape = (16, 16)
    model, ops = dynamic_lightcone_operator(
        shape=shape,
        distances=(1.0, 1.0),
        key="dyn",
        lightcone_key="speed",
        sm_s0=1.0,
        sm_x0=2.0,
        sigc=0.3,
        quant=2.0,
    )
    x = model.init(random.PRNGKey(2))
    m = jax.jit(model)(x)
    assert m.shape == shape
    assert np.all(np.isfinite(np.asarray(m).view(float)))
    sp = ops["lightspeed"](x)
    assert sp.shape == (1,) and float(sp[0]) > 0
    # gradient flows into the lightspeed latent
    g = jax.grad(lambda q: jnp.sum(jnp.abs(model(q)) ** 2))(x)
    assert float(np.abs(np.asarray(g["speed"])).max()) > 0
