"""Pure-JAX HEALPix pixelization (RING scheme) — jit/vmap-compatible.

Device-side counterpart of :mod:`nifty_tpu.native`: the same published
algorithms (Górski et al. 2005) written in branch-free jnp so they can
run inside traced code (e.g. sampling responses that bin sky
coordinates on the fly).  NEST bit-interleaving and neighbor tables
stay host-side in the native module — they are construction-time
operations.

Parity with ``nifty/re/multi_grid/jhealpix.py`` (ang2pix/pix2ang);
independent implementation.
"""

from __future__ import annotations

import numpy as np
from jax import numpy as jnp

__all__ = ["ang2pix_ring", "pix2ang_ring", "npix"]


def npix(nside: int) -> int:
    return 12 * int(nside) ** 2


def ang2pix_ring(nside: int, z, phi):
    """(z = cos θ, φ) → RING pixel index; fully vectorized jnp."""
    nside = int(nside)
    z = jnp.asarray(z)
    phi = jnp.asarray(phi)
    za = jnp.abs(z)
    tt = jnp.mod(phi / (0.5 * jnp.pi), 4.0)
    total = npix(nside)

    # equatorial belt
    t1 = nside * (0.5 + tt)
    t2 = nside * 0.75 * z
    jp_e = jnp.floor(t1 - t2).astype(jnp.int64)
    jm_e = jnp.floor(t1 + t2).astype(jnp.int64)
    ir_e = nside + 1 + jp_e - jm_e
    kshift = 1 - (ir_e & 1)
    ip_e = jnp.mod((jp_e + jm_e - nside + kshift + 1) // 2, 4 * nside)
    pix_e = 2 * nside * (nside - 1) + (ir_e - 1) * 4 * nside + ip_e

    # polar caps
    tp = tt - jnp.floor(tt)
    tmp = nside * jnp.sqrt(jnp.maximum(3.0 * (1.0 - za), 0.0))
    jp_c = jnp.floor(tp * tmp).astype(jnp.int64)
    jm_c = jnp.floor((1.0 - tp) * tmp).astype(jnp.int64)
    ir_c = jp_c + jm_c + 1
    ip_c = jnp.mod(jnp.floor(tt * ir_c).astype(jnp.int64), 4 * ir_c)
    pix_n = 2 * ir_c * (ir_c - 1) + ip_c
    pix_s = total - 2 * ir_c * (ir_c + 1) + ip_c
    pix_cap = jnp.where(z > 0, pix_n, pix_s)

    return jnp.where(za <= 2.0 / 3.0, pix_e, pix_cap)


def pix2ang_ring(nside: int, pix):
    """RING pixel index → (z = cos θ, φ); fully vectorized jnp."""
    nside = int(nside)
    pix = jnp.asarray(pix, dtype=jnp.int64)
    ncap = 2 * nside * (nside - 1)
    total = npix(nside)

    # north cap
    ir_n = (0.5 * (1.0 + jnp.sqrt(jnp.maximum(1.0 + 2.0 * pix, 1.0)))).astype(
        jnp.int64
    )
    iphi_n = pix + 1 - 2 * ir_n * (ir_n - 1)
    z_n = 1.0 - ir_n.astype(float) ** 2 / (3.0 * nside**2)
    phi_n = (iphi_n - 0.5) * jnp.pi / (2.0 * jnp.maximum(ir_n, 1))

    # equatorial
    ip = pix - ncap
    ir_e = ip // (4 * nside) + nside
    iphi_e = jnp.mod(ip, 4 * nside) + 1
    fodd = jnp.where((ir_e + nside) & 1, 1.0, 0.5)
    z_e = (2.0 * nside - ir_e) * 2.0 / (3.0 * nside)
    phi_e = (iphi_e - fodd) * jnp.pi / (2.0 * nside)

    # south cap
    ip_s = total - pix
    ir_s = (0.5 * (1.0 + jnp.sqrt(jnp.maximum(2.0 * ip_s - 1.0, 1.0)))).astype(
        jnp.int64
    )
    iphi_s = 4 * ir_s + 1 - (ip_s - 2 * ir_s * (ir_s - 1))
    z_s = -1.0 + ir_s.astype(float) ** 2 / (3.0 * nside**2)
    phi_s = (iphi_s - 0.5) * jnp.pi / (2.0 * jnp.maximum(ir_s, 1))

    north = pix < ncap
    south = pix >= total - ncap
    z = jnp.where(north, z_n, jnp.where(south, z_s, z_e))
    phi = jnp.where(north, phi_n, jnp.where(south, phi_s, phi_e))
    return z, phi
