"""Distributed FFT / Hartley transforms for domain-decomposed fields.

The reference never shards the field itself (samples are its only
parallel axis; ``SURVEY.md §5``) — this module is the new ground needed
for ≥10⁹-parameter fields: a **pencil-decomposed** 2-D FFT over a named
mesh axis, written with ``shard_map`` so the collectives are explicit
``all_to_all`` transposes over ICI instead of XLA-inserted all-gathers:

    rows sharded → local FFT(cols) → all-to-all (transpose) →
    local FFT(rows) → all-to-all back.

Per-device memory stays O(N/p) throughout; wall-clock is two local FFTs
plus two transposes riding the interconnect's bisection bandwidth.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax import lax
from jax import numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.4.35 exposes shard_map at the top level
    from jax import shard_map  # type: ignore
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["sharded_fft2", "sharded_hartley2", "sharded_hartley"]


def _fft2_local(x_block, axis_name: str, *, inverse: bool = False):
    """shard_map body: `x_block` is the local (n0/p, n1) row-pencil."""
    fft = jnp.fft.ifft if inverse else jnp.fft.fft
    # FFT along the locally-complete column axis
    y = fft(x_block, axis=1)
    # transpose pencils: (n0/p, n1) → (n0, n1/p)
    y = lax.all_to_all(y, axis_name, split_axis=1, concat_axis=0, tiled=True)
    # FFT along the now locally-complete row axis
    y = fft(y, axis=0)
    # transpose back to row-pencils
    return lax.all_to_all(y, axis_name, split_axis=0, concat_axis=1, tiled=True)


def sharded_fft2(x, mesh: Mesh, axis_name: str = "fx", *, inverse: bool = False):
    """2-D FFT of `x` sharded along its leading axis over `axis_name`.

    Input and output are row-sharded ``P(axis_name, None)``; the result
    equals ``jnp.fft.fft2(x)`` (up to fp error) but never materializes
    the full field on one device.  Both axes must be divisible by the
    mesh-axis size (pad the field to a multiple — powers of two are the
    fast path for the FFT anyway).
    """
    if x.ndim != 2:
        raise ValueError("sharded_fft2 expects a 2-D array")
    spec = P(axis_name, None)
    fn = shard_map(
        partial(_fft2_local, axis_name=axis_name, inverse=inverse),
        mesh=mesh,
        in_specs=(spec,),
        out_specs=spec,
    )
    return fn(x.astype(jnp.complex64 if x.dtype == jnp.float32 else jnp.complex128))


def sharded_hartley2(x, mesh: Mesh, axis_name: str = "fx"):
    """Distributed 2-D Hartley transform (the correlated field's harmonic
    transform): ``H(x) = Re F(x) − Im F(x)`` with the FFT pencil-sharded."""
    f = sharded_fft2(x, mesh, axis_name)
    return (f.real - f.imag).astype(x.dtype)


def sharded_hartley(x, mesh: Mesh, axis_name: str = "fx"):
    """Hartley transform sharded along the leading axis: 2-D inputs use
    the pencil decomposition; 1-D inputs fall back to a gathered local
    transform (a 1-D FFT cannot be usefully pencil-split)."""
    if x.ndim == 2:
        return sharded_hartley2(x, mesh, axis_name)
    from ..ops.fft import hartley

    return hartley(x)
