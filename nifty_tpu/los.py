"""Line-of-sight responses for tomography-style forward models.

``SamplingCartesianGridLOS`` integrates a gridded field along straight
rays by sampling equidistant points with multilinear ``map_coordinates``
and summing — a batched gather per ray, vmapped over rays (reference:
``nifty/re/extra/sampling_los.py:30``; independent implementation).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
from jax import numpy as jnp

from .model import LazyModel
from .utils.tree import ShapeWithDtype

__all__ = ["SamplingCartesianGridLOS"]


def _integrate_one_los(
    x, start, end, *, distances, shape, n_sampling_points, order
):
    from jax.scipy.ndimage import map_coordinates

    # physical position → (fractional) pixel index
    l2i = ((shape - 1.0) / shape) / distances
    si = start * l2i
    ei = end * l2i
    step = (ei - si) / n_sampling_points
    t = jnp.arange(n_sampling_points) + 0.5
    pts = si[:, None] + step[:, None] * t[None, :]
    length = jnp.linalg.norm(end - start)
    vals = map_coordinates(x, pts, order=order, cval=jnp.nan)
    return vals.sum() * (length / n_sampling_points)


class SamplingCartesianGridLOS(LazyModel):
    """Line-of-sight integrals from `start` to `end` points over a regular
    Cartesian grid; either endpoint set may be shared across rays."""

    start: jax.Array = dataclasses.field(metadata=dict(static=False))
    end: jax.Array = dataclasses.field(metadata=dict(static=False))

    def __init__(
        self,
        start,
        end,
        *,
        shape,
        distances,
        n_sampling_points: int = 500,
        interpolation_order: int = 1,
        dtype=None,
    ):
        self.start = jnp.asarray(start)
        self.end = jnp.asarray(end)
        shape_arr = jnp.asarray(shape, dtype=float)
        dist_arr = jnp.asarray(distances, dtype=float)
        self._integrate = partial(
            _integrate_one_los,
            distances=dist_arr,
            shape=shape_arr,
            n_sampling_points=int(n_sampling_points),
            order=int(interpolation_order),
        )
        tgt_shape = (self.end if self.end.ndim >= self.start.ndim else self.start).shape[:-1]
        super().__init__(
            domain=ShapeWithDtype(tuple(shape), dtype),
            target=ShapeWithDtype(tgt_shape, dtype),
        )

    def __call__(self, x):
        in_axes = (None, 0, 0)
        if self.start.ndim < self.end.ndim:
            in_axes = (None, None, 0)
        elif self.start.ndim > self.end.ndim:
            in_axes = (None, 0, None)
        return jax.vmap(self._integrate, in_axes=in_axes)(x, self.start, self.end)
