"""Multi-grid GP charts on the HEALPix sphere.

NEST-ordered HEALPix nests perfectly for charted refinement: the
children of pixel ``p`` at nside ``n`` are ``4p..4p+3`` at ``2n``, so
the children scatter is a pure reshape, and the 9-pixel stencil (parent
+ 8 neighbors, from the native C++ neighbor tables) drives the
conditional refinement exactly like the regular-grid ICR kernel.

Stencil distance matrices are congruent for pixels in symmetric
positions (HEALPix ring symmetry), so tolerant deduplication collapses
the O(12·nside²) stencils to O(nside) unique matrices — computed in
chunks so construction memory stays bounded.

Distances are 3-D chordal distances on the unit sphere (the standard
embedding for isotropic kernels on S²).

Reference: ``nifty/re/multi_grid/grid_impl.py:102`` ``HEALPixGrid`` and
``kernel.py``'s HEALPix window handling; independent implementation on
top of ``nifty_tpu.native``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax import numpy as jnp

from .. import native

__all__ = ["HEALPixRefinementGrid", "HEALPixICRKernel", "HEALPixICRField"]


def _nest_vectors(nside: int, pix: np.ndarray) -> np.ndarray:
    """Unit vectors of NEST pixels, shape (npix, 3)."""
    ring = native.nest2ring(nside, pix)
    z, phi = native.pix2ang_ring(nside, ring)
    s = np.sqrt(1.0 - z**2)
    return np.stack([s * np.cos(phi), s * np.sin(phi), z], axis=-1)


class HEALPixRefinementGrid:
    """nside-doubling HEALPix hierarchy (NEST ordering)."""

    def __init__(self, *, nside0: int = 1, depth: int):
        if not native.native_available():
            raise RuntimeError(
                "HEALPix multi-grid charts need the native HEALPix build"
            )
        self.nside0 = int(nside0)
        self.depth = int(depth)
        self.nsides = [self.nside0 * (1 << l) for l in range(self.depth + 1)]
        self.shapes = [(12 * n * n,) for n in self.nsides]


class HEALPixICRKernel:
    """ICR kernel on a :class:`HEALPixRefinementGrid`.

    ``cov_fn`` maps chordal distance → covariance.  Matrices are derived
    per unique stencil (batched Cholesky on device).
    """

    def __init__(
        self,
        grid: HEALPixRefinementGrid,
        covariance: Optional[Callable] = None,
        *,
        rtol: float = 1e-5,
        jitter: float = 1e-8,
        chunk: int = 1 << 16,
    ):
        self.grid = grid
        self.jitter = float(jitter)
        self._layouts = []
        for lvl in range(grid.depth):
            nside = grid.nsides[lvl]
            npix = 12 * nside * nside
            pix = np.arange(npix)
            nbrs = native.neighbors_nest(nside, pix)  # (npix, 8), -1 at corners
            # stencil = self + neighbors; missing corners fall back to self
            stencil = np.concatenate([pix[:, None], nbrs], axis=1)
            stencil = np.where(stencil < 0, pix[:, None], stencil)
            vec_c = _nest_vectors(nside, np.arange(npix))
            nside_f = grid.nsides[lvl + 1]
            child = (4 * pix[:, None] + np.arange(4)[None, :]).reshape(-1)
            vec_f = _nest_vectors(nside_f, child).reshape(npix, 4, 3)

            # chunked tolerant dedup of the 13x13 distance matrices
            seen = {}
            uniques = []
            inv = np.empty(npix, dtype=np.int64)
            # scale from a sample chunk
            sample = self._dist_chunk(vec_c, vec_f, stencil, np.arange(min(npix, 4096)))
            scale = max(np.abs(sample).max(), 1e-12)
            q = rtol * scale
            for s0 in range(0, npix, chunk):
                ids = np.arange(s0, min(s0 + chunk, npix))
                d = self._dist_chunk(vec_c, vec_f, stencil, ids)
                keys = np.round(d / q).astype(np.int64).reshape(ids.size, -1)
                for i, k in enumerate(map(lambda r: r.tobytes(), keys)):
                    u = seen.get(k)
                    if u is None:
                        u = len(uniques)
                        seen[k] = u
                        uniques.append(d[i])
                    inv[ids[i]] = u
            self._layouts.append(
                dict(
                    nside=nside,
                    npix=npix,
                    stencil=stencil,
                    dist_unique=np.stack(uniques),
                    inv=inv,
                )
            )
        # base level: dense covariance over all pixels
        n0 = grid.nsides[0]
        v0 = _nest_vectors(n0, np.arange(12 * n0 * n0))
        d = v0[:, None, :] - v0[None, :, :]
        self._base_dist = np.sqrt((d**2).sum(-1))
        self.covariance = covariance
        self._fixed_matrices = (
            self.matrices(covariance) if covariance is not None else None
        )

    @staticmethod
    def _dist_chunk(vec_c, vec_f, stencil, ids):
        pts = np.concatenate(
            [vec_c[stencil[ids]], vec_f[ids]], axis=1
        )  # (chunk, 13, 3)
        d = pts[:, :, None, :] - pts[:, None, :, :]
        return np.sqrt((d**2).sum(-1))

    def matrices(self, cov_fn: Callable):
        base_cov = cov_fn(jnp.asarray(self._base_dist))
        n0 = base_cov.shape[0]
        base_l = jnp.linalg.cholesky(
            base_cov + self.jitter * jnp.eye(n0, dtype=base_cov.dtype)
        )
        lvl_mats = []
        for lay in self._layouts:
            cov = cov_fn(jnp.asarray(lay["dist_unique"]))  # (nu, 13, 13)
            w = lay["stencil"].shape[1]
            cc = cov[:, :w, :w]
            fc = cov[:, w:, :w]
            ff = cov[:, w:, w:]
            cc = cc + self.jitter * jnp.eye(w, dtype=cov.dtype)
            olf = jnp.linalg.solve(cc, fc.swapaxes(-1, -2)).swapaxes(-1, -2)
            cond = ff - olf @ fc.swapaxes(-1, -2)
            ker = jnp.linalg.cholesky(
                cond + self.jitter * jnp.eye(4, dtype=cov.dtype)
            )
            lvl_mats.append((olf, ker))
        return base_l, lvl_mats

    def apply(self, xs: Sequence, matrices=None):
        """Per-level NEST excitations → finest-level NEST field."""
        if matrices is None:
            if self._fixed_matrices is None:
                raise ValueError("no covariance set; pass `matrices`")
            matrices = self._fixed_matrices
        base_l, lvl_mats = matrices
        if len(xs) != self.grid.depth + 1:
            raise ValueError(
                f"need {self.grid.depth + 1} excitation levels, got {len(xs)}"
            )
        x = base_l @ xs[0].reshape(-1)
        for lvl, (lay, (olf, ker)) in enumerate(zip(self._layouts, lvl_mats)):
            win = x[lay["stencil"]]  # (npix, 13) gather
            xi = xs[lvl + 1].reshape(lay["npix"], 4)
            inv = jnp.asarray(lay["inv"])
            olf_b = olf[inv]  # (npix, 4, 13)
            ker_b = ker[inv]
            y = jnp.einsum("pcw,pw->pc", olf_b, win) + jnp.einsum(
                "pcw,pw->pc", ker_b, xi
            )
            x = y.reshape(-1)  # NEST children are contiguous
        return x


class HEALPixICRField:
    """Correlated field on the sphere via HEALPix charted refinement.

    API mirrors :class:`~nifty_tpu.multi_grid.correlated_field.ICRField`
    (fixed callable covariance or a covariance Model of chordal
    distance)."""

    def __init__(
        self,
        grid: HEALPixRefinementGrid,
        kernel,
        *,
        offset: float = 0.0,
        prefix: str = "hpicr",
    ):
        from ..model import LazyModel, Model
        from ..utils.tree import ShapeWithDtype, random_like
        from functools import partial

        self.grid = grid
        self._name_exc = prefix + "excitations"
        if isinstance(kernel, (Model, LazyModel)):
            self.covariance = kernel
            self.kernel = HEALPixICRKernel(grid, None)
            self.fixed_kernel = False
        elif callable(kernel):
            self.covariance = None
            self.kernel = HEALPixICRKernel(grid, kernel)
            self.fixed_kernel = True
        else:
            raise TypeError(f"invalid kernel {kernel!r}")
        self.offset = float(offset)
        shapes = [ShapeWithDtype(s) for s in grid.shapes]
        self.domain = {self._name_exc: shapes}
        init = {self._name_exc: partial(random_like, primals=shapes)}
        if not self.fixed_kernel:
            self.domain.update(self.covariance.domain)
            init.update(self.covariance.init._call_or_struct)
        from ..model import Initializer

        self.init = Initializer(init)

    def __call__(self, x):
        mats = None
        if not self.fixed_kernel:
            mats = self.kernel.matrices(self.covariance(x))
        return self.offset + self.kernel.apply(x[self._name_exc], matrices=mats)
