"""3-D sphere × log-radius multi-grid charts (all-sky tomography).

The product of a HEALPix refinement chart (NEST, nside doubling) with an
open log-radial chart — the grid family behind 10⁸⁺-parameter 3-D sky
reconstructions (reference: ``nifty/re/multi_grid/grid_impl.py:380``
``HPLogRGrid``; independent implementation).

Stencils factorize: 9 spherical neighbors × (2·pad+1) radial shells
predict 4 × s_r children.  Unique stencil classes are the product of the
HEALPix ring-symmetry classes (angular structure) with the radial block
positions, so the refinement matrices stay O(nside · n_r) while the
field grows O(12·nside²·n_r).  Points embed in R³ as r·v̂ with chordal
distances, the natural metric for isotropic 3-D kernels.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax import numpy as jnp

from .. import native
from .grid import BrokenLogGrid, LogGrid
from .healpix_grid import HEALPixRefinementGrid, _nest_vectors

__all__ = ["SphereLogRadiusGrid", "SphereRadiusICRKernel", "SphereRadiusICRField"]


class SphereLogRadiusGrid:
    """Product chart: HEALPix sphere × open log-radial grid, refined in
    lockstep (nside doubles, radial cells split by `r_splits`)."""

    def __init__(
        self,
        *,
        nside0: int = 1,
        n_r0: int,
        r_min: float,
        r_max: float,
        depth: int,
        r_padding: int = 1,
        r_splits: int = 2,
        r_linthresh: Optional[float] = None,
    ):
        self.sphere = HEALPixRefinementGrid(nside0=nside0, depth=depth)
        if r_linthresh is None:
            self.radial = LogGrid(
                shape0=n_r0,
                depth=depth,
                r_min=r_min,
                r_max=r_max,
                padding=r_padding,
                splits=r_splits,
            )
        else:
            # symlog radial chart: linear inside r_linthresh (resolves the
            # observer's neighborhood without the log chart's r→0 pile-up)
            self.radial = BrokenLogGrid(
                shape0=n_r0,
                depth=depth,
                r_min=r_min,
                r_linthresh=r_linthresh,
                r_max=r_max,
                padding=r_padding,
                splits=r_splits,
            )
        self.depth = int(depth)
        self.shapes = [
            (12 * n * n, m[0])
            for n, m in zip(self.sphere.nsides, self.radial.shapes)
        ]


class SphereRadiusICRKernel:
    """ICR kernel on a :class:`SphereLogRadiusGrid` for an isotropic 3-D
    covariance ``cov(r)`` of Euclidean distance.

    Per-block matrices are gathered per (angular class × radial shell);
    the apply materializes ``(npix, B_r, C, W)`` matrices, so keep the
    per-level sizes moderate (nside ≲ 32) — the segment-matmul variant
    for pod-scale runs is a planned optimization.
    """

    def __init__(
        self,
        grid: SphereLogRadiusGrid,
        covariance: Optional[Callable] = None,
        *,
        rtol: float = 1e-5,
        jitter: float = 1e-6,
    ):
        if not native.native_available():
            raise RuntimeError("needs the native HEALPix build")
        self.grid = grid
        self.jitter = float(jitter)
        rad = grid.radial
        self._layouts = []
        for lvl in range(grid.depth):
            nside = grid.sphere.nsides[lvl]
            npix = 12 * nside * nside
            pix = np.arange(npix)
            nbrs = native.neighbors_nest(nside, pix)
            stencil = np.concatenate([pix[:, None], nbrs], axis=1)
            stencil = np.where(stencil < 0, pix[:, None], stencil)
            vec_c = _nest_vectors(nside, pix)  # (npix, 3)
            child = (4 * pix[:, None] + np.arange(4)[None, :]).reshape(-1)
            vec_f = _nest_vectors(grid.sphere.nsides[lvl + 1], child).reshape(
                npix, 4, 3
            )
            # angular classes: dedup the 13x13 dot-product matrices
            dirs = np.concatenate([vec_c[stencil], vec_f], axis=1)  # (npix,13,3)
            dots = np.einsum("pik,pjk->pij", dirs, dirs)
            q = rtol * 1.0
            keys = np.round(dots / q).astype(np.int64).reshape(npix, -1)
            _, uidx, inv_s = np.unique(
                keys, axis=0, return_index=True, return_inverse=True
            )
            inv_s = inv_s.ravel()
            n_us = uidx.size
            rep_dirs = dirs[uidx]  # (n_us, 13, 3)

            # radial geometry: window coords per block (LogGrid layout)
            p_r = rad.padding[0]
            s_r = rad.splits[0]
            n_rc = rad.shapes[lvl][0]
            b_r = n_rc - 2 * p_r
            br = np.arange(b_r)
            rw_idx = (br[:, None] + p_r) + np.arange(-p_r, p_r + 1)[None]
            rf_idx = br[:, None] * s_r + np.arange(s_r)[None]
            r_w = rad.at(lvl).index2coord(rw_idx[None])[0]  # (b_r, w_r)
            r_f = rad.at(lvl + 1).index2coord(rf_idx[None])[0]  # (b_r, s_r)

            # stencil points for every (angular class, radial block):
            # coarse = 9 dirs × w_r radii, fine = 4 dirs × s_r radii
            w_r = 2 * p_r + 1
            dc = rep_dirs[:, None, :9, None, :] * r_w[None, :, None, :, None]
            dc = dc.reshape(n_us, b_r, 9 * w_r, 3)
            df = rep_dirs[:, None, 9:, None, :] * r_f[None, :, None, :, None]
            df = df.reshape(n_us, b_r, 4 * s_r, 3)
            pts = np.concatenate([dc, df], axis=2)  # (n_us, b_r, W+C, 3)
            diff = pts[:, :, :, None, :] - pts[:, :, None, :, :]
            dist = np.sqrt((diff**2).sum(-1))
            self._layouts.append(
                dict(
                    nside=nside,
                    npix=npix,
                    stencil=stencil,
                    inv_s=inv_s,
                    dist_unique=dist,  # (n_us, b_r, T, T)
                    w=9 * w_r,
                    c=4 * s_r,
                    w_r=w_r,
                    s_r=s_r,
                    b_r=b_r,
                    p_r=p_r,
                )
            )
        # base level: dense covariance over all (pixel, radius) points
        n0 = grid.sphere.nsides[0]
        v0 = _nest_vectors(n0, np.arange(12 * n0 * n0))
        r0 = rad.at(0).index2coord(np.arange(rad.shapes[0][0])[None])[0]
        pts0 = (v0[:, None, :] * r0[None, :, None]).reshape(-1, 3)
        d = pts0[:, None, :] - pts0[None, :, :]
        self._base_dist = np.sqrt((d**2).sum(-1))
        self.covariance = covariance
        self._fixed_matrices = (
            self.matrices(covariance) if covariance is not None else None
        )

    def matrices(self, cov_fn: Callable):
        cov0 = cov_fn(jnp.asarray(0.0))  # scale-aware (relative) jitter
        base_cov = cov_fn(jnp.asarray(self._base_dist))
        n0 = base_cov.shape[0]
        base_l = jnp.linalg.cholesky(
            base_cov + self.jitter * cov0 * jnp.eye(n0, dtype=base_cov.dtype)
        )
        lvl_mats = []
        for lay in self._layouts:
            cov = cov_fn(jnp.asarray(lay["dist_unique"]))  # (nus, br, T, T)
            w, c = lay["w"], lay["c"]
            cc = cov[..., :w, :w] + self.jitter * cov0 * jnp.eye(
                w, dtype=cov.dtype
            )
            fc = cov[..., w:, :w]
            ff = cov[..., w:, w:]
            olf = jnp.linalg.solve(cc, fc.swapaxes(-1, -2)).swapaxes(-1, -2)
            cond = ff - olf @ fc.swapaxes(-1, -2)
            ker = jnp.linalg.cholesky(
                cond + self.jitter * cov0 * jnp.eye(c, dtype=cov.dtype)
            )
            lvl_mats.append((olf, ker))
        return base_l, lvl_mats

    def apply(self, xs: Sequence, matrices=None):
        if matrices is None:
            if self._fixed_matrices is None:
                raise ValueError("no covariance set; pass `matrices`")
            matrices = self._fixed_matrices
        base_l, lvl_mats = matrices
        if len(xs) != self.grid.depth + 1:
            raise ValueError(
                f"need {self.grid.depth + 1} excitation levels, got {len(xs)}"
            )
        shp0 = self.grid.shapes[0]
        x = (base_l @ xs[0].reshape(-1)).reshape(shp0)
        for lvl, (lay, (olf, ker)) in enumerate(zip(self._layouts, lvl_mats)):
            npix, b_r, w_r, s_r = lay["npix"], lay["b_r"], lay["w_r"], lay["s_r"]
            # windows: sphere gather × radial slice-stack
            xs_g = x[lay["stencil"]]  # (npix, 9, n_rc)
            rad_views = [
                xs_g[:, :, o : o + b_r] for o in range(w_r)
            ]  # each (npix, 9, b_r)
            win = jnp.stack(rad_views, axis=-1)  # (npix, 9, b_r, w_r)
            win = win.transpose(0, 2, 1, 3).reshape(npix, b_r, 9 * w_r)
            # children excitations
            xi = xs[lvl + 1].reshape(npix, 4, b_r, s_r)
            xi = xi.transpose(0, 2, 1, 3).reshape(npix, b_r, 4 * s_r)
            inv_s = jnp.asarray(lay["inv_s"])
            olf_p = olf[inv_s]  # (npix, b_r, C, W)
            ker_p = ker[inv_s]
            y = jnp.einsum("pbcw,pbw->pbc", olf_p, win) + jnp.einsum(
                "pbcw,pbw->pbc", ker_p, xi
            )
            y = y.reshape(npix, b_r, 4, s_r).transpose(0, 2, 1, 3)
            x = y.reshape(4 * npix, b_r * s_r)
        return x


class SphereRadiusICRField:
    """Correlated field on sphere × log-radius (3-D tomography prior)."""

    def __init__(self, grid: SphereLogRadiusGrid, kernel, *, offset=0.0,
                 prefix: str = "srf"):
        from ..model import Initializer, LazyModel, Model
        from ..utils.tree import ShapeWithDtype, random_like

        self.grid = grid
        self._name_exc = prefix + "excitations"
        if callable(kernel) and not isinstance(kernel, (Model, LazyModel)):
            self.covariance = None
            self.kernel = SphereRadiusICRKernel(grid, kernel)
            self.fixed_kernel = True
        else:
            self.covariance = kernel
            self.kernel = SphereRadiusICRKernel(grid, None)
            self.fixed_kernel = False
        self.offset = float(offset)
        shapes = [ShapeWithDtype(s) for s in grid.shapes]
        self.domain = {self._name_exc: shapes}
        init = {self._name_exc: partial(random_like, primals=shapes)}
        if not self.fixed_kernel:
            self.domain.update(self.covariance.domain)
            init.update(self.covariance.init._call_or_struct)
        self.init = Initializer(init)

    def __call__(self, x):
        mats = None
        if not self.fixed_kernel:
            mats = self.kernel.matrices(self.covariance(x))
        return self.offset + self.kernel.apply(x[self._name_exc], matrices=mats)
