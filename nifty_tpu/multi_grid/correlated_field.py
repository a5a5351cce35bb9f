"""Multi-grid correlated field: a GP on charted grids via ICR.

Excitations live per refinement level; the ICR kernel colors them
coarse-to-fine with matrices derived from a (possibly learned) isotropic
covariance.  O(N) in the number of fine pixels — the scaling path to
10⁸–10⁹ parameter fields (reference:
``nifty/re/multi_grid/correlated_field.py:21`` ``ICRField``; independent
implementation).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Union

from jax import numpy as jnp

from ..model import LazyModel, Model, WrappedCall
from ..models.prior import NormalPrior
from ..utils.tree import ShapeWithDtype, random_like
from .grid import Grid
from .kernel import ICRKernel

__all__ = ["ICRField"]


class ICRField(LazyModel):
    """Correlated field on an arbitrarily charted (multi-)grid.

    Parameters
    ----------
    grid :
        The refinement chart (``SimpleOpenGrid`` / ``LogGrid`` /
        ``MGrid``).
    kernel :
        Either a plain callable ``cov(r)`` (fixed covariance; refinement
        matrices precomputed once) or a :class:`~nifty_tpu.model.Model`
        whose ``__call__(params)`` returns such a callable (learned
        covariance, e.g. :class:`~nifty_tpu.multi_grid.matern.
        MaternCovarianceModel`; matrices are rebuilt per evaluation —
        cheap thanks to stencil deduplication).
    offset :
        Constant float, ``(mean, std)`` tuple (Normal prior), or Model.
    """

    covariance: Union[Model, None] = dataclasses.field(
        metadata=dict(static=False)
    )
    offset: Union[Model, float] = dataclasses.field(metadata=dict(static=False))

    def __init__(
        self,
        grid: Grid,
        kernel,
        *,
        offset=0.0,
        rtol: float = 1e-5,
        atol: float = 1e-10,
        prefix: str = "icr",
    ):
        self.grid = grid
        self._name_exc = str(prefix) + "excitations"

        if isinstance(kernel, Model) or isinstance(kernel, LazyModel):
            self.covariance = kernel
            self.kernel = ICRKernel(grid, None, rtol=rtol, atol=atol)
            self.fixed_kernel = False
        elif callable(kernel):
            self.covariance = None
            self.kernel = ICRKernel(grid, kernel, rtol=rtol, atol=atol)
            self.fixed_kernel = True
        else:
            raise TypeError(f"invalid kernel {kernel!r}")

        shapes = [
            ShapeWithDtype(grid.shapes[lvl]) for lvl in range(grid.depth + 1)
        ]
        domain = {self._name_exc: shapes}
        init = {
            self._name_exc: partial(
                random_like, primals=domain[self._name_exc]
            )
        }
        if not self.fixed_kernel:
            domain.update(self.covariance.domain)
            init.update(self.covariance.init._call_or_struct)

        name_off = prefix + "offset"
        if isinstance(offset, (tuple, list)):
            offset = NormalPrior(*offset, name=name_off)
        if isinstance(offset, (Model, LazyModel)):
            domain.update(offset.domain)
            init.update(offset.init._call_or_struct)
        elif not isinstance(offset, (int, float)):
            raise TypeError(f"invalid offset {offset!r}")
        self.offset = offset

        super().__init__(domain=domain, init=init)

    def __call__(self, x):
        mats = None
        if not self.fixed_kernel:
            cov_fn = self.covariance(x)
            mats = self.kernel.matrices(cov_fn)
        off = (
            self.offset(x)
            if isinstance(self.offset, (Model, LazyModel))
            else self.offset
        )
        return off + self.kernel.apply(x[self._name_exc], matrices=mats)
