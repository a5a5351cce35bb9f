"""Fused Pallas (Mosaic) 2-D Hartley transform for TPU.

The Hartley transform dominates the correlated-field metric application —
the reference's headline benchmark kernel (``misc/re/paper/
minimal_benchmark.py``, see BASELINE.md).  Profiling on a v5e shows XLA
executes the split-real four-step einsum pipeline (``ops/fft.py``) ~7-16x
above the HBM roofline at >=4096^2: every einsum stage, twiddle, fold
slice/reverse/concat round-trips HBM (42 materialized dots + 26
transposes + 9 reverses per metric apply in the optimized HLO).  This
module fuses the stage chains inside VMEM with Pallas:

- **P1** (rows): the full four-step along axis 1 — stage-A matmul,
  twiddle, stage-B matmul — in ONE kernel over row blocks.  Input is
  read once, the split-complex spectrum written once.  The row
  frequency comes out in factored order ``j_store = k1*128 + k2``
  (true ``k = k1 + N1*k2``); the column pass is a pure batch over
  lanes, so the unscramble is deferred to the very end.
- **P2** (columns): the full four-step along axis 0 over lane slabs —
  the whole column extent rides VMEM (raised ``vmem_limit_bytes``; the
  v5e has 128 MiB of VMEM, the 16 MiB default limit is just a compiler
  knob).  The natural C-order factorization makes both stages rank-3
  ``dot_general``s with the row width riding the 128-lane dimension —
  no transposes, and the output frequency order is natural (``k = k1 +
  N1'*k2`` equals the flat C-order index of the ``(k2, k1)`` result).
  The Hartley fold ``H = Re F - Im F`` is fused in, halving the final
  write (real instead of split-complex).
- **unscramble** (XLA): one minor-dims transpose
  ``(n0, N1, 128) -> (n0, 128, N1)`` restores the natural row-frequency
  order.

Dot precision: Mosaic supports only DEFAULT (one bf16 pass, ~3e-3
relative error — too lossy) and HIGHEST (six passes).  The kernels use
a **manual bf16x3 split** (x = hi + lo in bfloat16; drop the lo*lo
term): three MXU passes, measured 5e-6 relative error per stage —
equivalent to what `Precision.HIGH` lowers to elsewhere, at half the
HIGHEST cost.

Mosaic constraints honored (validated by compile canaries on a v5e):
the minor (lane) dimension of every rank-3 tensor entering a
``dot_general`` is a multiple of 128; reshapes are sublane-only; the
rank-3 transpose in P1 leaves lanes in place; block sublane dims are
8-divisible or span the full axis; no ``rev`` anywhere (the full
spectrum is computed, so the Hartley fold needs no reversals).

Four-step derivation (per axis of length n = N1*N2, natural C-order
reshape ``x2[i, b] = x[i*N2 + b]``, output split ``k = k1 + N1*k2``):

    F[k1 + N1*k2] = sum_b W_N2[b, k2] * tw[b, k1] * sum_i x2[i, b] * W_N1[i, k1]

with ``tw[b, k1] = exp(-2i pi b k1 / n)`` — identical tables to
``ops.fft._sr_tables``.

Reference behavior: ``nifty/re/correlated_field.py:24-30`` (Hartley via
complex fftn); this is a TPU-native re-design, not a translation.
"""

from __future__ import annotations

import jax
import numpy as np
from jax import numpy as jnp

__all__ = ["hartley2d_pallas", "pallas_hartley_supported"]

_LANE = 128
_VMEM_LIMIT = 100 * 1024 * 1024  # v5e: 128 MiB physical; leave headroom


def _tables(n: int, N1: int, N2: int, dtype=np.float32):
    """(W1[i,k1], tw[b,k1], W2[b,k2]) real/imag pairs, unnormalized DFT."""
    i = np.arange(N1)
    b = np.arange(N2)
    W1 = np.exp(-2j * np.pi * np.outer(i, i) / N1)
    tw = np.exp(-2j * np.pi * np.outer(b, i) / n)
    W2 = np.exp(-2j * np.pi * np.outer(b, b) / N2)
    c = lambda z: (np.ascontiguousarray(z.real.astype(dtype)),
                   np.ascontiguousarray(z.imag.astype(dtype)))
    return c(W1), c(tw), c(W2)


def _pow2_div(n: int, cap: int) -> int:
    """Largest power of two <= cap dividing n; >= 1."""
    d = 1
    while d * 2 <= cap and n % (d * 2) == 0:
        d *= 2
    return d


def _make_math(interpret: bool):
    """(split, dot3) pair: manual bf16x3 on TPU, plain f32 dots in
    interpret mode (CPU backends cannot execute BF16xBF16=F32 dots)."""
    if interpret:
        split = lambda x: (x, None)

        def dot3(ah, al, bh, bl, dn):
            return jax.lax.dot_general(
                ah, bh, dn, preferred_element_type=jnp.float32
            )

        return split, dot3

    def split(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def dot3(ah, al, bh, bl, dn):
        acc = jax.lax.dot_general(
            ah, bh, dn, preferred_element_type=jnp.float32
        )
        acc = acc + jax.lax.dot_general(
            ah, bl, dn, preferred_element_type=jnp.float32
        )
        acc = acc + jax.lax.dot_general(
            al, bh, dn, preferred_element_type=jnp.float32
        )
        return acc

    return split, dot3


def _compiler_params():
    from jax.experimental.pallas import tpu as pltpu

    try:
        return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    except TypeError:  # pragma: no cover - older pallas API
        return pltpu.TPUCompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


# --------------------------------------------------------------------------
# P1: fused row four-step (real input -> split-complex, factored freq order)
# --------------------------------------------------------------------------


def _make_p1_kernel(interpret: bool):
    split, dot3 = _make_math(interpret)

    def kernel(x_ref, w1r_ref, w1i_ref, twr_ref, twi_ref, w2r_ref, w2i_ref,
               fr_ref, fi_ref):
        # x: (R, N1, N2) real, lanes = N2 = 128
        xh, xl = split(x_ref[:])
        w1rh, w1rl = split(w1r_ref[:])
        w1ih, w1il = split(w1i_ref[:])
        dn_mid = (((0,), (1,)), ((), ()))  # contract i (sublane factor)
        yr = dot3(w1rh, w1rl, xh, xl, dn_mid)
        yi = dot3(w1ih, w1il, xh, xl, dn_mid)
        # (k1: N1, R, b: N2); twiddle tw[b, k1] arranged (N1, 1, N2)
        twr, twi = twr_ref[:], twi_ref[:]
        tr = yr * twr - yi * twi
        ti = yr * twi + yi * twr
        # stage B: contract b (lanes) with W2[b, k2] -> (N1, R, N2)
        dn_last = (((2,), (0,)), ((), ()))
        w2rh, w2rl = split(w2r_ref[:])
        w2ih, w2il = split(w2i_ref[:])
        trh, trl = split(tr)
        tih, til = split(ti)
        fr = (dot3(trh, trl, w2rh, w2rl, dn_last)
              - dot3(tih, til, w2ih, w2il, dn_last))
        fi = (dot3(trh, trl, w2ih, w2il, dn_last)
              + dot3(tih, til, w2rh, w2rl, dn_last))
        # (N1, R, N2) -> (R, N1, N2): lane-preserving rank-3 transpose
        fr_ref[:] = fr.transpose(1, 0, 2)
        fi_ref[:] = fi.transpose(1, 0, 2)

    return kernel


def _p1(x, interpret: bool):
    from jax.experimental import pallas as pl

    n0, n1 = x.shape
    N2 = _LANE
    N1 = n1 // N2
    (w1r, w1i), (twr, twi), (w2r, w2i) = _tables(n1, N1, N2)
    # tw[b, k1] -> (k1, 1, b) for broadcasting over the row block
    twr = np.ascontiguousarray(twr.T.reshape(N1, 1, N2))
    twi = np.ascontiguousarray(twi.T.reshape(N1, 1, N2))
    # row-block size: ~14 live block-sized buffers; keep blocks <= ~4 MiB
    R = _pow2_div(n0, max(8, (4 << 20) // (n1 * 4)))
    xv = x.reshape(n0, N1, N2)

    def cspec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, _n=nd: (0,) * _n)

    out_shape = [jax.ShapeDtypeStruct((n0, N1, N2), jnp.float32)] * 2
    fr, fi = pl.pallas_call(
        _make_p1_kernel(interpret),
        grid=(n0 // R,),
        in_specs=[
            pl.BlockSpec((R, N1, N2), lambda i: (i, 0, 0)),
            cspec(w1r), cspec(w1i), cspec(twr), cspec(twi),
            cspec(w2r), cspec(w2i),
        ],
        out_specs=[pl.BlockSpec((R, N1, N2), lambda i: (i, 0, 0))] * 2,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(xv, jnp.asarray(w1r), jnp.asarray(w1i), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(w2r), jnp.asarray(w2i))
    # (n0, N1, N2) -> (n0, n1): row-freq stored j = k1*N2 + k2
    return fr.reshape(n0, n1), fi.reshape(n0, n1)


# --------------------------------------------------------------------------
# P2: fused column four-step (split-complex in, real Hartley out)
# --------------------------------------------------------------------------


def _make_p2_kernel(interpret: bool):
    split, dot3 = _make_math(interpret)

    def kernel(xr_ref, xi_ref, w1r_ref, w1i_ref, twr_ref, twi_ref,
               w2r_ref, w2i_ref, h_ref):
        # x: (N1, N2, Mb) — the FULL column extent for a lane slab
        dn_i = (((0,), (0,)), ((), ()))  # contract i (lead) with W1[i, k1]
        xrh, xrl = split(xr_ref[:])
        xih, xil = split(xi_ref[:])
        w1rh, w1rl = split(w1r_ref[:])
        w1ih, w1il = split(w1i_ref[:])
        yr = (dot3(w1rh, w1rl, xrh, xrl, dn_i)
              - dot3(w1ih, w1il, xih, xil, dn_i))
        yi = (dot3(w1rh, w1rl, xih, xil, dn_i)
              + dot3(w1ih, w1il, xrh, xrl, dn_i))
        # twiddle tw[b, k1] arranged (N1, N2, 1), broadcast over lanes
        twr, twi = twr_ref[:], twi_ref[:]
        tr = yr * twr - yi * twi
        ti = yr * twi + yi * twr
        # stage B: contract b (mid) with W2[b, k2] -> (k2: N2, k1: N1, Mb)
        dn_b = (((0,), (1,)), ((), ()))
        w2rh, w2rl = split(w2r_ref[:])
        w2ih, w2il = split(w2i_ref[:])
        trh, trl = split(tr)
        tih, til = split(ti)
        cr = (dot3(w2rh, w2rl, trh, trl, dn_b)
              - dot3(w2ih, w2il, tih, til, dn_b))
        ci = (dot3(w2ih, w2il, trh, trl, dn_b)
              + dot3(w2rh, w2rl, tih, til, dn_b))
        # fused Hartley fold: H = Re F - Im F (full spectrum, no reversals)
        h_ref[:] = cr - ci

    return kernel


def _p2(fr, fi, interpret: bool):
    from jax.experimental import pallas as pl

    n0, M = fr.shape
    N2 = _LANE
    N1 = n0 // N2
    (w1r, w1i), (twr, twi), (w2r, w2i) = _tables(n0, N1, N2)
    twr = np.ascontiguousarray(twr.T.reshape(N1, N2, 1))
    twi = np.ascontiguousarray(twi.T.reshape(N1, N2, 1))

    frv = fr.reshape(N1, N2, M)
    fiv = fi.reshape(N1, N2, M)
    # lane-slab: the full column extent rides VMEM — keep each buffer
    # (n0 * Mb * 4 bytes, ~12 live) at or under ~4 MiB
    Mb = _LANE * _pow2_div(
        M // _LANE, max(1, (4 << 20) // (n0 * 4 * _LANE))
    )

    def cspec(arr):
        return pl.BlockSpec(arr.shape, lambda m, _n=arr.ndim: (0,) * _n)

    h = pl.pallas_call(
        _make_p2_kernel(interpret),
        grid=(M // Mb,),
        in_specs=[
            pl.BlockSpec((N1, N2, Mb), lambda m: (0, 0, m)),
            pl.BlockSpec((N1, N2, Mb), lambda m: (0, 0, m)),
            cspec(w1r), cspec(w1i), cspec(twr), cspec(twi),
            cspec(w2r), cspec(w2i),
        ],
        out_specs=pl.BlockSpec((N2, N1, Mb), lambda m: (0, 0, m)),
        out_shape=jax.ShapeDtypeStruct((N2, N1, M), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(frv, fiv, jnp.asarray(w1r), jnp.asarray(w1i), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(w2r), jnp.asarray(w2i))
    # flat column frequency k = k1 + N1*k2 == C-order index of (k2, k1)
    return h.reshape(n0, M)


# --------------------------------------------------------------------------
# public entry: full 2-D Hartley
# --------------------------------------------------------------------------


def _hartley2d_impl(x, interpret: bool):
    n0, n1 = x.shape
    N1 = n1 // _LANE
    fr, fi = _p1(x, interpret)  # (n0, n1): row freq j = k1*128 + k2
    h = _p2(fr, fi, interpret)  # column freq natural, rows still factored
    # unscramble rows: (k1, k2) -> flat k = k1 + N1*k2
    return jnp.swapaxes(h.reshape(n0, N1, _LANE), 1, 2).reshape(n0, n1)


def _plan_ok(shape) -> bool:
    if len(shape) != 2:
        return False
    n0, n1 = shape
    return (
        n0 % (2 * _LANE) == 0
        and n1 % (2 * _LANE) == 0
        and n0 >= 256
        and n1 >= 256
    )


def pallas_hartley_supported(shape, dtype) -> bool:
    return _plan_ok(tuple(shape)) and dtype == jnp.float32


# Linear, self-adjoint primitive so jvp/vjp/linear_transpose all reuse the
# same kernel (the full Hartley matrix is symmetric: H^T = H).
try:
    from jax.extend.core import Primitive
except ImportError:  # pragma: no cover - older jax
    from jax.core import Primitive
from jax.interpreters import ad, batching, mlir

_hartley2d_p = Primitive("nifty_hartley2d_pallas")


def _h2d_call(x):
    assert _plan_ok(x.shape)
    interpret = jax.default_backend() != "tpu"
    return _hartley2d_impl(x, interpret)


_hartley2d_p.def_impl(_h2d_call)
_hartley2d_p.def_abstract_eval(
    lambda x: jax.core.ShapedArray(x.shape, x.dtype)
)
ad.defjvp(_hartley2d_p, lambda t, x: _hartley2d_p.bind(t))
ad.primitive_transposes[_hartley2d_p] = lambda ct, x: (_hartley2d_p.bind(ct),)


def _h2d_batch(args, dims):
    (x,), (d,) = args, dims
    x = jnp.moveaxis(x, d, 0)
    return jax.lax.map(_hartley2d_p.bind, x), 0


batching.primitive_batchers[_hartley2d_p] = _h2d_batch
mlir.register_lowering(
    _hartley2d_p, mlir.lower_fun(_h2d_call, multiple_results=False)
)


def hartley2d_pallas(x):
    """2-D Hartley of a real f32 array via the fused Pallas four-step.

    Requires both axes to be multiples of 256 (see :func:`_plan_ok`); use
    :func:`pallas_hartley_supported` to check eligibility.  Matches
    ``ops.fft.hartley`` (unnormalized, H = Re F - Im F of the 2-D DFT) to
    ~1e-5 relative accuracy (bf16x3 MXU passes).
    """
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    return _hartley2d_p.bind(x)
