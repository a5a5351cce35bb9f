"""Probe (real TPU): cost of the candidate middle-stage implementations
for the expansion network at the 4096^2-exact scale (H=22016, T=172).

 A: fori_loop dynamic-roll rotate (current)        expected ~5 ms
 B: in-kernel (T,C,C)->(C,C,Tp) axis rotation + wide taa + back
 C: axis rotation via XLA between kernels (HBM round trip)
"""

import time
import sys

import jax
import numpy as np
from jax import numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 128
T = 172
Tp = 256
H = T * C

rng = np.random.default_rng(0)
x_np = rng.standard_normal((H, C)).astype(np.float32)
# a random per-(k,kappa) partial permutation over tiles: move[r, l] = delta
perm = np.stack([rng.permutation(Tp) for _ in range(C * C)])  # (C*C, Tp)
# move table for variant A: dest-indexed delta in [0, T)
# build from perm restricted to [0,T)x[0,T): for row kk, dest tile td takes
# src tile perm[kk, td] (mod T)
src_of = perm[:, :T] % T  # (C*C, T) source tile per dest tile
mvA = np.zeros((H, C), np.int32)
for k in range(C):
    for td in range(T):
        # row of dest = td*C + k; mvA[row, kappa] = (td - ts) % T
        kk = k * C + np.arange(C)
        ts = src_of[kk, td]
        mvA[td * C + k, :] = (td - ts) % T

idxB = np.zeros((C * C, Tp), np.int32)
idxB[:, :T] = src_of
kern_params = {}
try:
    kern_params["compiler_params"] = pltpu.CompilerParams(
        vmem_limit_bytes=110 * 2**20
    )
except Exception:
    pass


def vmem_call(kern, inputs, out_shape, out_dtype=jnp.float32):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        **kern_params,
    )(*inputs)


def variant_a(x, mv):
    def kern(x_ref, mv_ref, o_ref):
        X = x_ref[:]
        mv_ = mv_ref[:]

        def body(d, acc):
            return jnp.where(mv_ == d, pltpu.roll(X, d * C, 0), acc)

        o_ref[:] = jax.lax.fori_loop(0, T, body, jnp.zeros_like(X))

    return vmem_call(kern, (x, mv), (H, C))


def variant_b(x, idx):
    def kern(x_ref, i_ref, o_ref):
        X = x_ref[:]  # (H, C) = (T*C, C)
        Xp = jnp.concatenate(
            [X, jnp.zeros(((Tp - T) * C, C), jnp.float32)], axis=0
        )
        Z = jnp.transpose(Xp.reshape(Tp, C, C), (1, 2, 0)).reshape(C * C, Tp)
        idx_ = i_ref[:]
        halves = []
        for oh in range(Tp // C):
            io = idx_[:, oh * C : (oh + 1) * C].astype(jnp.int32)
            acc = jnp.zeros((C * C, C), jnp.float32)
            for sh in range(Tp // C):
                Zs = Z[:, sh * C : (sh + 1) * C]
                g = jnp.take_along_axis(
                    Zs, jnp.clip(io - sh * C, 0, C - 1), axis=1
                )
                acc = jnp.where((io >= sh * C) & (io < (sh + 1) * C), g, acc)
            halves.append(acc)
        Z2 = jnp.concatenate(halves, axis=1)
        Xb = jnp.transpose(Z2.reshape(C, C, Tp), (2, 0, 1)).reshape(
            Tp * C, C
        )
        o_ref[:] = Xb[:H]

    return vmem_call(kern, (x, idx), (H, C))


def time_it(name, f, *args):
    f2 = jax.jit(f)
    t0 = time.perf_counter()
    out = np.asarray(f2(*args))
    print(f"{name}: compile+run {time.perf_counter()-t0:.0f}s", flush=True)
    reps = 64

    @jax.jit
    def chain(x0, rest):
        def body(i, x):
            y = f(x, rest)
            return y * 0.999

        return jnp.sum(jax.lax.fori_loop(0, reps, body, x0) * 0)

    t0 = time.perf_counter()
    float(chain(args[0], args[1]))
    print(f"{name}: chain compile {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(chain(args[0], args[1]))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {(np.median(ts)-0.030)/reps*1e6:.1f} us/apply", flush=True)
    return out


x = jnp.asarray(x_np)
which = sys.argv[1] if len(sys.argv) > 1 else "ab"

# correctness reference for the movement (variant semantics: out row
# td*C+k lane kappa = in row ts*C+k lane kappa with ts = src_of[k*C+kappa, td])
ref = np.zeros((H, C), np.float32)
for k in range(C):
    kk = k * C + np.arange(C)
    for td in range(T):
        ts = src_of[kk, td]
        ref[td * C + k, :] = x_np[ts * C + k, np.arange(C)]

if "a" in which:
    outa = time_it("A_rollloop", variant_a, x, jnp.asarray(mvA))
    print("A err:", np.abs(outa - ref).max(), flush=True)
if "b" in which:
    outb = time_it("B_axisrot", variant_b, x, jnp.asarray(idxB))
    print("B err:", np.abs(outb - ref).max(), flush=True)
