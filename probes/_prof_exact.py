import time, numpy as np, jax, jax.numpy as jnp
from jax import random
import nifty_tpu as nt
from nifty_tpu.ops.mode_expand import mode_expand

shape = (1280, 1280)
cfm = nt.CorrelatedFieldMaker("cf")
cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
cfm.add_fluctuations(shape, distances=1.0/shape[0], fluctuations=(1.0, 5e-1),
                     loglogavgslope=(-3.0, 2e-1), flexibility=(1e0, 2e-1))
cf = cfm.finalize()
dist = cf.distributors[0]; layout = cf.dist_layouts[0]
U = layout.n_unique
print("n_unique", U, "packed", layout.packed_shape, flush=True)
tab = jnp.asarray(np.random.default_rng(0).standard_normal((U,)).astype(np.float32))
core = jnp.asarray(np.random.default_rng(1).standard_normal(layout.core_shape).astype(np.float32))

def chain(f, x, k):
    @jax.jit
    def c(x):
        def body(i, x):
            y = f(x)
            return jax.tree_util.tree_map(lambda a, b: b * 1e-6 + a * 0.999, x, jax.tree_util.tree_map(lambda q: q.reshape(jax.tree_util.tree_leaves([x])[0].shape) if False else q, x))
        return jax.lax.fori_loop(0, k, body, x)
    return c

def timeit(f, x, k=256, n=3, label=""):
    # f: x -> x (same shape) so it can chain
    @jax.jit
    def c(x):
        def body(i, x):
            return f(x)
        r = jax.lax.fori_loop(0, k, body, x)
        return jnp.sum(r * 0).ravel()[:1]
    float(c(x)[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); float(c(x)[0]); ts.append((time.perf_counter()-t0)/k)
    print(f"{label}: {np.median(ts)*1e3:.4f} ms", flush=True)
    return float(np.median(ts))

# gather fwd: tab -> core -> reduce back to tab-shaped via cheap slice? need same shape to chain.
fwd = lambda t: mode_expand(t, dist, layout)
g = timeit(lambda t: fwd(t).ravel()[:U] * 1e-3 + t, tab, k=128, label="gather fwd (+flatten slice)")
# transpose: core -> tab -> back to core cheap
tr = jax.linear_transpose(fwd, tab)
s = timeit(lambda c_: c_ * 0.999 + tr(c_)[0].sum() * 1e-9, core, k=128, label="scatter transpose (+eps)")
# lsm / rsm / metric on the full model
pos = nt.Vector(jax.tree_util.tree_map(jnp.asarray, jax.tree_util.tree_map(
    lambda sd: np.random.default_rng(2).standard_normal(sd.shape).astype(sd.dtype),
    jax.eval_shape(cf.init, random.PRNGKey(0)))))
data = np.random.default_rng(3).poisson(1.0, size=shape).astype(np.int32)
fwdm = nt.ChainModel(jnp.exp, cf)
lh = nt.Poissonian(jnp.asarray(data)).amend(fwdm)
tan = jax.tree_util.tree_map(lambda a: a + 0, pos)
met = lambda t: jax.tree_util.tree_map(lambda a, b: (a + b) * 0.5, lh.metric(pos, t), t)
timeit(met, tan, k=64, label="full metric apply")
# forward model alone
x0 = pos.tree["cfxi"]
timeit(lambda x: cf(nt.Vector({**pos.tree, "cfxi": x})) [:, :]*1e-6 + x, x0, k=64, label="cf forward")
