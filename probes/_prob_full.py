import time, sys, numpy as np, jax, jax.numpy as jnp
import nifty_tpu
from nifty_tpu.ops import fft as F

n = int(sys.argv[1])
x = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)).astype(np.float32))

def timeit(f, x, k=8, n_=3, label=""):
    @jax.jit
    def c(x):
        def body(i, x):
            return f(x) * (1.0 / x.size)
        return jax.lax.fori_loop(0, k, body, x).ravel()[:1]
    float(c(x)[0])
    ts = []
    for _ in range(n_):
        t0 = time.perf_counter(); float(c(x)[0]); ts.append((time.perf_counter()-t0)/k)
    print(f"{label}: {np.median(ts)*1e3:.3f} ms", flush=True)

def hartley_nofold(x):
    n0, n1 = x.shape
    fr, fi = F._sr_fourstep_real_last(x, half=False)
    fr, fi = F._sr_fourstep_cplx_axis0(fr, fi, n0)
    return fr - fi

ref = np.asarray(jax.jit(F.hartley_splitreal)(x))
out = np.asarray(jax.jit(hartley_nofold)(x))
print("rel err:", np.linalg.norm(out - ref) / np.linalg.norm(ref), flush=True)
timeit(F.hartley_splitreal, x, label=f"{n}^2 splitreal half+fold")
timeit(hartley_nofold, x, label=f"{n}^2 splitreal full-nofold")
