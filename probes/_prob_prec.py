import time, sys, numpy as np, jax, jax.numpy as jnp
import nifty_tpu
from nifty_tpu.ops import fft as F

n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
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

import jax.lax as lax
orig = F.hartley_splitreal
ref = np.asarray(jax.jit(orig)(x))

timeit(orig, x, label=f"{n}^2 splitreal HIGHEST")

# monkeypatch: replace Precision.HIGHEST with HIGH inside the module funcs
import re, types
src = open("nifty_tpu/ops/fft.py").read()
# compile a copy with HIGH
src2 = src.replace("jax.lax.Precision.HIGHEST", "jax.lax.Precision.HIGH")
mod = types.ModuleType("fft_high")
mod.__dict__["__file__"] = "fft_high"
exec(compile(src2, "fft_high", "exec"), mod.__dict__)
out2 = np.asarray(jax.jit(mod.hartley_splitreal)(x))
err = np.linalg.norm(out2 - ref) / np.linalg.norm(ref)
print(f"rel err HIGH vs HIGHEST: {err:.2e}", flush=True)
timeit(mod.hartley_splitreal, x, label=f"{n}^2 splitreal HIGH")
src3 = src.replace("jax.lax.Precision.HIGHEST", "jax.lax.Precision.DEFAULT")
mod3 = types.ModuleType("fft_def")
exec(compile(src3, "fft_def", "exec"), mod3.__dict__)
out3 = np.asarray(jax.jit(mod3.hartley_splitreal)(x))
err3 = np.linalg.norm(out3 - ref) / np.linalg.norm(ref)
print(f"rel err DEFAULT vs HIGHEST: {err3:.2e}", flush=True)
timeit(mod3.hartley_splitreal, x, label=f"{n}^2 splitreal DEFAULT")
