"""Primitive-cost probes on the attached TPU: compare this chip/toolchain
against the numbers measured earlier in r2 (code-comment baselines):
  pallas f32 stencil matvec @1M k=8 : 1.4 ms
  XLA   f32 stencil matvec @1M k=8 : 46.5 ms
  XLA   f64 stencil matvec @1M k=8 : 21.9 ms
  f32 V-cycle (plain)      @1M     : ~76 ms (in-graph)
Run: python scripts/probe_tpu.py [nx ny]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
ny = int(sys.argv[2]) if len(sys.argv) > 2 else 512
ndof, k = 2, 8
n = (nx + 1) * (ny + 1) * ndof

from eigd_tpu.ops.stencil import stencil_matvec  # noqa: E402
from eigd_tpu.ops import pallas_stencil as ps  # noqa: E402

rng = np.random.default_rng(0)
W64 = jnp.asarray(rng.standard_normal((nx + 1, ny + 1, 3, 3, ndof, ndof)))
W32 = W64.astype(jnp.float32)
x64 = jnp.asarray(rng.standard_normal((n, k)))
x32 = x64.astype(jnp.float32)
Wp = ps.stencil_planes(W32, ndof)
Wdd = ps.stencil_planes_dd(W64, ndof)
xq = ps.to_planes(x32, nx, ny, ndof)


def timeit(name, fn, *args, reps=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:38s} {dt:8.3f} ms")
    return dt


timeit("XLA f32 stencil matvec", lambda W, x: stencil_matvec(W, x, nx, ny, ndof), W32, x32)
timeit("XLA f64 stencil matvec", lambda W, x: stencil_matvec(W, x, nx, ny, ndof), W64, x64)
timeit("pallas f32 matvec (planes)",
       lambda Wp_, xq_: ps.matvec_planes(Wp_, xq_, nx, ny, ndof), Wp, xq)
timeit("dd f64 matvec", lambda Wdd_, x_: ps.dd_stencil_matvec(Wdd_, x_, nx, ny, ndof), Wdd, x64)

# raw MXU / HBM probes
a32 = jnp.asarray(rng.standard_normal((4096, 4096)), dtype=jnp.float32)
dt = timeit("f32 4096^3 matmul", lambda a: a @ a, a32, reps=20)
print(f"  -> {2 * 4096**3 / (dt / 1e3) / 1e12:.1f} TFLOP/s f32")
abf = a32.astype(jnp.bfloat16)
dt = timeit("bf16 4096^3 matmul", lambda a: (a @ a), abf, reps=20)
print(f"  -> {2 * 4096**3 / (dt / 1e3) / 1e12:.1f} TFLOP/s bf16")
big = jnp.asarray(rng.standard_normal(2 ** 27), dtype=jnp.float32)  # 512 MB
dt = timeit("f32 512MB sum", jnp.sum, big, reps=10)
print(f"  -> {big.nbytes / (dt / 1e3) / 1e9:.0f} GB/s read")
dt = timeit("f32 512MB scale (r+w)", lambda b: 1.0001 * b, big, reps=10)
print(f"  -> {2 * big.nbytes / (dt / 1e3) / 1e9:.0f} GB/s r+w")

# tall-skinny f64 GEMM (Lanczos basis contraction shape)
V = jnp.asarray(rng.standard_normal((n, 176)))
dt = timeit("f64 (176,n)@(n,8) GEMM", lambda V_, x_: V_.T @ x_, V, x64, reps=10)
# dispatch latency probe
tiny = jnp.zeros(8)
f = jax.jit(lambda t: t + 1)
jax.block_until_ready(f(tiny))
t0 = time.perf_counter()
for _ in range(50):
    out = f(tiny)
jax.block_until_ready(out)
print(f"dispatch+roundtrip tiny jit: {(time.perf_counter() - t0) / 50 * 1e3:.2f} ms")
t0 = time.perf_counter()
for _ in range(20):
    jax.block_until_ready(f(tiny))
print(f"sync dispatch tiny jit:      {(time.perf_counter() - t0) / 20 * 1e3:.2f} ms")
