"""Micro-timings of the 263k solver primitives on the TPU: one f32 V-cycle,
one sweep_mv (f32 PCG at the sweep budget), one accurate mv, one dd B.mv,
one dd Gram GEMM against the full basis, one block-Lanczos sweep step.
Identifies the fixed per-step cost the iteration-count ablation exposed."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(label, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    log(f"  {label}: {dt * 1e3:.2f} ms")
    return out, dt


def main():
    topo = bench.make_topo()
    x0 = jnp.asarray(topo.x)
    from eigd_tpu.fem import assembly as fem
    from eigd_tpu.ops.autodiff import staged_eigh_gen_vjp

    cfg = topo.cfg
    fwd_prog, _ = staged_eigh_gen_vjp(topo.problem, cfg, split_factor=True,
                                      chunk_forward=1)
    rho = topo.fltr.apply(x0)
    theta = fem.element_density(rho, topo.conn)
    A, B, factor, deflate, v0 = jax.block_until_ready(
        fwd_prog.build_prog(theta))

    n = A.shape[0]
    p = cfg.block
    rng = np.random.default_rng(0)
    Xp = jnp.asarray(rng.standard_normal((n, p)))
    Xw = jnp.asarray(rng.standard_normal((n, cfg.N + 8)))

    timeit("f32 V-cycle (precond_mv, p=8)",
           jax.jit(factor.precond_mv), Xp.astype(jnp.float32))
    timeit("sweep_mv (f32 PCG @ sweep budget, p=8)",
           jax.jit(factor.sweep_mv), Xp)
    timeit("approx_mv (f32 PCG 1e-5, p=8)",
           jax.jit(factor.approx_mv), Xp)
    timeit("accurate mv (f64 PCG rtol 1e-11, p=8)",
           jax.jit(factor.mv), Xp)
    timeit("accurate mv (f64 PCG rtol 1e-11, p=14)",
           jax.jit(factor.mv), Xw)
    timeit("B.mv dd stencil (p=8)", jax.jit(B.mv), Xp)
    timeit("A.mv dd stencil (p=8)", jax.jit(A.mv), Xp)

    from eigd_tpu.ops.collective import dd_dot, dd_dot_rowsT

    mtot = -(-cfg.m // p) * p
    V = jnp.asarray(rng.standard_normal((mtot + p, n)))
    timeit(f"dd_dot V({mtot + p},n) x (n,{p})", jax.jit(dd_dot), V, Xp)
    timeit(f"dd_dot_rowsT V x ({mtot + p},{p})", jax.jit(dd_dot_rowsT), V,
           jnp.asarray(rng.standard_normal((mtot + p, p))))

    # one sweep step via the chunk program
    carry = jax.block_until_ready(
        fwd_prog.start_prog(A, B, factor, deflate, v0))

    def one_step(c):
        return fwd_prog.chunk_prog(A, B, factor, c, deflate, 0, 1)

    c1 = one_step(carry)
    jax.block_until_ready(c1)
    t0 = time.perf_counter()
    c2 = fwd_prog.chunk_prog(A, B, factor, c1, deflate, 1, 1)
    jax.block_until_ready(c2)
    log(f"  one sweep block step (t=1): {(time.perf_counter() - t0) * 1e3:.2f} ms")
    t0 = time.perf_counter()
    c3 = fwd_prog.chunk_prog(A, B, factor, c2, deflate, 2, 4)
    jax.block_until_ready(c3)
    log(f"  four sweep block steps (t=2..5): {(time.perf_counter() - t0) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
