"""1M-DOF factor-apply microprobe: what does one forward-sweep apply
actually cost, and where? Measures, on the real chip at the bench factor:
  - one f32 V-cycle (precond_mv) at k=8/16
  - one fine-level Pallas matvec at k=8/16
  - one sweep_mv / approx_mv apply (f32 PCG @ approx_rtol/maxiter) + its
    actual iteration count
  - one accurate mv (f64 PCG @ rtol) + iteration count
This decides the 1M forward recipe: 22 sweep applies x niter x
(V-cycle + matvec) is the 5.1 s (VERDICT r4 item 2).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

os.environ.setdefault("EIGD_BENCH_NX", "1024")
os.environ.setdefault("EIGD_BENCH_NY", "512")
os.environ["EIGD_BENCH_SKIP_1M"] = "1"

import bench  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(out):
    # block_until_ready is NOT a reliable barrier through the axon tunnel
    # (measured: 32 dispatches of a 2 GB-read GEMM "block" in 3.9 ms); a
    # host read of a derived scalar is. The executions queue in order, so
    # syncing the last output drains the whole timed sequence.
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(jnp.asarray(leaf)[..., :1].astype(jnp.float64)))


def timeit(label, fn, *args, n=8):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn_j(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    log(f"  {label}: {dt * 1e3:.2f} ms")
    return out, dt


def main():
    topo = bench.make_topo()
    x0 = jnp.asarray(topo.x)
    from eigd_tpu.fem import assembly as fem

    rho = topo.fltr.apply(x0)
    theta = fem.element_density(rho, topo.conn)

    @jax.jit
    def build(theta):
        A, B = topo.problem.assemble(theta)
        fac = topo.problem.factor(A, B, topo.cfg.sigma, topo.cfg.mode)
        return fac

    t0 = time.perf_counter()
    fac = build(theta)
    jax.block_until_ready(jax.tree_util.tree_leaves(fac))
    log(f"factor build (compile+run): {time.perf_counter() - t0:.1f}s")
    log(f"levels: {fac.shapes}, degree={fac.degree}, "
        f"approx=({fac.approx_rtol},{fac.approx_maxiter}), "
        f"sweep=({fac.sweep_rtol},{fac.sweep_maxiter}), "
        f"rtol={fac.rtol}, maxiter={fac.maxiter}, stag={fac.stag_bad}")

    n = fac.shape[0]
    rng = np.random.default_rng(0)
    for k in (8, 16):
        x = jnp.asarray(rng.standard_normal((n, k)))
        log(f"-- k={k}")
        timeit("V-cycle (precond_mv)", fac.precond_mv, x)
        x32 = x.astype(jnp.float32)
        timeit("fine f32 matvec", fac._matvec32, x32)
        timeit("fine dd f64 matvec", fac._matvec64, x)

        def sweep_info(xx):
            y, info = fac._pcg32(xx.astype(jnp.float32), fac.approx_rtol,
                                 fac.approx_maxiter)
            return y, info["niter"], info["res2"], info["tol2"]

        (y, ni, r2, t2), dt = timeit("sweep apply (f32 PCG)", sweep_info, x)
        log(f"    niter={int(ni)}  maxres/tol="
            f"{float(jnp.sqrt(jnp.max(r2 / t2))):.2e}")

        def acc_info(xx):
            y, info = fac.mv_info(xx)
            return y, info["niter"], info["res2"], info["tol2"]

        (y, ni, r2, t2), dt = timeit("accurate apply (f64 PCG)", acc_info,
                                     x, n=3)
        log(f"    niter={int(ni)}  maxres/tol="
            f"{float(jnp.sqrt(jnp.max(r2 / t2))):.2e}")


if __name__ == "__main__":
    main()
