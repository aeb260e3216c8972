"""V-cycle internals at 1M DOF k=8: per-level matvec_planes at TX=8/16,
cheb_smooth, transfers, full V-cycle, precond_mv, sweep apply.

Harness: the ONLY reliable timing through the axon tunnel is a lax.scan
INSIDE one jit that chains each iteration's input to the previous output
(re-dispatches of identical (executable, args) pairs are served from a
cache, and block_until_ready is not a barrier — measured both), followed
by a host read. An empty-scan baseline is subtracted.
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

_BASE = None


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(label, fn, big, x0, n=8):
    """Time fn(big, x) chained: x_{i+1} = x_i perturbed by out_i summary."""
    global _BASE

    @jax.jit
    def run(big, x0, seed):
        x0 = x0 * (1.0 + jnp.asarray(seed, x0.dtype) * 1e-9)

        def body(carry, _):
            x, acc = carry
            out = fn(big, x)
            leaves = jax.tree_util.tree_leaves(out)
            v = sum(jnp.sum(jnp.ravel(f)[:128].astype(jnp.float64) ** 2)
                    for f in leaves)
            x = x * (1.0 + 1e-30 * v.astype(x.dtype))
            return (x, acc + v), None

        (x, acc), _ = jax.lax.scan(body, (x0, jnp.float64(0.0)), None,
                                   length=n)
        return acc

    if _BASE is None:
        @jax.jit
        def empty(x0, seed):
            return jnp.sum(x0.ravel()[:8].astype(jnp.float64)) + seed

        float(empty(x0, 0.0))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            float(empty(x0, float(i + 1)))
            ts.append(time.perf_counter() - t0)
        _BASE = min(ts)
        log(f"  [sync baseline {_BASE * 1e3:.1f} ms]")

    float(run(big, x0, 0.0))  # warm/compile
    t0 = time.perf_counter()
    float(run(big, x0, 1.0))
    dt = (time.perf_counter() - t0 - _BASE) / n
    log(f"  {label}: {dt * 1e3:.2f} ms")
    return dt


def main():
    from eigd_tpu.ops.pallas_stencil import matvec_planes
    from eigd_tpu.ops.multigrid import cheb_smooth_planes

    topo = bench.make_topo()
    from eigd_tpu.fem import assembly as fem

    rho = topo.fltr.apply(jnp.asarray(topo.x))
    theta = fem.element_density(rho, topo.conn)

    @jax.jit
    def build(theta):
        A, B = topo.problem.assemble(theta)
        return topo.problem.factor(A, B, topo.cfg.sigma, topo.cfg.mode)

    fac = build(theta)
    k = 8
    rng = np.random.default_rng(0)

    for lvl in (0, 1):
        nx, ny = fac.shapes[lvl]
        xq = jnp.asarray(rng.standard_normal(
            (fac.ndof, k, nx + 1, ny + 1)).astype(np.float32))
        for TX in (8, 16):
            timeit(f"L{lvl} matvec_planes TX={TX} ({nx}x{ny})",
                   lambda W, x, TX=TX, nx=nx, ny=ny: matvec_planes(
                       W, x, nx, ny, fac.ndof, TX=TX),
                   fac.Wps[lvl], xq)
        dinvp = jax.jit(fac._dinv_planes, static_argnums=0)(lvl)
        timeit(f"L{lvl} cheb_smooth deg{fac.degree}",
               lambda W, b, lvl=lvl, nx=nx, ny=ny, dinvp=dinvp: (
                   cheb_smooth_planes(
                       lambda xq: matvec_planes(W, xq, nx, ny, fac.ndof),
                       dinvp, fac.lmaxs[lvl], None, b,
                       degree=fac.degree)),
               fac.Wps[lvl], xq)

    nx, ny = fac.shapes[0]
    xq = jnp.asarray(rng.standard_normal(
        (fac.ndof, k, nx + 1, ny + 1)).astype(np.float32))
    timeit("FULL V-cycle (planes)",
           lambda fac, b: fac._vcycle_planes(0, b, False), fac, xq, n=5)

    x = jnp.asarray(rng.standard_normal((fac.shape[0], k)))
    timeit("precond_mv (vector in/out)",
           lambda fac, x: fac.precond_mv(x), fac, x, n=5)
    x32 = x.astype(jnp.float32)
    timeit("sweep apply (_pcg32 @ approx)",
           lambda fac, x: fac._pcg32(x, fac.approx_rtol,
                                     fac.approx_maxiter)[0], fac, x32, n=5)
    timeit("dd f64 matvec (_matvec64)",
           lambda fac, x: fac._matvec64(x), fac, x, n=5)


if __name__ == "__main__":
    main()
