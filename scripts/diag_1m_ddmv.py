"""Where do the dd B.mv's 23 ms go at 1M DOF k=8? Times the Pallas kernel
with and without the f64 marshalling (split of x, final f64 combine,
layout transposes), using the chained-scan harness (see diag_1m_step.py —
same-args dispatches are cache-served somewhere in the axon stack and
linear scalar summaries get algebraically factored by XLA, so every probe
chains iterations through a nonlinear summary).
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


def timeit(label, fn, big, small, n=8):
    @jax.jit
    def run(big, small):
        def body(carry, _):
            s, acc = carry
            out = fn(big, small + s.astype(small.dtype))
            flat = jax.tree_util.tree_leaves(out)
            v = sum(jnp.sum(f[:8] * f[:8]).astype(jnp.float64)
                    for f in flat)
            return (v * 1e-30, acc + v), None

        (s, acc), _ = jax.lax.scan(
            body, (jnp.float64(0.0), jnp.float64(0.0)), None, length=n)
        return acc

    out = run(big, small)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(big, small)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    log(f"  {label}: {dt * 1e3:.2f} ms (scan/{n})")
    return dt


def main():
    from eigd_tpu.ops import pallas_stencil as ps

    nx, ny, ndof = 1024, 512, 2
    n = (nx + 1) * (ny + 1) * ndof
    p = 8
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((n, p)))
    w32 = w.astype(jnp.float32)

    topo = bench.make_topo()
    from eigd_tpu.fem import assembly as fem

    rho = topo.fltr.apply(jnp.asarray(topo.x))
    theta = fem.element_density(rho, topo.conn)

    @jax.jit
    def getB(theta):
        A, B = topo.problem.assemble(theta)
        return B.with_pallas()

    Bp = getB(theta)
    Wdd = Bp.Wdd
    Wps = Bp.Wps

    timeit("dd B.mv full (k=8 f64)", lambda b, s: b.mv(s), Bp, w)
    timeit("f32 B.mv (k=8 plane path)",
           lambda b, s: ps.pallas_stencil_matvec(b, s, nx, ny, ndof),
           Wps, w32)
    timeit("dd k=4 single call",
           lambda b, s: ps.dd_stencil_matvec(b, s, nx, ny, ndof),
           Wdd, w[:, :4])

    # marshalling pieces
    def split_only(b, x):
        xh = x.astype(jnp.float32)
        cs = xh * jnp.float32(4097.0)
        x1 = cs - (cs - xh)
        x2 = xh - x1
        xl = (x - xh.astype(jnp.float64)).astype(jnp.float32)
        return x1, x2, xl

    timeit("x split (f64 sub) k=8", split_only, None, w)

    s32 = w.astype(jnp.float32)
    c32 = (w - s32.astype(jnp.float64)).astype(jnp.float32) * 1e-8

    def combine(b, s):
        return s.astype(jnp.float64) + c32.astype(jnp.float64)

    timeit("f64 combine (astype+add) k=8", combine, None, s32)

    def planes_rt(b, x):
        return ps.from_planes(
            ps.to_planes(x, nx, ny, ndof), nx, ny, ndof)

    timeit("to_planes+from_planes f32 k=8", planes_rt, None, w32)
    timeit("to_planes+from_planes f64 k=8", planes_rt, None, w)


if __name__ == "__main__":
    main()
