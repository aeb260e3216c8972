"""Attribute the 1M-DOF per-step non-apply cost (~140 ms measured in-sweep).

Measurement harness: each op is iterated inside ONE jitted lax.scan with a
data dependency between iterations (the output perturbs the next input), so
neither the axon tunnel nor XLA can cache/elide repeated identical
executions — per-call wall timings of same-input dispatches measured 0.02 ms
for 0.7 GB-read GEMMs, which is physically impossible (~1000x under the HBM
bound) and means same-args dispatches are served from a cache somewhere in
the stack.
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
    """Time fn(big, small) with small perturbed per iteration.

    big is the heavy operand (basis); small is cheap to perturb. The scan
    carry threads a scalar derived from the output into the next small
    operand, forcing sequential real executions.
    """
    @jax.jit
    def run(big, small):
        def body(carry, _):
            s, acc = carry
            out = fn(big, small + s.astype(small.dtype))
            v = jnp.sum(
                jnp.asarray(out[0] if isinstance(out, tuple) else out)
                [..., :1]).astype(jnp.float64)
            return (v * 1e-30, acc + v), None

        (s, acc), _ = jax.lax.scan(body, (jnp.float64(0.0),
                                          jnp.float64(0.0)),
                                   None, length=n)
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
    from jax.scipy.linalg import solve_triangular

    from eigd_tpu.ops.collective import chunked_dot_f32, dd_dot, dd_dot_rowsT
    from eigd_tpu.ops.lanczos import b_qr_tall

    n = 1051650
    p = 8
    rows = 184
    rng = np.random.default_rng(0)
    BV = jnp.asarray(rng.standard_normal((rows, n)))
    V32 = BV.astype(jnp.float32)
    w = jnp.asarray(rng.standard_normal((n, p)))
    w16 = jnp.asarray(rng.standard_normal((n, 2 * p)))
    BVp = BV[:2 * p]
    h16 = jnp.asarray(rng.standard_normal((2 * p, p)))
    h184_32 = jnp.asarray(
        rng.standard_normal((rows, p)).astype(np.float32))
    L8 = jnp.asarray(np.linalg.cholesky(
        np.eye(p) + 0.01 * rng.standard_normal((p, p)) @ np.eye(p)))

    log(f"shapes: basis ({rows}, {n}) f64 = {rows * n * 8 / 1e9:.2f} GB")
    t_hg = timeit("dd_dot(BV, w16) [hg]",
                  lambda b, s: dd_dot(b, s), BV, w16)
    t_h1 = timeit("dd_dot(BVp(16), w)",
                  lambda b, s: dd_dot(b, s), BVp, w)
    t_rT = timeit("dd_dot_rowsT(BVp(16), h)",
                  lambda b, s: dd_dot_rowsT(b, s), BVp, h16)
    t_cf = timeit("chunked_dot_f32(BV32, w)",
                  lambda b, s: chunked_dot_f32(b, s), V32,
                  w.astype(jnp.float32))

    def rows_T_dot(Vrows, h):
        return jax.lax.dot_general(Vrows, h, (((0,), (0,)), ((), ())),
                                   preferred_element_type=Vrows.dtype)

    t_rt32 = timeit("rows_T_dot(V32, h) f32", rows_T_dot, V32, h184_32)

    def tri(L, X):
        return solve_triangular(L8, X.T, lower=True).T

    t_tri = timeit("solve_triangular(L8, w.T) f64", tri, L8, w)

    def dus(V, Qt):
        return jax.lax.dynamic_update_slice_in_dim(V, Qt, 96, axis=0)

    t_dus = timeit("dyn_update_slice V(184,n) <- (8,n)", dus, BV, w.T)

    topo = bench.make_topo()
    from eigd_tpu.fem import assembly as fem

    rho = topo.fltr.apply(jnp.asarray(topo.x))
    theta = fem.element_density(rho, topo.conn)

    @jax.jit
    def getB(theta):
        A, B = topo.problem.assemble(theta)
        return B.with_pallas()

    Bp = getB(theta)
    t_bmv = timeit("B.mv(w) PALLAS dd", lambda b, s: b.mv(s), Bp, w)

    t_qr = timeit("b_qr_tall(w, pallas B.mv)",
                  lambda b, s: b_qr_tall(s, b.mv, axis=None)[0], Bp, w,
                  n=5)

    per_step = (t_hg + 2 * t_h1 + 2 * t_rT + 2 * (t_cf + t_rt32) + t_qr
                + 4 * t_dus)
    log(f"ledger per step (excl apply): hg {t_hg*1e3:.1f} + local dd "
        f"{2*(t_h1+t_rT)*1e3:.1f} + f32 far {2*(t_cf+t_rt32)*1e3:.1f} + "
        f"bqr {t_qr*1e3:.1f} + 4x dus {4*t_dus*1e3:.1f} = "
        f"{per_step*1e3:.1f} ms (measured in-sweep: ~140 ms)")


if __name__ == "__main__":
    main()
