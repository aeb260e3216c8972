"""Micro-timings of the per-block-step basis operations at 1M DOF, block
p=8, basis rows (q+1)p=184 — the ~140 ms/step of non-apply work found by
diag_1m_fwd_parts.py (sweep 196 ms/step vs 56 ms apply).

Per step (ops/lanczos.py _block_lanczos_setup.step, ortho="local"):
  hg     = dd_dot(BV, [w|Vblk])            (184, n) x (n, 16)  dd f64
  h1l/h2l= dd_dot(BVp, w) x2               (16, n)  x (n, 8)   dd f64
  -      dd_dot_rowsT(Vp, h) x2            (16, n)^T x (16, 8) dd f64
  hfar   = chunked_dot_f32(BV32, w) x2     (184, n) x (n, 8)   f32
  -      rows_T_dot(V32, hfar) x2          (184, n)^T x (184, 8) f32
  b_qr   = b_qr_tall(w, B.mv)              2x [B.mv (dd stencil) + dd Gram]
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


def timeit(label, fn, *args, n=10):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    log(f"  {label}: {dt * 1e3:.2f} ms")
    return dt


def main():
    from eigd_tpu.ops.collective import (chunked_dot_f32, dd_dot,
                                         dd_dot_rowsT)
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
    h184_32 = jnp.asarray(rng.standard_normal((rows, p)).astype(np.float32))

    log(f"shapes: basis ({rows}, {n}) f64 = {rows * n * 8 / 1e9:.2f} GB")
    t_hg = timeit("dd_dot(BV, w16)   [hg merged RR+Gram col]", dd_dot,
                  BV, w16)
    t_h1 = timeit("dd_dot(BVp, w) small x1", dd_dot, BVp, w)
    t_rT = timeit("dd_dot_rowsT(BVp(16), h) x1", dd_dot_rowsT, BVp, h16)
    t_cf = timeit("chunked_dot_f32(BV32, w)", chunked_dot_f32, V32, w)

    def rows_T_dot(Vrows, h):
        return jax.lax.dot_general(Vrows, h, (((0,), (0,)), ((), ())),
                                   preferred_element_type=Vrows.dtype)

    t_rt32 = timeit("rows_T_dot(V32, h) f32", rows_T_dot, V32, h184_32)

    # B matvec: the assembled mass stencil through the bench problem
    topo = bench.make_topo()
    from eigd_tpu.fem import assembly as fem

    rho = topo.fltr.apply(jnp.asarray(topo.x))
    theta = fem.element_density(rho, topo.conn)

    @jax.jit
    def getB(theta):
        A, B = topo.problem.assemble(theta)
        return B

    B = getB(theta)
    t_bmv = timeit("B.mv(w) dd stencil", lambda x: B.mv(x), w)

    def bqr(x):
        return b_qr_tall(x, B.mv, axis=None)

    t_qr = timeit("b_qr_tall(w, B.mv)", bqr, w, n=5)

    per_step = (t_hg + 2 * t_h1 + 2 * t_rT + 2 * t_cf + 2 * t_rt32 + t_qr)
    log(f"ledger per step (excl apply): hg {t_hg * 1e3:.1f} + 2x small dd "
        f"{2 * (t_h1 + t_rT) * 1e3:.1f} + 2x f32 far "
        f"{2 * (t_cf + t_rt32) * 1e3:.1f} + bqr {t_qr * 1e3:.1f} = "
        f"{per_step * 1e3:.1f} ms  (measured in-sweep: ~140 ms)")


if __name__ == "__main__":
    main()
