"""Fallback 1M V-cycle miscompile probes (round 2 hunt, stage 2).

Run AFTER diag_1m_vcycle.py. Same corrupting in-context program, plus:
  - f64 V-cycle (same Ws cast up): dtype change re-routes the compiler;
    also the candidate permanent fix if f32 is what miscompiles
  - fully-barriered V-cycle: optimization_barrier around EVERY
    stencil_matvec input/output inside the smoother, not just stage edges
  - transfers-only sanity: restrict->prolong roundtrip contraction of a
    smooth field (isolates the pad/slice transfer kernels)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

os.environ.setdefault("EIGD_BENCH_NX", "1024")
os.environ.setdefault("EIGD_BENCH_NY", "512")
os.environ["EIGD_BENCH_SKIP_1M"] = "1"

import bench


def cheb_smooth_barriered(W, dinv, lmax, x, b, nx, ny, ndof, degree=3,
                          lo_frac=0.25):
    from eigd_tpu.ops.stencil import stencil_matvec

    ob = jax.lax.optimization_barrier
    lmin = lo_frac * lmax
    lmax = 1.02 * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta
    rho = 1.0 / sigma1

    r = b - ob(stencil_matvec(W, ob(x), nx, ny, ndof))
    d = (dinv[:, None] if r.ndim == 2 else dinv) * r / theta
    x = x + d
    for _ in range(degree - 1):
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        r = b - ob(stencil_matvec(W, ob(x), nx, ny, ndof))
        z = (dinv[:, None] if r.ndim == 2 else dinv) * r
        d = rho * rho_new * d + (2.0 * rho_new / delta) * z
        x = x + d
        rho = rho_new
    return x


def vcycle_fb(factor, lvl, b):
    from eigd_tpu.ops.multigrid import prolong, restrict
    from eigd_tpu.ops.stencil import stencil_matvec

    ob = jax.lax.optimization_barrier
    nx, ny = factor.shapes[lvl]
    if lvl == len(factor.Ws) - 1:
        return factor.coarse_inv @ b
    W, dinv, lmax = factor.Ws[lvl], factor.dinvs[lvl], factor.lmaxs[lvl]
    x = cheb_smooth_barriered(W, dinv, lmax, jnp.zeros_like(b), b, nx, ny,
                              factor.ndof, degree=factor.degree)
    r = b - ob(stencil_matvec(W, ob(x), nx, ny, factor.ndof))
    xc = vcycle_fb(factor, lvl + 1, restrict(r, nx // 2, ny // 2,
                                             factor.ndof))
    x = x + prolong(xc, nx // 2, ny // 2, factor.ndof)
    return cheb_smooth_barriered(W, dinv, lmax, x, b, nx, ny, factor.ndof,
                                 degree=factor.degree)


def vcycle_f64(factor, lvl, b):
    from eigd_tpu.ops.multigrid import cheb_smooth, prolong, restrict
    from eigd_tpu.ops.stencil import stencil_matvec

    nx, ny = factor.shapes[lvl]
    if lvl == len(factor.Ws) - 1:
        return factor.coarse_inv.astype(jnp.float64) @ b
    W = factor.Ws[lvl].astype(jnp.float64)
    dinv = factor.dinvs[lvl].astype(jnp.float64)
    lmax = factor.lmaxs[lvl]
    x = cheb_smooth(W, dinv, lmax, jnp.zeros_like(b), b, nx, ny,
                    factor.ndof, degree=factor.degree)
    r = b - stencil_matvec(W, x, nx, ny, factor.ndof)
    xc = vcycle_f64(factor, lvl + 1,
                    restrict(r, nx // 2, ny // 2, factor.ndof))
    x = x + prolong(xc, nx // 2, ny // 2, factor.ndof)
    return cheb_smooth(W, dinv, lmax, x, b, nx, ny, factor.ndof,
                       degree=factor.degree)


def main():
    from eigd_tpu.fem import assembly as fem
    from eigd_tpu.ops.autodiff import _forward_ops
    from eigd_tpu.ops.multigrid import prolong, restrict

    topo = bench.make_topo()
    x0 = jnp.asarray(topo.x)

    def pre(x):
        rho = topo.fltr.apply(x)
        return fem.element_density(rho, topo.conn)

    @jax.jit
    def probe(x):
        theta = pre(x)
        A, B = topo.problem.assemble(theta)
        lam, Phi, (res, factor) = _forward_ops(theta, topo.problem, A, B,
                                               topo.cfg)
        nx, ny = factor.shapes[0]
        nd = factor.ndof

        r = jax.random.normal(jax.random.PRNGKey(11), (A.n,),
                              dtype=jnp.float64)
        r32 = r.astype(jnp.float32)

        def contr(z):
            z = z.astype(jnp.float64)
            s = A.mv(z) - topo.cfg.sigma * B.mv(z)
            return jnp.linalg.norm(r - s) / jnp.linalg.norm(r)

        c_fb = contr(vcycle_fb(factor, 0, r32))
        c_f64 = contr(vcycle_f64(factor, 0, r))

        # transfers-only roundtrip: P(R(smooth field)) vs analytic
        smooth = jnp.sin(jnp.linspace(0.0, 3.0, A.n)).astype(jnp.float32)
        rt = prolong(restrict(smooth, nx // 2, ny // 2, nd),
                     nx // 2, ny // 2, nd)
        c_rt = jnp.linalg.norm(rt - 4.0 * smooth) / jnp.linalg.norm(smooth)
        return (lam, c_fb, c_f64, c_rt)

    t0 = time.time()
    out = jax.block_until_ready(probe(x0))
    lam, c_fb, c_f64, c_rt = out
    print(f"compile+run: {time.time() - t0:.1f}s", flush=True)
    print(f"lam = {np.asarray(lam)}", flush=True)
    print(f"V-cycle contraction fully-barriered = {float(c_fb):.4f}",
          flush=True)
    print(f"V-cycle contraction f64             = {float(c_f64):.4f}",
          flush=True)
    print(f"transfer roundtrip rel (~O(0.1) ok) = {float(c_rt):.4f}",
          flush=True)


if __name__ == "__main__":
    main()
