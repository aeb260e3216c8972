"""Stage-3 1M V-cycle miscompile probes: pin the corrupted LEVEL/dtype.

Established so far (r2 hunt): in-context (inside the big forward program)
the plain f32 V-cycle EXPANDS (contraction ~22) while the same factor's
f64 V-cycle is healthy (diag_1m_staged with EIGD_BENCH_VCYCLE=f64: exact
spectrum, true residuals ~1e-6). Barriers at stage edges did not fix f32.

This probe compiles ONE program containing the corrupting forward plus,
on the same factor and a fresh random vector, the contraction of:
  plain32          all levels f32 (expected bad in-context)
  barrier32        factor vcycle="barrier" variant (all-matvec barriers)
  f64              all levels f64 (expected good — control)
  fine32/coarse64  level-0 smoothing f32, recursion f64
  fine64/coarse32  level-0 smoothing f64, recursion f32
  smooth0_32       one level-0 f32 Chebyshev smooth (isolates the smoother)
  coarse32         levels >=1 f32 V-cycle on the restricted residual
                   (isolates the coarse chain incl. the dense inverse)

Whichever mixed variant is healthy gives a cheap permanent fix: f64 only
on the corrupted half costs far less than the all-f64 V-cycle (~3x the
fwd wall: 38.7s vs ~12.6s measured).
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


def vcycle_mixed(factor, lvl, b, fine_dt, coarse_dt):
    """V-cycle with level-0 work in fine_dt and levels >=1 in coarse_dt."""
    from eigd_tpu.ops.multigrid import cheb_smooth, prolong, restrict
    from eigd_tpu.ops.stencil import stencil_matvec

    dt = fine_dt if lvl == 0 else coarse_dt
    nx, ny = factor.shapes[lvl]
    b = b.astype(dt)
    if lvl == len(factor.Ws) - 1:
        return factor.coarse_inv.astype(dt) @ b
    W = factor.Ws[lvl].astype(dt)
    dinv = factor.dinvs[lvl].astype(dt)
    lmax = factor.lmaxs[lvl]
    x = cheb_smooth(W, dinv, lmax, jnp.zeros_like(b), b, nx, ny,
                    factor.ndof, degree=factor.degree)
    r = b - stencil_matvec(W, x, nx, ny, factor.ndof)
    xc = vcycle_mixed(factor, lvl + 1,
                      restrict(r, nx // 2, ny // 2, factor.ndof),
                      fine_dt, coarse_dt)
    x = x + prolong(xc.astype(dt), nx // 2, ny // 2, factor.ndof)
    return cheb_smooth(W, dinv, lmax, x, b, nx, ny, factor.ndof,
                       degree=factor.degree)


def main():
    from eigd_tpu.fem import assembly as fem
    from eigd_tpu.ops.autodiff import _forward_ops
    from eigd_tpu.ops.multigrid import (GridMGFactor, cheb_smooth, restrict)
    from eigd_tpu.ops.stencil import stencil_matvec

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

        def contr(z):
            z = z.astype(jnp.float64)
            s = A.mv(z) - topo.cfg.sigma * B.mv(z)
            return jnp.linalg.norm(r - s) / jnp.linalg.norm(r)

        f32, f64 = jnp.float32, jnp.float64
        fb = GridMGFactor(factor.Ws, factor.dinvs, factor.lmaxs,
                          factor.coarse_inv, factor.W64, factor.shapes,
                          factor.ndof, degree=factor.degree,
                          vcycle="barrier")
        out = {
            "plain32": contr(factor._vcycle(0, r.astype(f32))),
            "barrier32": contr(fb._vcycle(0, r.astype(f32))),
            "f64": contr(vcycle_mixed(factor, 0, r, f64, f64)),
            "fine32_coarse64": contr(vcycle_mixed(factor, 0, r, f32, f64)),
            "fine64_coarse32": contr(vcycle_mixed(factor, 0, r, f64, f32)),
        }

        # level-0 smoother alone, f32: residual ratio after one smooth
        W0 = factor.Ws[0]
        d0 = factor.dinvs[0]
        l0 = factor.lmaxs[0]
        r32 = r.astype(f32)
        xs = cheb_smooth(W0, d0, l0, jnp.zeros_like(r32), r32, nx, ny, nd,
                         degree=factor.degree)
        rs = r32 - stencil_matvec(W0, xs, nx, ny, nd)
        out["smooth0_32"] = (jnp.linalg.norm(rs.astype(f64))
                             / jnp.linalg.norm(r))

        # coarse chain alone, f32: V-cycle from level 1 on the restricted
        # residual; healthy if || r1 - A1 x1 || / || r1 || < 1
        from eigd_tpu.ops.multigrid import stencil_matvec as _sm  # noqa
        r1 = restrict(rs, nx // 2, ny // 2, nd)
        x1 = factor._vcycle(1, r1)
        nx1, ny1 = factor.shapes[1]
        rr1 = r1 - stencil_matvec(factor.Ws[1], x1, nx1, ny1, nd)
        out["coarse32"] = (jnp.linalg.norm(rr1.astype(f64))
                           / jnp.linalg.norm(r1.astype(f64)))
        return lam, res.niter, out

    t0 = time.time()
    lam, nit, out = jax.block_until_ready(probe(x0))
    print(f"compile+run: {time.time() - t0:.1f}s", flush=True)
    print(f"lam = {np.asarray(lam)}  (corrupt iff != [0.949 2.180 2.656...])",
          flush=True)
    print(f"lanczos niter = {int(nit)}", flush=True)
    for k, v in out.items():
        print(f"  contraction {k:18s} = {float(v):.4f}", flush=True)


if __name__ == "__main__":
    main()
