"""In-context V-cycle miscompile probe + candidate fix (barriered V-cycle).

Context (r2 hunt): at 1M DOF the forward eigensolve inside large fused
programs returns a wrong-but-plausible spectrum. diag_1m_factor2 showed the
MG build artifacts are bit-identical in-context, but the V-cycle APPLY
contracts at ~22 (garbage) in-context vs 0.027 out-of-context — an XLA:TPU
large-program miscompile of the V-cycle subgraph itself.

This probe compiles ONE program containing the corrupting forward plus, on
the same factor and a fresh random vector:
  - contraction of the plain f32 V-cycle      (expected in-context: ~22, bad)
  - contraction of a BARRIERED V-cycle        (candidate fix)
  - residual of ONE level-0 Chebyshev smooth  (isolates smoother vs transfers)
  - f64 and f32 stencil matvec vs ElementOperator cross-checks
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


def vcycle_barriered(factor, lvl, b):
    from eigd_tpu.ops.multigrid import cheb_smooth, prolong, restrict
    from eigd_tpu.ops.stencil import stencil_matvec

    ob = jax.lax.optimization_barrier
    nx, ny = factor.shapes[lvl]
    if lvl == len(factor.Ws) - 1:
        return factor.coarse_inv @ b
    W, dinv, lmax = factor.Ws[lvl], factor.dinvs[lvl], factor.lmaxs[lvl]
    x = ob(cheb_smooth(W, dinv, lmax, jnp.zeros_like(b), b, nx, ny,
                       factor.ndof, degree=factor.degree))
    r = ob(b - stencil_matvec(W, x, nx, ny, factor.ndof))
    xc = vcycle_barriered(factor, lvl + 1,
                          ob(restrict(r, nx // 2, ny // 2, factor.ndof)))
    x = x + prolong(xc, nx // 2, ny // 2, factor.ndof)
    return ob(cheb_smooth(W, dinv, lmax, x, b, nx, ny, factor.ndof,
                          degree=factor.degree))


def main():
    from eigd_tpu.fem import assembly as fem
    from eigd_tpu.ops.autodiff import _forward_ops
    from eigd_tpu.ops.multigrid import cheb_smooth
    from eigd_tpu.ops.operators import ElementOperator
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
        r32 = r.astype(jnp.float32)

        def contr(z32):
            z = z32.astype(jnp.float64)
            s = A.mv(z) - topo.cfg.sigma * B.mv(z)
            return jnp.linalg.norm(r - s) / jnp.linalg.norm(r)

        c_plain = contr(factor._vcycle(0, r32))
        c_barr = contr(vcycle_barriered(factor, 0, r32))

        # one level-0 smoother application: residual ratio vs r
        W0, dinv0, lmax0 = factor.Ws[0], factor.dinvs[0], factor.lmaxs[0]
        xs = cheb_smooth(W0, dinv0, lmax0, jnp.zeros_like(r32), r32,
                         nx, ny, nd, degree=factor.degree)
        rs = r32 - stencil_matvec(W0, xs, nx, ny, nd)
        c_smooth = jnp.linalg.norm(rs) / jnp.linalg.norm(r32)

        # stencil vs element matvec, f64 and f32
        el = ElementOperator(A.mats, A.dofs, A.n)
        y_el = el.mv(r)
        y64 = A.mv(r)
        st64 = jnp.linalg.norm(y64 - y_el) / jnp.linalg.norm(y_el)
        # f32 stencil of the SHIFTED operator vs f64 element math
        yS_el = y_el - topo.cfg.sigma * ElementOperator(
            B.mats, B.dofs, B.n).mv(r)
        y32 = stencil_matvec(W0, r32, nx, ny, nd).astype(jnp.float64)
        st32 = jnp.linalg.norm(y32 - yS_el) / jnp.linalg.norm(yS_el)
        return (lam, res.niter, c_plain, c_barr, c_smooth, st64, st32)

    t0 = time.time()
    out = jax.block_until_ready(probe(x0))
    lam, nit, c_plain, c_barr, c_smooth, st64, st32 = out
    print(f"compile+run: {time.time() - t0:.1f}s", flush=True)
    print(f"lam = {np.asarray(lam)}", flush=True)
    print(f"lanczos niter = {int(nit)}", flush=True)
    print(f"V-cycle contraction  plain    = {float(c_plain):.4f}", flush=True)
    print(f"V-cycle contraction  barriered= {float(c_barr):.4f}", flush=True)
    print(f"level-0 smoother residual     = {float(c_smooth):.4f}",
          flush=True)
    print(f"stencil-vs-element rel  f64   = {float(st64):.3e}", flush=True)
    print(f"stencil(shifted f32) rel      = {float(st32):.3e}", flush=True)


if __name__ == "__main__":
    main()
