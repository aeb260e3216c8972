"""In-context MG-factor quality probe at 1M DOF.

One jitted program = the full (corrupting) forward + an mv_info factor
apply + the true shifted residual of that apply. Honors the bench env
knobs, notably EIGD_BENCH_STAG (PCG stagnation patience; large = exit on
tol/maxiter only).
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


def main():
    from eigd_tpu.fem import assembly as fem
    from eigd_tpu.ops.autodiff import _forward_ops

    topo = bench.make_topo()
    x0 = jnp.asarray(topo.x)

    def pre(x):
        rho = topo.fltr.apply(x)
        return fem.element_density(rho, topo.conn)

    @jax.jit
    def fwd_diag(x):
        theta = pre(x)
        A, B = topo.problem.assemble(theta)
        lam, Phi, (res, factor) = _forward_ops(theta, topo.problem, A, B,
                                               topo.cfg)
        b1 = B.mv(Phi)
        y, info = factor.mv_info(b1)
        rr = A.mv(y) - topo.cfg.sigma * B.mv(y) - b1
        rn = jnp.linalg.norm(rr, axis=0) / jnp.linalg.norm(b1, axis=0)
        # in-context stencil-vs-element matvec cross-check: the stencil
        # path underlies the V-cycle smoother, the PCG matvec AND A.mv/B.mv
        from eigd_tpu.ops.operators import ElementOperator

        v = jax.random.normal(jax.random.PRNGKey(3), (A.n,),
                              dtype=jnp.float64)
        y_st = A.mv(v)
        y_el = ElementOperator(A.mats, A.dofs, A.n).mv(v)
        st_rel = jnp.linalg.norm(y_st - y_el) / jnp.linalg.norm(y_el)
        return lam, res.niter, res.eig_res, info["niter"], rn, st_rel

    t0 = time.time()
    lam, nit, eig_res, pcg_nit, rn, st_rel = fwd_diag(x0)
    jax.block_until_ready(rn)
    print(f"compile+run: {time.time() - t0:.1f}s "
          f"(stag_bad={os.environ.get('EIGD_BENCH_STAG', '2')})",
          flush=True)
    print(f"lam = {np.asarray(lam)}", flush=True)
    print(f"lanczos niter = {int(nit)}  eig_res = {np.asarray(eig_res)}",
          flush=True)
    print(f"factor PCG niter = {int(pcg_nit)}", flush=True)
    print(f"in-context apply rel residual = {np.asarray(rn)}", flush=True)
    print(f"in-context stencil-vs-element matvec rel = {float(st_rel):.3e}",
          flush=True)


if __name__ == "__main__":
    main()
