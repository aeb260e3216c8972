"""Pin the in-context MG corruption to a build artifact or the V-cycle.

Returns, from INSIDE the corrupting forward program: per-level lambda_max
estimates, stencil/dinv/coarse checksums, and the single-V-cycle
contraction factor; compares each against a fresh build-only program on
the same theta.
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

    def artifacts(factor, A, B):
        lmaxs = jnp.stack([jnp.asarray(l, dtype=jnp.float64)
                           for l in factor.lmaxs])
        wsums = jnp.stack([jnp.sum(W.astype(jnp.float64))
                           for W in factor.Ws])
        dsums = jnp.stack([jnp.sum(d.astype(jnp.float64))
                           for d in factor.dinvs])
        csum = jnp.sum(factor.coarse_inv.astype(jnp.float64))
        r = jax.random.normal(jax.random.PRNGKey(11), (A.n,),
                              dtype=jnp.float64)
        z = factor.precond_mv(r)
        s = A.mv(z) - topo.cfg.sigma * B.mv(z)
        contr = jnp.linalg.norm(r - s) / jnp.linalg.norm(r)
        return lmaxs, wsums, dsums, csum, contr

    @jax.jit
    def in_context(x):
        theta = pre(x)
        A, B = topo.problem.assemble(theta)
        lam, Phi, (res, factor) = _forward_ops(theta, topo.problem, A, B,
                                               topo.cfg)
        return (lam,) + artifacts(factor, A, B)

    @jax.jit
    def build_only(x):
        theta = pre(x)
        A, B = topo.problem.assemble(theta)
        factor = topo.problem.factor(A, B, topo.cfg.sigma, topo.cfg.mode)
        return artifacts(factor, A, B)

    t0 = time.time()
    ref = jax.block_until_ready(build_only(x0))
    print(f"build-only: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    got = jax.block_until_ready(in_context(x0))
    print(f"in-context: {time.time() - t0:.1f}s", flush=True)
    lam = got[0]
    print(f"lam = {np.asarray(lam)}", flush=True)
    names = ["lmaxs", "wsums", "dsums", "coarse_sum", "vcycle_contraction"]
    for name, a, b in zip(names, ref, got[1:]):
        a, b = np.asarray(a), np.asarray(b)
        print(f"{name}:\n  ref(out-of-ctx) = {a}\n  in-context      = {b}",
              flush=True)


if __name__ == "__main__":
    main()
