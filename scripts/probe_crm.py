"""Where does the CRM forward/adjoint wall time go? (real-chip probe)

Times the individual hot pieces at the run_crm_large.py size (103k DOF):
BCR factor apply (k=1 vs k=8 columns), the gather/segment-sum
ElementOperator matvec, a block-tridiagonal batched-GEMM matvec (f64), and
the refined factor apply. Informs the CRM perf work (VERDICT r1 §missing-1).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
if os.environ.get("CRM_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

NSPAN = int(os.environ.get("CRM_NSPAN", 112))
NCHORD = int(os.environ.get("CRM_NCHORD", 16))
NHEIGHT = int(os.environ.get("CRM_NHEIGHT", 8))


def timed(fn, *args, reps=10, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:45s} {dt * 1e3:9.2f} ms", flush=True)
    return out


def main():
    from eigd_tpu.models.crm import CRM
    from eigd_tpu.ops.blockfactor import block_tridiag_from_dof_groups

    crm = CRM(nspan=NSPAN, nchord=NCHORD, nheight=NHEIGHT, N=6, m=72)
    print(f"CRM: {crm.nvars} DOF, nb={crm.nb}, b={crm.b}, "
          f"nelems={crm.profile['nelems']}", flush=True)

    Aop, Bop = crm._assemble(crm.x)
    fac = crm._factor(Aop, Bop, 0.0, "normal")

    key = jax.random.PRNGKey(0)
    x1 = jax.random.normal(key, (crm.nvars,), dtype=jnp.float64)
    x8 = jax.random.normal(key, (crm.nvars, 8), dtype=jnp.float64)

    # block-tridiag operator blocks of A (for the batched-GEMM matvec)
    D, E = block_tridiag_from_dof_groups(Aop.mats, crm.dofs, None,
                                         crm.nb, crm.b)
    nb, b = crm.nb, crm.b

    def bt_mv(xcols):
        X = xcols.reshape(nb, b, -1)
        Y = jnp.einsum("gij,gjk->gik", D, X)
        Y = Y.at[1:].add(jnp.einsum("gij,gjk->gik", E, X[:-1]))
        Y = Y.at[:-1].add(jnp.einsum("gji,gjk->gik", E, X[1:]))
        return Y.reshape(xcols.shape)

    mv1 = jax.jit(lambda v: Aop.mv(v))
    mv8 = jax.jit(lambda v: Aop.mv(v))
    btmv1 = jax.jit(bt_mv)
    fac1 = jax.jit(lambda v: fac.mv(v))
    fac8 = jax.jit(lambda v: fac.mv(v))
    inner1 = jax.jit(lambda v: fac.inner.mv(v) if hasattr(fac, "inner")
                     else fac.mv(v))

    y_g = timed(mv1, x1, label="ElementOperator.mv k=1 (gather f64)")
    timed(mv8, x8, label="ElementOperator.mv k=8")
    y_bt = timed(btmv1, x1, label="block-tridiag einsum mv k=1 (f64)")
    timed(btmv1, x8, label="block-tridiag einsum mv k=8 (f64)")
    print(f"  bt-vs-gather rel diff: "
          f"{float(jnp.linalg.norm(y_bt - y_g) / jnp.linalg.norm(y_g)):.2e}",
          flush=True)
    timed(inner1, x1, label="BCR inner apply k=1 (f32)")
    timed(fac1, x1, label="RefinedFactor.mv k=1")
    timed(fac8, x8, label="RefinedFactor.mv k=8")

    # dd split variant of the bt matvec: f32 pairs, chunked f64 accumulation
    Dh = D.astype(jnp.float32)
    Dl = (D - Dh.astype(jnp.float64)).astype(jnp.float32)
    Eh = E.astype(jnp.float32)
    El = (E - Eh.astype(jnp.float64)).astype(jnp.float32)

    def dd_bt_mv(xcols):
        X = xcols.reshape(nb, b, -1)
        Xh = X.astype(jnp.float32)
        Xl = (X - Xh.astype(jnp.float64)).astype(jnp.float32)

        def g(Ah, Al, Xh, Xl):
            p = jnp.einsum("gij,gjk->gik", Ah, Xh,
                           preferred_element_type=jnp.float32)
            q = jnp.einsum("gij,gjk->gik", Ah, Xl,
                           preferred_element_type=jnp.float32)
            r = jnp.einsum("gij,gjk->gik", Al, Xh,
                           preferred_element_type=jnp.float32)
            return (p.astype(jnp.float64) + q.astype(jnp.float64)
                    + r.astype(jnp.float64))

        def gT(Ah, Al, Xh, Xl):
            p = jnp.einsum("gji,gjk->gik", Ah, Xh,
                           preferred_element_type=jnp.float32)
            q = jnp.einsum("gji,gjk->gik", Ah, Xl,
                           preferred_element_type=jnp.float32)
            r = jnp.einsum("gji,gjk->gik", Al, Xh,
                           preferred_element_type=jnp.float32)
            return (p.astype(jnp.float64) + q.astype(jnp.float64)
                    + r.astype(jnp.float64))

        Y = g(Dh, Dl, Xh, Xl)
        Y = Y.at[1:].add(g(Eh, El, Xh[:-1], Xl[:-1]))
        Y = Y.at[:-1].add(gT(Eh, El, Xh[1:], Xl[1:]))
        return Y.reshape(xcols.shape)

    ddmv = jax.jit(dd_bt_mv)
    y_dd = timed(ddmv, x1, label="dd block-tridiag mv k=1")
    timed(ddmv, x8, label="dd block-tridiag mv k=8")
    print(f"  dd-vs-f64 rel diff: "
          f"{float(jnp.linalg.norm(y_dd - y_g) / jnp.linalg.norm(y_g)):.2e}",
          flush=True)


if __name__ == "__main__":
    main()
