"""1M-DOF staged-program discriminator: is the forward or the reverse
program wrong?

Runs the bench configuration (1024x512, mg factor) through the v2 staged
runner and checks, in one compile cycle each for fwd/bwd:
  1. fwd_prog lam vs the CPU-verified spectrum
  2. value = tail(lam, Phi) continuity
  3. true directional derivative by central difference THROUGH fwd_prog ONLY
  4. bwd_prog gradient vs (3)

If (1)-(3) are clean and (4) fails, the reverse program is the culprit;
if (1) is wrong, the forward corruption reproduces even in a standalone
program with basis outputs.
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

import bench  # reuse make_topo + the exact bench objective


def log(*a):
    print(*a, flush=True)


LAM_TRUE = np.array([0.94924937, 2.17993899, 2.65582058])  # CPU ARPACK, r2


def main():
    from eigd_tpu.fem import assembly as fem
    from eigd_tpu.ops.autodiff import staged_value_and_grad

    topo = bench.make_topo()
    x0 = jnp.asarray(topo.x)

    def pre(x):
        rho = topo.fltr.apply(x)
        return fem.element_density(rho, topo.conn)

    def tail(lam, Q):
        eta = jnp.exp(-2.0 * (lam - lam[0]))
        return jnp.sum(jnp.sqrt(lam)) + jnp.sum(eta[None, :] * Q[:8, :] ** 2)

    run = staged_value_and_grad(pre, tail, topo.problem, topo.cfg)

    def fwd_value(x):
        res = run.fwd_prog(x)
        jax.block_until_ready(res.lam)
        return res, float(tail(res.lam, res.Phi))

    # --- 1+2: forward spectrum + value ---------------------------------
    t0 = time.time()
    res0, v0 = fwd_value(x0)
    log(f"fwd compile+run: {time.time() - t0:.1f}s")
    lam0 = np.asarray(res0.lam)
    log(f"lam = {lam0}")
    log(f"niter = {int(res0.niter)}  (m = {res0.m})")
    log(f"eig_res (internal estimate) = {np.asarray(res0.eig_res)}")

    # input-chain check: element densities should be ~uniform 0.95
    theta0 = jax.jit(pre)(x0)
    th = np.asarray(theta0)
    log(f"theta (rhoE): min={th.min():.6f} max={th.max():.6f} "
        f"mean={th.mean():.6f} (expect ~0.95 uniform)")

    # TRUE pencil residuals of the returned eigenpairs, fresh assembly
    @jax.jit
    def true_res(x, lam, Phi):
        theta = pre(x)
        A, B = topo.problem.assemble(theta)
        R = A.mv(Phi) - B.mv(Phi) * lam[None, :]
        bn = jnp.linalg.norm(B.mv(Phi), axis=0)
        return jnp.linalg.norm(R, axis=0) / (jnp.abs(lam) * bn)

    tr = np.asarray(true_res(x0, res0.lam, res0.Phi))
    log(f"TRUE pencil residuals = {tr}")
    fwd_ok = np.allclose(lam0[:3], LAM_TRUE, rtol=1e-4)
    log(f"fwd spectrum OK vs CPU truth: {fwd_ok}")
    log(f"value = {v0:.8f} (staged bench saw 17.479888)")
    t0 = time.time()
    res0, v0 = fwd_value(x0)
    log(f"fwd steady: {time.time() - t0:.2f}s")

    # --- 3: true FD through the forward program only -------------------
    pert = jnp.asarray(np.random.default_rng(7).uniform(size=x0.shape))
    h = 1e-2
    _, vp = fwd_value(x0 + h * pert)
    _, vm = fwd_value(x0 - h * pert)
    fd_true = (vp - vm) / (2 * h)
    log(f"fwd-only FD: vp={vp:.10f} vm={vm:.10f} fd={fd_true:.10e}")

    if os.environ.get("EIGD_DIAG_FACTOR"):
        # In-context factor quality: same program as the corrupting
        # forward, plus an mv_info apply + true shifted-residual check.
        from eigd_tpu.ops.autodiff import _forward_ops

        @jax.jit
        def fwd_diag(x):
            theta = pre(x)
            A, B = topo.problem.assemble(theta)
            lam, Phi, (res, factor) = _forward_ops(theta, topo.problem,
                                                   A, B, topo.cfg)
            b1 = B.mv(Phi)
            y, info = factor.mv_info(b1)
            rr = A.mv(y) - topo.cfg.sigma * B.mv(y) - b1
            rn = (jnp.linalg.norm(rr, axis=0)
                  / jnp.linalg.norm(b1, axis=0))
            return lam, res.niter, info["niter"], rn

        t0 = time.time()
        lam_d, nit, pcg_nit, rn = fwd_diag(x0)
        jax.block_until_ready(rn)
        log(f"fwd_diag compile+run: {time.time() - t0:.1f}s")
        log(f"  lam = {np.asarray(lam_d)}")
        log(f"  lanczos niter = {int(nit)}, factor PCG niter = "
            f"{int(pcg_nit)}")
        log(f"  in-context factor apply rel residual = {np.asarray(rn)}")

    if os.environ.get("EIGD_DIAG_FWD_ONLY"):
        log("fwd-only mode: skipping reverse program")
        return

    # --- 4: reverse program --------------------------------------------
    res0, _ = fwd_value(x0)  # fresh (donated into bwd)
    t0 = time.time()
    v, g = run.bwd_prog(x0, res0)
    g.block_until_ready()
    log(f"bwd compile+run: {time.time() - t0:.1f}s  v={float(v):.8f}")
    res0, _ = fwd_value(x0)
    t0 = time.time()
    v, g = run.bwd_prog(x0, res0)
    g.block_until_ready()
    log(f"bwd steady: {time.time() - t0:.2f}s")
    ans = float(pert @ g)
    rel = abs(ans - fd_true) / abs(fd_true)
    log(f"adjoint={ans:.10e} vs fwd-FD={fd_true:.10e} rel={rel:.3e}")
    log("verdict: " + ("PASS — both programs correct" if rel < 1e-4 else
                       ("REVERSE program wrong (fwd clean)" if fwd_ok else
                        "FORWARD program wrong")))


if __name__ == "__main__":
    main()
