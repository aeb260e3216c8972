"""Phase-by-phase wall-time breakdown of the bench configuration (default
512x256) on the TPU: factor build / Lanczos sweep / extract / each polish
step / adjoint rounds, each timed as its own dispatch via the chunked
staged programs (ops/autodiff.staged_eigh_gen_vjp). Identical math to the
fused bench program — this is the measurement tool for deciding where the
263k/1M wall time actually goes.

Usage:  python scripts/diag_263k_breakdown.py   (env knobs as bench.py)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402  (jax config + cache setup happen on import)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def t(fn, *args, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def main():
    topo = bench.make_topo()
    x0 = jnp.asarray(topo.x)
    from eigd_tpu.fem import assembly as fem
    from eigd_tpu.ops.autodiff import staged_eigh_gen_vjp

    cfg = topo.cfg
    q_blk = -(-cfg.m // cfg.block)
    fwd_prog, bwd_prog = staged_eigh_gen_vjp(
        topo.problem, cfg, split_factor=True, chunk_adjoint=True,
        chunk_forward=q_blk)

    rho = topo.fltr.apply(x0)
    theta = fem.element_density(rho, topo.conn)
    theta = jax.block_until_ready(theta)

    # warm all programs once (compiles)
    log("warming (compiles)...")
    t0 = time.perf_counter()
    res = fwd_prog(theta)
    jax.block_until_ready(res)
    log(f"  fwd warm (compile+run): {time.perf_counter() - t0:.1f}s")

    def tail(lam, Q):
        eta = jnp.exp(-2.0 * (lam - lam[0]))
        return jnp.sum(jnp.sqrt(lam)) + jnp.sum(eta[None, :] * Q[:8, :] ** 2)

    v, tail_vjp = jax.vjp(tail, res.lam, res.Phi)
    lam_bar, Phi_bar = tail_vjp(jnp.ones_like(v))
    t0 = time.perf_counter()
    gtheta = bwd_prog(theta, res, lam_bar, Phi_bar)
    jax.block_until_ready(gtheta)
    log(f"  bwd warm (compile+run): {time.perf_counter() - t0:.1f}s "
        f"rounds={bwd_prog.last_info['rounds']}")

    # measured pass, phase by phase
    log("measured pass:")
    (A, B, factor, deflate, v0), t_build = t(fwd_prog.build_prog, theta)
    log(f"  build (assemble+factor): {t_build:.3f}s")
    carry, t_start = t(fwd_prog.start_prog, A, B, factor, deflate, v0)
    log(f"  sweep start: {t_start:.3f}s")
    carry, t_sweep = t(fwd_prog.chunk_prog, A, B, factor, carry, deflate,
                       0, q_blk)
    log(f"  sweep ({q_blk} block steps): {t_sweep:.3f}s")
    (res2, lam_e, Phi_e), t_ex = t(fwd_prog.extract_prog, A, B, factor,
                                   deflate, carry,
                                   jnp.asarray(q_blk * cfg.block))
    log(f"  extract: {t_ex:.3f}s")
    t_pol = []
    for k in range(int(cfg.polish)):
        (lam_e, Phi_e, eig_res_e), dt = t(fwd_prog.polish_prog, A, B,
                                          factor, deflate, lam_e, Phi_e)
        t_pol.append(dt)
        log(f"  polish step {k}: {dt:.3f}s")
    import dataclasses as _dc

    res2 = _dc.replace(res2, lam=lam_e[:cfg.N], Phi=Phi_e[:, :cfg.N],
                       eig_res=eig_res_e[:cfg.N], BV=None)
    lam = res2.lam
    log(f"  lam: {np.asarray(lam)}  eig_res: {np.asarray(res2.eig_res)}")

    v, tail_vjp = jax.vjp(tail, res2.lam, res2.Phi)
    lam_bar, Phi_bar = tail_vjp(jnp.ones_like(v))
    t0 = time.perf_counter()
    (psi, resn, tol), t_guess = t(bwd_prog.guess_prog, A, B, factor, res2,
                                  Phi_bar)
    log(f"  adjoint LAA guess: {t_guess:.3f}s")
    import numpy as _np

    resn_h = _np.asarray(jax.device_get(resn))
    tol_h = float(jax.device_get(tol))
    floor0 = 3e-6 if cfg.adjoint_mixed else 1e-14
    eps_f, contraction = floor0, 0.0
    rounds, r_max = 0, max(1, cfg.nrestart)
    t_rounds = []
    while (rounds < r_max and _np.any(resn_h > tol_h)
           and contraction < 0.6):
        (psi, resids, resn), dt = t(
            bwd_prog.round_prog, A, B, factor, res2.lam, res2.Phi,
            res2.sigma, Phi_bar, psi,
            jnp.asarray(eps_f, dtype=Phi_bar.dtype))
        t_rounds.append(dt)
        resn_new = _np.asarray(jax.device_get(resn))
        contraction = float(resn_new.max() / max(resn_h.max(), 1e-300))
        eps_f = min(max(0.5 * contraction, floor0), 0.5)
        resn_h = resn_new
        rounds += 1
        log(f"  adjoint round {rounds}: {dt:.3f}s  contraction "
            f"{contraction:.2e}  res {resn_h.max() / tol_h * 1e-0:.2e}*tol")
    gtheta, t_fin = t(bwd_prog.finish_prog, theta, A, B, res2, psi,
                      lam_bar, Phi_bar)
    log(f"  adjoint finish+contraction: {t_fin:.3f}s")

    total = (t_build + t_start + t_sweep + t_ex + sum(t_pol) + t_guess
             + sum(t_rounds) + t_fin)
    log(f"  TOTAL (sum of phases): {total:.3f}s"
        f"  [build {t_build:.2f} sweep {t_start + t_sweep:.2f} "
        f"extract {t_ex:.2f} polish {sum(t_pol):.2f} "
        f"adjoint {t_guess + sum(t_rounds) + t_fin:.2f}]")


if __name__ == "__main__":
    main()
