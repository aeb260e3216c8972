"""Forward-only phase breakdown at the 1M-DOF bench configuration: build /
sweep start / per-chunk sweep steps / extract / polish, each its own
dispatch via the chunked staged programs (the full chunked diag
diag_263k_breakdown.py OOMs at 1M in the ADJOINT because the chunked
protocol keeps the build outputs materialized; the forward fits).

Env knobs as bench.py (EIGD_BENCH_BLOCK/M/SWEEP/... all honored), so this
is the measurement tool for the 1M forward-recipe ladder (VERDICT r4
item 2: forward 5.1 s is the bigger half of the 8.73 s).

Usage: EIGD_BENCH_NX=1024 EIGD_BENCH_NY=512 python scripts/diag_1m_fwd_phases.py
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
    fwd_prog, _ = staged_eigh_gen_vjp(
        topo.problem, cfg, split_factor=True, chunk_adjoint=True,
        chunk_forward=q_blk)

    rho = topo.fltr.apply(x0)
    theta = fem.element_density(rho, topo.conn)
    theta = jax.block_until_ready(theta)

    log("warming (compiles)...")
    t0 = time.perf_counter()
    res = fwd_prog(theta)
    jax.block_until_ready(res)
    log(f"  fwd warm (compile+run): {time.perf_counter() - t0:.1f}s")
    log(f"  lam: {np.asarray(res.lam)}")

    # measured pass, phase by phase
    for rep in range(2):
        log(f"measured pass {rep}:")
        (A, B, factor, deflate, v0), t_build = t(fwd_prog.build_prog, theta)
        log(f"  build (assemble+factor): {t_build:.3f}s")
        carry, t_start = t(fwd_prog.start_prog, A, B, factor, deflate, v0)
        log(f"  sweep start: {t_start:.3f}s")
        carry, t_sweep = t(fwd_prog.chunk_prog, A, B, factor, carry,
                           deflate, 0, q_blk)
        log(f"  sweep ({q_blk} block steps x p={cfg.block}): {t_sweep:.3f}s"
            f"  ({t_sweep / q_blk * 1e3:.1f} ms/block step)")
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
        tot = t_build + t_start + t_sweep + t_ex + sum(t_pol)
        log(f"  TOTAL fwd: {tot:.3f}s  [build {t_build:.2f} sweep "
            f"{t_start + t_sweep:.2f} extract {t_ex:.2f} "
            f"polish {sum(t_pol):.2f}]")
        log(f"  lam_e[:6]: {np.asarray(lam_e[:cfg.N])}")
        log(f"  eig_res: {np.asarray(eig_res_e[:cfg.N])}")


if __name__ == "__main__":
    main()
