"""1M forward accounting without the OOM-prone chunked extract: times
build / start / sweep via the chunked programs (factor crosses as a pytree
argument — nothing baked into program constants), frees the sweep carry,
then times the polish program on the fused forward's Ritz block.

Completes the ledger the apply microprobe started (diag_1m_apply.py:
sweep apply = 56 ms x 22 = 1.2 s of the 5.13 s forward; where is the
rest?).
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


def t(fn, *args, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def main():
    topo = bench.make_topo()
    x0 = jnp.asarray(topo.x)
    from eigd_tpu.fem import assembly as fem
    from eigd_tpu.ops.autodiff import staged_eigh_gen_vjp, \
        staged_value_and_grad

    cfg = topo.cfg
    q_blk = -(-cfg.m // cfg.block)
    fwd_prog, _ = staged_eigh_gen_vjp(
        topo.problem, cfg, split_factor=True, chunk_adjoint=True,
        chunk_forward=q_blk)

    rho = topo.fltr.apply(x0)
    theta = fem.element_density(rho, topo.conn)
    theta = jax.block_until_ready(theta)

    # warm compiles for the pieces we need (NOT the full fwd_prog: its
    # extract OOMs at 1M under the chunked protocol)
    (A, B, factor, deflate, v0), _ = t(fwd_prog.build_prog, theta)
    carry, _ = t(fwd_prog.start_prog, A, B, factor, deflate, v0)
    carry, _ = t(fwd_prog.chunk_prog, A, B, factor, carry, deflate, 0, 2)
    del carry

    for rep in range(2):
        (A, B, factor, deflate, v0), t_build = t(fwd_prog.build_prog, theta)
        carry, t_start = t(fwd_prog.start_prog, A, B, factor, deflate, v0)
        carry, t_sweep = t(fwd_prog.chunk_prog, A, B, factor, carry,
                           deflate, 0, q_blk)
        log(f"rep{rep}: build {t_build:.3f}s  start {t_start:.3f}s  "
            f"sweep({q_blk} steps) {t_sweep:.3f}s "
            f"({t_sweep / q_blk * 1e3:.1f} ms/step)")
        del carry

    # fused forward (cache-warm from the bench run) for a Ritz block
    def pre(x):
        rho = topo.fltr.apply(x)
        return fem.element_density(rho, topo.conn)

    def tail(lam, Q):
        eta = jnp.exp(-2.0 * (lam - lam[0]))
        return jnp.sum(jnp.sqrt(lam)) + jnp.sum(eta[None, :] * Q[:8, :] ** 2)

    run = staged_value_and_grad(pre, tail, topo.problem, topo.cfg)
    res, t_fused = t(run.fwd_prog, x0)
    log(f"fused fwd_prog: {t_fused:.3f}s (the 5.13 s headline fwd)")
    res, t_fused = t(run.fwd_prog, x0)
    log(f"fused fwd_prog (rep): {t_fused:.3f}s")

    lam_e = res.lam
    Phi_e = res.Phi
    (out, t_pol) = t(fwd_prog.polish_prog, A, B, factor, deflate,
                     lam_e, Phi_e)
    log(f"polish step (warm-started at the polished block): {t_pol:.3f}s")
    (out, t_pol2) = t(fwd_prog.polish_prog, A, B, factor, deflate,
                      out[0], out[1])
    log(f"polish step (rep): {t_pol2:.3f}s")


if __name__ == "__main__":
    main()
