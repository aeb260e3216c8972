"""Time the CRM three-phase protocol stage by stage at large DOF with the
host-chunked sibk adjoint (each program execution must stay under the
tunneled v5e's measured 60 s kill — scripts/probe_watchdog*.py).

Measured (r2, 2026-08-20, real v5e chip, defaults nspan=460 nchord=12
nheight=6 -> 143,832 padded DOF after block balancing, 461 stations x
b=312, block=8 approx sweep + polish=2, approx_tol=1e-8):
  cold  initialize 1077 s (remote-compile dominated) -> lam[0]=1547.70
  cold  finalize_adjoint 397 s, rounds=3, per-mode res <= 7.3e-9
  warm  initialize 92.0 s, finalize_adjoint 47.3 s (1-core host shared
        with a concurrent pytest run; host-chunked dispatch is the
        contended part), compliance identical cold/warm.
This is the first post-balance at-scale record; the pre-balance 250k run
was 91.3 s + 54.5 s steady with a b=546 layout (see models/crm.py)."""
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

NSPAN = int(os.environ.get("CRM_NSPAN", 460))
NCHORD = int(os.environ.get("CRM_NCHORD", 12))
NHEIGHT = int(os.environ.get("CRM_NHEIGHT", 6))
N = int(os.environ.get("CRM_N", 6))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    from eigd_tpu.models.crm import CRM

    kw = {}
    for env, name in (("CRM_APPROX_MAXITER", "approx_maxiter"),
                      ("CRM_APPROX_TOL", "approx_tol"),
                      ("CRM_ADJ_MAXITER", "adjoint_maxiter"),
                      ("CRM_M", "m")):
        if os.environ.get(env):
            v = os.environ[env]
            kw[name] = float(v) if "TOL" in env else int(v)
    crm = CRM(nspan=NSPAN, nchord=NCHORD, nheight=NHEIGHT, N=N, **kw)
    crm._ensure_cfg()
    log(f"CRM: {crm.nvars} DOF, {crm.nb} x b={crm.b}, m={crm.m} "
        f"block={crm.cfg.block} sweep={crm.cfg.lanczos_sweep} "
        f"polish={crm.cfg.polish} mixed={crm.cfg.adjoint_mixed} "
        f"nrestart={crm.cfg.nrestart}")

    t0 = time.time()
    crm.initialize()
    log(f"initialize (build+solve): {time.time()-t0:.1f}s "
        f"lam={np.asarray(crm.lam)}")

    crm.initialize_adjoint()
    crm.add_modal_compliance_derivative(1.0)
    t0 = time.time()
    crm.finalize_adjoint()
    log(f"finalize_adjoint (chunked): {time.time()-t0:.1f}s "
        f"|xb|={float(jnp.linalg.norm(crm.xb)):.6e}")
    info = crm._bwd_prog.last_info
    if info:
        log(f"adjoint rounds={info['rounds']} res={info['res']}")

    # warm second pass: true per-stage cost with cached compiles
    t0 = time.time()
    crm.initialize()
    log(f"initialize WARM: {time.time()-t0:.1f}s")
    crm.initialize_adjoint()
    crm.add_modal_compliance_derivative(1.0)
    t0 = time.time()
    crm.finalize_adjoint()
    log(f"finalize_adjoint WARM: {time.time()-t0:.1f}s "
        f"rounds={crm._bwd_prog.last_info['rounds']}")
    log(f"compliance={float(crm.get_modal_compliance()):.8e}")


if __name__ == "__main__":
    main()
