"""Probe the split-factor staged CRM programs one dispatch at a time.

run_crm_large at 250k with split_factor=True still killed the tunneled
v5e worker; this isolates WHICH program (build vs Lanczos solve) faults,
with a block_until_ready + log line between every dispatch.

Knobs: CRM_NSPAN/NCHORD/NHEIGHT/SPAN/CROOT as in run_crm_large.py, plus
CRM_M / CRM_BLOCK / CRM_SWEEP / CRM_POLISH to shrink the solve program.
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

NSPAN = int(os.environ.get("CRM_NSPAN", 460))
NCHORD = int(os.environ.get("CRM_NCHORD", 12))
NHEIGHT = int(os.environ.get("CRM_NHEIGHT", 6))
M = int(os.environ.get("CRM_M", 72))
N = int(os.environ.get("CRM_N", 6))
POLISH = int(os.environ.get("CRM_POLISH", 2))
SWEEP = os.environ.get("CRM_SWEEP", "approx")
MESH_KW = {}
if os.environ.get("CRM_SPAN"):
    MESH_KW["span"] = float(os.environ["CRM_SPAN"])
if os.environ.get("CRM_CROOT"):
    MESH_KW["c_root"] = float(os.environ["CRM_CROOT"])


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def memstats(tag):
    try:
        s = jax.local_devices()[0].memory_stats()
        log(f"hbm[{tag}]: in_use={s.get('bytes_in_use', 0)/2**30:.2f}GiB "
            f"peak={s.get('peak_bytes_in_use', 0)/2**30:.2f}GiB")
    except Exception as e:
        log(f"hbm[{tag}]: unavailable ({e})")


def main():
    from eigd_tpu.models.crm import CRM
    from eigd_tpu.ops.autodiff import staged_eigh_gen_vjp

    kw = {}
    if os.environ.get("CRM_BLOCK"):
        kw["lanczos_block"] = int(os.environ["CRM_BLOCK"])
    crm = CRM(nspan=NSPAN, nchord=NCHORD, nheight=NHEIGHT, N=N, m=M,
              lanczos_sweep=SWEEP, lanczos_polish=POLISH, **kw, **MESH_KW)
    crm._ensure_cfg()
    log(f"CRM: {crm.nvars} DOF, {crm.nb} x b={crm.b}, m={M} block="
        f"{crm.cfg.block} sweep={SWEEP} polish={POLISH}")

    fwd, bwd = staged_eigh_gen_vjp(crm.problem, crm.cfg, split_factor=True)

    t0 = time.time()
    built = fwd.build_prog(crm.x)
    jax.block_until_ready(built)
    log(f"build_prog (assemble+factor): {time.time() - t0:.1f}s")
    memstats("post-build")

    t0 = time.time()
    res = fwd.solve_prog(*built)
    jax.block_until_ready((res.lam, res.Phi))
    log(f"solve_prog (Lanczos): {time.time() - t0:.1f}s "
        f"lam={np.asarray(res.lam)}")
    memstats("post-solve")

    if os.environ.get("CRM_SKIP_ADJOINT"):
        return
    lam_bar = jnp.zeros_like(res.lam)
    Phi_bar = jnp.zeros_like(res.Phi).at[0, :].set(1.0)
    t0 = time.time()
    g = bwd(crm.x, res, lam_bar, Phi_bar)
    jax.block_until_ready(g)
    log(f"bwd_prog (adjoint): {time.time() - t0:.1f}s |g|="
        f"{float(jnp.linalg.norm(g)):.3e}")
    memstats("post-adjoint")


if __name__ == "__main__":
    main()
