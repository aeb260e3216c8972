"""Staged CRM probe: isolate which stage kills the tunneled TPU worker.

Each stage is its own jit + block_until_ready + print, so the crash point
is visible in the log.  CRM_NSPAN/... env knobs as in run_crm_large.py.
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
NCHORD = int(os.environ.get("CRM_NCHORD", 12))
NHEIGHT = int(os.environ.get("CRM_NHEIGHT", 6))
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
            f"peak={s.get('peak_bytes_in_use', 0)/2**30:.2f}GiB "
            f"limit={s.get('bytes_limit', 0)/2**30:.2f}GiB")
    except Exception as e:  # memory_stats unsupported on some backends
        log(f"hbm[{tag}]: unavailable ({e})")


def main():
    from eigd_tpu.models.crm import CRM

    skip_early = bool(os.environ.get("CRM_SKIP_EARLY_STAGES"))
    crm = CRM(nspan=NSPAN, nchord=NCHORD, nheight=NHEIGHT, N=6, m=72,
              lanczos_sweep="approx", lanczos_polish=2, **MESH_KW)
    log(f"CRM: {crm.nvars} DOF, {crm.profile['nelems']} elements, "
        f"{crm.nb} x b={crm.b}")
    if skip_early:
        run_late(crm)
        return

    t0 = time.time()
    K, M = jax.jit(crm._assemble)(crm.x)
    jax.block_until_ready((K.mats, M.mats))
    log(f"stage 1 assemble: {time.time() - t0:.1f}s")

    t0 = time.time()
    fac = jax.jit(lambda K, M: crm._factor(K, M, 0.0, "normal"))(K, M)
    jax.block_until_ready(fac.inner.last_Dinv)
    log(f"stage 2 factor build: {time.time() - t0:.1f}s "
        f"(levels={len(fac.inner.levels)})")

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((crm.nvars, 6)))
    v = v * crm.free_mask[:, None]

    # NOTE: the factor must be a jit ARGUMENT (it is a registered pytree).
    # jax.jit(fac.approx_mv) closes over the multi-GB factor arrays, which
    # get baked into the lowered program as constants — pathological
    # compile times through the remote-compile tunnel.
    approx_jit = jax.jit(lambda fc, r: fc.approx_mv(r))
    pcg_info_jit = jax.jit(lambda fc, r: fc.mv_info(r))
    pcg_jit = jax.jit(lambda fc, r: fc.mv(r))

    t0 = time.time()
    y = approx_jit(fac, v)
    jax.block_until_ready(y)
    log(f"stage 3 approx apply (f32 BCR): {time.time() - t0:.1f}s "
        f"finite={bool(jnp.all(jnp.isfinite(y)))}")

    t0 = time.time()
    y, info = pcg_info_jit(fac, v)
    jax.block_until_ready(y)
    log(f"stage 4 PCG apply: {time.time() - t0:.1f}s "
        f"niter={int(info['niter'])} res={float(jnp.max(info['res'])):.2e}")

    # steady-state repeats
    for name, fn in (("approx", approx_jit), ("pcg", pcg_jit)):
        t0 = time.time()
        out = fn(fac, v)
        jax.block_until_ready(out)
        log(f"steady {name} apply: {time.time() - t0:.3f}s")

    run_late(crm)


def run_late(crm):
    memstats("pre-init")
    t0 = time.time()
    crm.initialize()
    log(f"stage 5 full initialize: {time.time() - t0:.1f}s "
        f"freq={crm.profile['natural frequencies (Hz)'][:3]}")
    memstats("post-init")

    crm.initialize_adjoint()
    crm.add_modal_compliance_derivative(1.0)
    t0 = time.time()
    crm.finalize_adjoint()
    log(f"stage 6 adjoint: {time.time() - t0:.1f}s "
        f"grad={np.asarray(crm.xb)}")
    memstats("post-adjoint")


if __name__ == "__main__":
    main()
