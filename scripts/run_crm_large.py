"""CRM wingbox at >=100k DOF on the real chip (VERDICT r1 §5).

Runs the serial three-phase modal-compliance pipeline (station-padded BCR
factor) at a BASELINE-config-scale mesh, records solve + adjoint wall times
from the model profile, and checks the thickness gradient against central
finite differences.

Sizes: nspan=112, nchord=16, nheight=8 -> b = 6*17*9 = 918,
nvars = 113*918 = 103,734 DOF (>= the 100k bar; reference config #5 path).

Measured (r2, 2026-08-17, CPU 1 core, CRM_FORCE_CPU=1): freq[0]=7.563 Hz,
steady solve 148.5 s + adjoint 51.6 s, thickness-gradient FD check
rel err 1.384e-06 at h=1e-5 — the station-padded BCR factor + modal
compliance adjoint verify at >=100k DOF.

Measured (r2, 2026-08-19, the real v5e chip): same frequencies
(freq[0]=7.5633 Hz), steady solve 18.98 s + adjoint 6.91 s (7.8x/7.5x
the CPU run), FD rel err 2.501e-07 at h=1e-5.
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
    # the axon preset ignores JAX_PLATFORMS=cpu; both knobs are required
    jax.config.update("jax_platforms", "cpu")

NSPAN = int(os.environ.get("CRM_NSPAN", 112))
NCHORD = int(os.environ.get("CRM_NCHORD", 16))
NHEIGHT = int(os.environ.get("CRM_NHEIGHT", 8))
N = int(os.environ.get("CRM_N", 6))
M = os.environ.get("CRM_M")  # None -> model default (scales with block)
M = int(M) if M else None
# None -> model auto (block=8 at >=150k DOF: the single-vector scan shape
# faults the tunneled v5e worker at ~250k shell DOF, probe_crm_split.py)
BLOCK = os.environ.get("CRM_BLOCK")
BLOCK = int(BLOCK) if BLOCK else None
# Inexact forward sweep + Ritz polish (the grid bench's trick): the m-step
# Lanczos sweep advances on single f32 preconditioner applies; only the
# polish pays accurate (PCG) factor solves. At >=250k-DOF shell scale the
# exact sweep is 72 full PCG solves inside ONE XLA execution — measured to
# crash the tunneled worker.
SWEEP = os.environ.get("CRM_SWEEP", "approx")
POLISH = int(os.environ.get("CRM_POLISH", 2))
JITTER = float(os.environ.get("CRM_JITTER", 1e-4))
# Flagship ~1M-DOF configuration (BASELINE config #5 scale), post block
# balancing (balance_node_blocks drops b 546 -> 312 at this cross-section):
#   CRM_NSPAN=3200 CRM_NCHORD=12 CRM_NHEIGHT=6 CRM_SPAN=29.38 CRM_CROOT=7
#   -> nb=3201 stations x b=312 = 998,712 padded DOF. The CRM-like
#   span/chord keep the element aspect ratio sane at this resolution, and
#   the f32 station-block assembly (models/crm.py:_factor) keeps the BCR
#   build inside HBM (f64 D/E would be ~15 GB alone at the old b=546;
#   balanced f32 blocks are ~3.7 GB). Intermediate measured points:
#   nspan=460 -> 143,832 DOF and nspan=1000 -> 312,312 DOF
#   (scripts/probe_crm_chunked.py docstring has the timings).
MESH_KW = {}
if os.environ.get("CRM_SPAN"):
    MESH_KW["span"] = float(os.environ["CRM_SPAN"])
if os.environ.get("CRM_CROOT"):
    MESH_KW["c_root"] = float(os.environ["CRM_CROOT"])


def main():
    from eigd_tpu.models.crm import CRM

    crm = CRM(nspan=NSPAN, nchord=NCHORD, nheight=NHEIGHT, N=N, m=M,
              lanczos_polish=POLISH, lanczos_sweep=SWEEP,
              lanczos_block=BLOCK, factor_jitter=JITTER, **MESH_KW)
    print(f"CRM: {crm.nvars} padded DOF ({crm.nnodes} nodes, "
          f"{crm.profile['nelems']} elements, {crm.nb} stations x "
          f"b={crm.b})", flush=True)

    t0 = time.time()
    crm.initialize()
    print(f"initialize (compile+solve): {time.time() - t0:.1f}s", flush=True)
    print("freq (Hz):", crm.profile["natural frequencies (Hz)"], flush=True)

    c0 = float(crm.get_modal_compliance())
    crm.initialize_adjoint()
    crm.add_modal_compliance_derivative(1.0)
    t0 = time.time()
    crm.finalize_adjoint()
    print(f"finalize_adjoint (compile+solve): {time.time() - t0:.1f}s",
          flush=True)
    g = np.asarray(crm.xb)
    print("grad:", g, flush=True)

    # steady-state timing: re-run the solve + adjoint on the cached programs
    t0 = time.time()
    crm.initialize()
    t_solve = time.time() - t0
    crm.initialize_adjoint()
    crm.add_modal_compliance_derivative(1.0)
    t0 = time.time()
    crm.finalize_adjoint()
    t_adj = time.time() - t0
    print(f"steady-state: solve {t_solve:.2f}s  adjoint {t_adj:.2f}s",
          flush=True)

    if os.environ.get("CRM_NO_FD"):
        return

    # central-difference check along a random thickness direction
    rng = np.random.default_rng(5)
    p = jnp.asarray(rng.uniform(0.5, 1.0, size=crm.ncomp))
    h = float(os.environ.get("CRM_FD_H", 1e-5))

    def value(x):
        c = CRM(nspan=NSPAN, nchord=NCHORD, nheight=NHEIGHT, N=N, m=M,
                lanczos_polish=POLISH, lanczos_sweep=SWEEP,
                lanczos_block=BLOCK, factor_jitter=JITTER, **MESH_KW)
        c.x = x
        c.initialize()
        return float(c.get_modal_compliance())

    vp = value(crm.x + h * p)
    vm = value(crm.x - h * p)
    fd = (vp - vm) / (2 * h)
    ans = float(p @ jnp.asarray(g))
    rel = abs(ans - fd) / abs(fd)
    print(f"FD h={h:.0e}: adjoint={ans:.10e} fd={fd:.10e} rel={rel:.3e}",
          flush=True)


if __name__ == "__main__":
    main()
