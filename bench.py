"""Benchmark: N smallest eigenpairs + full adjoint gradient of a plane-stress
topology problem, on the default JAX backend (the real TPU under the driver).

TPU path (one monolithic jitted program — measured: the staged-eager split
used in round 1 cost ~100x in tunnel dispatch overhead):
  filter -> stencil assembly -> block-cyclic-reduction f32 factor + f64
  iterative refinement -> adaptive shift-invert Lanczos (rigid modes
  deflated) -> LAA + adaptive SIBK adjoint -> total derivative, end to end
  under one jax.jit.

Baseline: the reference's pipeline shape on CPU — SciPy SuperLU
factorization + ARPACK shift-invert eigensolve + the same number of factor
applications the TPU adjoint performs (SpLuOperator counting is the
reference's own cost proxy, eigenvector_derivatives.py:16-22).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} on stdout;
diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the axon tunnel's XLA compiles are the wall-clock
# killer (round-2 driver run: 805.7 s compile vs 2.6 s steady state, rc=124).
# The EFFECTIVE cache dir is the one eigd_tpu/config.py sets at import —
# ~/.cache/eigd_tpu_xla_<hosttag> — which OVERRIDES anything configured here
# the moment make_topo() imports the package (r4 lesson, diagnosed r5: the
# repo-local .jax_cache/ was always empty because every real compile went to
# the home-dir cache; and at 350 MB per flagship executable / 21 GB total,
# committing the cache to git is infeasible anyway). Warmth therefore comes
# from prewarming THE FINAL DEFAULT CONFIG in-round on this host — the
# driver re-runs bench.py on the same host/user, so the home-dir cache
# carries over. EIGD_BENCH_CACHE overrides the dir (exported as
# EIGD_TPU_COMPILE_CACHE so the package import respects it).
if os.environ.get("EIGD_BENCH_CACHE"):
    os.environ["EIGD_TPU_COMPILE_CACHE"] = os.environ["EIGD_BENCH_CACHE"]


def _cache_dir_effective():
    import eigd_tpu  # noqa: F401  (its import configures the cache)

    return jax.config.jax_compilation_cache_dir


try:
    _CACHE_DIR = _cache_dir_effective()
    _entries = [f for f in os.listdir(_CACHE_DIR) if f.endswith("-cache")]
    print(f"compile cache [{_CACHE_DIR}]: {len(_entries)} entries, "
          f"{sum(os.path.getsize(os.path.join(_CACHE_DIR, f)) for f in _entries) / 1e9:.2f} GB",
          file=sys.stderr)
except Exception as e:  # pragma: no cover
    _CACHE_DIR = None
    print(f"compile cache unavailable: {e}", file=sys.stderr)

# Wall-clock budget (seconds) for the whole bench process. r4 evidence: the
# driver killed the bench before its own 3000 s budget elapsed (rc 124 with
# ~1300 s on the clock), so the internal default now assumes ~28 min. Every
# stage below is budget-gated, and the result JSON is RE-PRINTED after each
# completed stage (headline -> +fd -> +jvp -> +1M -> +CRM), so whatever the
# driver's real timeout is, the last complete stdout line is a valid record
# of everything that finished.
_T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("EIGD_BENCH_BUDGET", 1700))


def _remaining():
    return BUDGET_S - (time.perf_counter() - _T_START)

NX = int(os.environ.get("EIGD_BENCH_NX", 512))
NY = int(os.environ.get("EIGD_BENCH_NY", 256))
N_MODES = 6
_BIG0 = 2 * (NX + 1) * (NY + 1) >= 500_000
# forward Lanczos block size: Krylov vectors per factor apply. The v5e
# V-cycle apply is LATENCY-bound (~3-4 ms at 263k for ~0.5 ms of bandwidth
# need, scripts/diag_vcycle_levels.py), so fatter blocks amortize it over
# 2x the Krylov directions per step: BLOCK 8->16 at the same subspace size
# (m=176) cut the 263k sweep ~35% with jvp-oracle-identical gradient
# quality (r4: 4.92 s -> 3.13 s total, jvp_rel 4.8e-7 -> 4.2e-7).
BLOCK = int(os.environ.get("EIGD_BENCH_BLOCK", 8 if _BIG0 else 16))
# FIXED trip count (the adaptive exit's data-dependent block count made
# the objective jump ~1e-6 under FD perturbations, r3). q=11 block-16
# steps at 263k / 22 block-8 steps at 1M; fixed trips + floor-quality
# sweep applies make the forward a smooth function of x.
M_LANCZOS = int(os.environ.get("EIGD_BENCH_M",
                               BLOCK * (22 if _BIG0 else 11)))
_LTOL = os.environ.get("EIGD_BENCH_LANCZOS_TOL",
                       "1e-11" if _BIG0 else "none")
LANCZOS_TOL = None if _LTOL == "none" else float(_LTOL)
# Factor selection: the O(n)-memory multigrid factor now wins at every
# size (measured r2: 3.77 s vs 4.98 s for bcr_f32 at 263k DOF once the
# V-cycle smoothers were tuned) and is the only factor that fits 1M DOF on
# a 16 GB chip. Override with EIGD_BENCH_FACTOR (bcr_f32 remains the
# direct-factor cross-check).
FACTOR = os.environ.get("EIGD_BENCH_FACTOR", "mg")
# sigma=-1: any sigma<0 keeps K-sigma*M SPD; -1 sits 10x closer to the
# spectrum (lam_1 ~ 0.95) than the old -10, so the shift-invert gap ratios
# are ~3x stronger per Krylov step — measured 263k 3.23->2.62 s and 1M
# 13.19->11.94 s, with the FD check improving (2.6e-3 -> 2.7e-4 at 1M:
# fewer blocks to the same subspace quality leaves less inexact-sweep
# noise). The CPU baseline uses the same shift (cpu_baseline).
SIGMA = float(os.environ.get("EIGD_BENCH_SIGMA", -1.0))
ORTHO = os.environ.get("EIGD_BENCH_ORTHO", "local")
APPROX_RTOL = float(os.environ.get("EIGD_BENCH_APPROX_RTOL", 1e-5))
APPROX_MAXITER = int(os.environ.get("EIGD_BENCH_APPROX_MAXITER", 18))
# Default configuration (r4): reference-class gradients at bench scale.
# The r4 263k ladder (after r3's accuracy recipe; all measured on-chip,
# quality judged by the jvp-vs-vjp oracle — the FD Richardson quotient is
# noise-floored at ~3e-6..1e-5 at this scale and scatters run to run):
#   r3 default (block 8, q=17, floor sweep, polish=3/spare=8,
#       approx ladder T=10, adjoint_rtol 1e-10):   4.92 s, jvp 4.8e-7
#   + BLOCK=16 @ m=176 (q=11), ladder T=5,
#     adjoint_rtol 4e-10:                          4.40 s
#   + min_coarse 4500 (one less MG level):         4.36 s
#   + plane-resident f32 PCG (no per-iteration
#     layout transposes):                          3.13 s, jvp 4.2e-7  <- default
# r3 ablations that still hold: polish=2 degrades to 1e-4..1.2e-5;
# cheap intermediate polish steps 1.6e-4; floor sweep over 1e-5 sweeps
# buys the last order of magnitude.
# 1M keeps the r2-measured economy configuration unchanged (adaptive
# exit, approx sweep, polish=2, precond ladder — 11.9 s fwd+bwd).
# Measured r3: the 263k accuracy recipe does NOT transfer to 1M — floor
# sweep + no-stagnation 1e-11 applies at 1M conditioning ran the forward
# at 39 s for fd 8e-5, and a fixed 18-block sweep under-converges there
# (the adaptive exit runs deeper at 1M's weaker apply quality).
_BIG = _BIG0
POLISH = int(os.environ.get("EIGD_BENCH_POLISH", 2 if _BIG else 3))
SWEEP = os.environ.get("EIGD_BENCH_SWEEP", "approx")
# "approx" at BOTH sizes (r4): at 1M the one-V-cycle "precond" ladder
# needed deep rounds (maxiter 120) for weak per-step contraction — the
# f32-PCG approx ladder at T=5 rounds measured 10.28 s -> 8.73 s total
# (reverse 5.15 -> 3.6 s) at jvp_rel 8.8e-6 (vs 4.4e-6; both under the
# 1e-5 bar; EIGD_BENCH_LADDER=precond EIGD_BENCH_ADJ_MAXITER=120
# restores the accuracy-leaning r3 configuration).
LADDER = os.environ.get("EIGD_BENCH_LADDER", "approx")
# approx-ladder depth 30 (T=5 block steps/round): the r4 round ablation
# showed the deep (T=10) rounds past ~5 orders of contraction fight the
# f32-ladder noise floor — shallower rounds at the same total cost land
# the same residual (scripts/diag_263k_breakdown.py).
ADJ_MAXITER = int(os.environ.get("EIGD_BENCH_ADJ_MAXITER",
                                 120 if LADDER == "precond" else 30))
NRESTART = int(os.environ.get("EIGD_BENCH_NRESTART", 8))
POLISH_SPARE = int(os.environ.get("EIGD_BENCH_POLISH_SPARE",
                                  0 if _BIG else 8))
# stagnation exits disabled by default: data-dependent plateau exits in
# the PCG applies were an FD-noise source; accurate applies converge by
# rtol, approx/sweep applies by tol/cap/underflow (see GridMGFactor._pcg)
STAG = int(os.environ.get("EIGD_BENCH_STAG", 2 if _BIG else 1000000))


# Committed 1M-DOF CPU baseline (VERDICT r3 item 2): the reference-shaped
# SciPy pipeline (SuperLU factor + ARPACK shift-invert + 120+1 adjoint
# applies — cpu_baseline() below) measured at 1024x512 / 1,051,650 DOF on
# this host via `JAX_PLATFORM_NAME=cpu python scripts/bench_cpu_1m.py`,
# 2026-08-20: solve times [339.6, 439.2] s (lam[3:6] identical across reps);
# the MIN is committed — the conservative choice, variance protection cuts
# both ways. Set EIGD_CPU_BASELINE_1M=0 to drop the field.
CPU_BASELINE_1M = float(os.environ.get("EIGD_CPU_BASELINE_1M", 339.6))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_topo():
    from eigd_tpu.models.natural_frequency import make_model

    # refinement tolerance 1e-11: the forward Ritz accuracy is linear in
    # the apply accuracy, and 1e-11 keeps the bench's FD check clean while
    # saving ~one f64 refinement pass per factor apply vs the 1e-13 default.
    # rtol=1e-8 -> adjoint_rtol 1e-10: with the cheap approx ladder the
    # extra rounds cost ~0.3 s and keep the adjoint gradient consistent
    # across solver configs to ~3e-7 (r3: B/F/G/M adjoint values agree to
    # that level)
    fo = ({"rtol": float(os.environ.get("EIGD_BENCH_RTOL", 1e-11)),
           "maxiter": int(os.environ.get("EIGD_BENCH_MG_MAXITER", 60)),
           "approx_rtol": APPROX_RTOL,
           "approx_maxiter": APPROX_MAXITER,
           # forward-sweep apply channel: f32 solves driven to the machine
           # floor (rtol 0) — the FD-check noise floor of the objective
           # tracks sweep apply quality (measured: fd_rel 5.8e-6 at 1e-5
           # vs 4.1e-7 at the floor), while the adjoint ladder keeps the
           # cheap approx_rtol solves
           "sweep_rtol": (None if _BIG else float(os.environ.get(
               "EIGD_BENCH_SWEEP_RTOL", 0.0))),
           "sweep_maxiter": (None if _BIG else int(os.environ.get(
               "EIGD_BENCH_SWEEP_MAXITER", 24))),
           "degree": int(os.environ.get("EIGD_BENCH_MG_DEGREE", 3)),
           # V-cycle depth: stop coarsening at this size (dense coarse
           # solve). The v5e V-cycle is LATENCY-bound (~10 ms at 263k for
           # ~0.5 ms of bandwidth need, measured scripts/diag_263k_ops.py)
           # — fewer, larger levels trade tiny-kernel launches for one
           # bigger dense coarse GEMM.
           "min_coarse": int(os.environ.get("EIGD_BENCH_MG_MIN_COARSE",
                                            4500)),
           "stag_bad": STAG,
           # V-cycle implementation: the f32 V-cycle subgraph is
           # deterministically miscompiled by XLA:TPU inside the large
           # forward program at ~1M DOF (apply EXPANDS ~22x in-context vs
           # 0.027 out-of-context, same factor bits; barriers don't fix
           # it). The Pallas plane-layout V-cycle sidesteps the miscompile
           # (pallas_call is opaque to XLA fusion) AND is the fastest
           # variant at EVERY size: 24.6 s vs 60.2 s (vcycle="f64") full
           # fwd+bwd at 1M DOF, and 4.91 s vs 7.84 s over "plain" at 263k
           # DOF (measured r2, bit-identical objective values).
           "vcycle": os.environ.get("EIGD_BENCH_VCYCLE", "pallas")}
          if FACTOR == "mg" else {"tol": 1e-11})
    # lanczos_polish=1: one shift-invert subspace-iteration step on the
    # selected Ritz block (one extra accurate factor apply). Without it the
    # TPU basis-noise floor (~1e-7, f32 sweeps + dd-GEMM measurement) is
    # amplified by lam_max/lam in the lam-VJP's phi^T dA phi contraction —
    # measured gradient FD rel-err 0.55 at 1M DOF; with polish the FD check
    # is clean at every size.
    # Adjoint method: sibk (mixed ladder) default; "pcpg" = the block
    # projected CG with ONE f32 V-cycle per iteration as the preconditioner
    # — at 1M DOF each sibk ladder step is a full inner f32 PCG solve
    # (several V-cycles), so pcpg's per-iteration cost is ~constant-factor
    # cheaper (see ops/adjoint.py pcpg docstring).
    adj_method = os.environ.get("EIGD_BENCH_ADJOINT", "sibk")
    # EIGD_BENCH_MIXED=0: f64 accurate-apply ladder (accuracy-max probes)
    mixed = bool(int(os.environ.get("EIGD_BENCH_MIXED", 1)))
    if adj_method == "pcpg":
        adj_opts = {"maxiter": ADJ_MAXITER, "mixed": mixed}
    else:
        adj_opts = {"maxiter": ADJ_MAXITER, "nrestart": NRESTART,
                    "mixed": mixed,
                    # "precond": ONE raw V-cycle per ladder step instead of
                    # an f32 PCG solve (see adj.sibk ladder param)
                    "ladder": LADDER}
    return make_model(nx=NX, ny=NY, Lx=2.0, Ly=1.0, N=N_MODES, rfact=2.0,
                      m=M_LANCZOS, factor_kind=FACTOR,
                      lanczos_tol=LANCZOS_TOL,
                      lanczos_block=BLOCK, lanczos_ortho=ORTHO,
                      lanczos_check_every=2,
                      # 4e-8 -> adjoint_rtol 4e-10: past ~1e-9 the mixed
                      # f32 ladder grinds at its noise floor (r4 rounds
                      # 4-6 contracted <2x each for 0.7 s); the jvp oracle
                      # reads the SAME 4e-7 gradient class either way
                      rtol=float(os.environ.get(
                          "EIGD_BENCH_ADJ_RTOL", 1e-7 if _BIG else 4e-8)),
                      sigma=SIGMA,
                      factor_options=fo, lanczos_polish=POLISH,
                      lanczos_polish_spare=POLISH_SPARE,
                      adjoint_method=adj_method,
                      adjoint_options=adj_opts,
                      # "approx": f32 preconditioner-quality forward sweep +
                      # polish accurate applies (see block_lanczos_solve)
                      lanczos_sweep=SWEEP)


def tpu_run():
    topo = make_topo()
    x0 = jnp.asarray(topo.x)

    from eigd_tpu.fem import assembly as fem

    def pre(x):
        rho = topo.fltr.apply(x)
        return fem.element_density(rho, topo.conn)

    def tail(lam, Q):
        # eta-weighted eigenvector aggregate (the reference's aggregate
        # design, buckling.py:702-760): smooth in lam, so the objective is
        # continuous through mode crossings at the solved-set boundary and
        # invariant under degenerate-pair rotations — a bare sum(Q[:8]**2)
        # jumps O(1) when modes 6/7 swap under an FD perturbation
        # (observed at 1M DOF), which no gradient can match.
        eta = jnp.exp(-2.0 * (lam - lam[0]))
        return jnp.sum(jnp.sqrt(lam)) + jnp.sum(eta[None, :] * Q[:8, :] ** 2)

    n_dof = 2 * (NX + 1) * (NY + 1)
    staged = os.environ.get("EIGD_BENCH_STAGED")
    staged = (n_dof >= 500_000) if staged is None else bool(int(staged))
    if staged:
        # Two-program execution (forward solve / reverse solve): at ~1M DOF
        # the single fused forward+reverse executable has been observed to
        # return a corrupted forward on this stack (wrong eigenvalues while
        # the same program at 263k and the forward alone at 1M are exact) —
        # see ops/autodiff.py:staged_value_and_grad. Identical math, one
        # extra ~60 ms dispatch.
        from eigd_tpu.ops.autodiff import staged_value_and_grad

        run = staged_value_and_grad(pre, tail, topo.problem, topo.cfg)
    else:
        def objective(x):
            lam, Q, rho, rhoE = topo._solve_fn(x)
            return tail(lam, Q)

        run = jax.jit(jax.value_and_grad(objective))
    tpu_run.staged = staged

    t0 = time.perf_counter()
    v, g = run(x0)
    g.block_until_ready()
    compile_time = time.perf_counter() - t0
    log(f"compile+first run: {compile_time:.1f}s  value={float(v):.6f}")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        v, g = run(x0)
        g.block_until_ready()
        times.append(time.perf_counter() - t0)
    log(f"steady-state runs: {[round(t, 3) for t in times]}")
    if staged:
        # Free diagnostic from the two-program split: where does the wall
        # time go, forward eigensolve or reverse (adjoint) solve?
        t0 = time.perf_counter()
        out = run.fwd_prog(x0)
        jax.block_until_ready(out)
        log(f"  fwd program alone: {time.perf_counter() - t0:.3f}s "
            "(reverse = total - fwd)")

    pert = jnp.asarray(np.random.default_rng(7).uniform(size=x0.shape))
    ans = float(pert @ g)

    def fd_check(acc):
        # Finite-difference check of the full gradient at bench scale,
        # recorded in the output JSON. Reuses the compiled value_and_grad
        # program (a second objective-only executable would double the HBM
        # footprint). The measured error model at 263k DOF (r3 h-sweep) is
        #   rel(h) ~ 5.7 h^2 (truncation)  +  eps/(2 h |g|) (solver noise)
        # so a single h cannot resolve 1e-6; pairs h, h/2 are Richardson-
        # extrapolated ((4 fd(h/2) - fd(h))/3, truncation -> O(h^4)).
        # Reporting (VERDICT r3 item 7): the HEADLINE fd_rel is the plain
        # Richardson-4 estimate at the largest h pair — NOT the min over
        # estimators (min-of-5 selects the luckiest cancellation) — and
        # every individual quotient is recorded in fd_detail.
        hs = tuple(float(h) for h in os.environ.get(
            "EIGD_BENCH_FD_H", "3e-2,1.5e-2").split(","))
        fds = {}
        detail = {"plain": {}, "rich4": {}, "rich6": {}}
        for h in hs:
            vp, _ = run(x0 + h * pert)
            vm, _ = run(x0 - h * pert)
            fd = (float(vp) - float(vm)) / (2 * h)
            fds[h] = fd
            rel = abs(ans - fd) / abs(fd)
            detail["plain"][f"{h:.1e}"] = rel
            log(f"FD h={h:.0e}: adjoint={ans:.10e} fd={fd:.10e} "
                f"rel={rel:.3e}")
        rich = {}
        for h in hs:
            if h / 2 in fds:
                r4 = (4.0 * fds[h / 2] - fds[h]) / 3.0
                rich[h] = r4
                rel = abs(ans - r4) / abs(r4)
                detail["rich4"][f"{h:.1e}"] = rel
                log(f"FD richardson h={h:.0e}: fd4={r4:.10e} rel={rel:.3e}")
        for h in rich:
            if h / 2 in rich:
                r6 = (16.0 * rich[h / 2] - rich[h]) / 15.0
                rel = abs(ans - r6) / abs(r6)
                detail["rich6"][f"{h:.1e}"] = rel
                log(f"FD richardson2 h={h:.0e}: fd6={r6:.10e} rel={rel:.3e}")
        if detail["rich4"]:
            acc["fd_rel"] = detail["rich4"][f"{max(rich):.1e}"]
        elif detail["plain"]:
            acc["fd_rel"] = min(detail["plain"].values())
        acc["fd_detail"] = detail

    def jvp_check(acc):
        # jvp-vs-vjp directional consistency (VERDICT r3 item 1): forward
        # mode shares the identical primal solve with the reverse-mode
        # gradient, so |jvp - g.p|/|jvp| isolates solver/derivation error
        # with no FD step size and no objective-smoothness requirement —
        # the full-scale analog of the reference's complex-step channel
        # (eigenvector_derivatives.py:1387-1414).
        from eigd_tpu.ops.autodiff import staged_jvp

        try:
            t0 = time.perf_counter()
            jfn = staged_jvp(pre, tail, topo.problem, topo.cfg)
            vj, dv = jfn(x0, pert)
            dv = float(dv)
            jvp_rel = abs(ans - dv) / abs(dv)
            acc["jvp_rel"] = jvp_rel
            log(f"JVP check: vjp={ans:.12e} jvp={dv:.12e} "
                f"rel={jvp_rel:.3e} "
                f"(primal drift {abs(float(vj) - float(v)):.1e}, "
                f"{time.perf_counter() - t0:.1f}s)")
        except Exception as e:  # pragma: no cover
            log(f"JVP check failed: {e}")
            acc["jvp_rel"] = None

    return min(times), float(v), np.asarray(g), fd_check, jvp_check


def efficiency_estimate(wall):
    """Roofline estimates. A shift-invert eigensolver is memory-bound, not
    FLOP-bound: the right roofline is HBM bandwidth on the factor and basis
    reads, so report both MFU (tiny by construction) and effective HBM BW."""
    b = 2 * (NY + 1)
    nb = NX + 1
    n = nb * b
    blocks_fwd = M_LANCZOS // BLOCK if LANCZOS_TOL is None else 16
    rounds_adj = 4
    t_adj = -(-ADJ_MAXITER // N_MODES)
    ir = 4  # refinement passes per blocked apply (stagnation-gated)
    napply = blocks_fwd + rounds_adj * t_adj + 2
    factor_bytes = 3 * nb * b * b * 4  # BCR levels, f32
    basis_bytes = 3 * (M_LANCZOS + BLOCK) * n * 8  # V/BV/W_raw, f64
    stencil_bytes = 2 * n * 36 * 8
    bytes_moved = (napply * ir * (factor_bytes + stencil_bytes)
                   + 2 * blocks_fwd * basis_bytes // 3  # f32 sweeps read V32
                   + 4 * basis_bytes)  # final Gram/H GEMMs + transforms
    build_flops = 8.0 * nb * b**3
    apply_flops = napply * ir * (10 * nb * b * b * BLOCK + 72 * n * BLOCK)
    mfu = (build_flops + apply_flops) / wall / (394e12 / 2)
    bw = bytes_moved / wall / 819e9
    return mfu, bw


def cpu_baseline():
    """Reference-shaped SciPy pipeline: assembly + SuperLU + ARPACK
    shift-invert + the adjoint's factor applications."""
    from scipy import sparse
    from scipy.sparse import linalg as spla

    from eigd_tpu.fem import assembly as fem

    topo = make_topo()
    rho = topo.fltr.apply(topo.x)
    rhoE = fem.element_density(rho, topo.conn)
    K_op, M_op = topo._assemble(rhoE)

    mats_K = np.asarray(K_op.mats)
    mats_M = np.asarray(M_op.mats)
    dofs = np.asarray(K_op.dofs)
    n = K_op.n
    rows = np.repeat(dofs, dofs.shape[1], axis=1).reshape(-1)
    cols = np.tile(dofs, (1, dofs.shape[1])).reshape(-1)

    t0 = time.perf_counter()
    K = sparse.coo_matrix((mats_K.reshape(-1), (rows, cols)),
                          shape=(n, n)).tocsc()
    M = sparse.coo_matrix((mats_M.reshape(-1), (rows, cols)),
                          shape=(n, n)).tocsc()
    sigma = SIGMA  # same shift as the TPU pipeline (fairness)
    lu = spla.splu((K - sigma * M).tocsc())

    def opinv(x):
        return lu.solve(x)

    OPinv = spla.LinearOperator((n, n), matvec=opinv)
    lam, Q = spla.eigsh(K, k=N_MODES + 3, M=M, sigma=sigma, which="LM",
                        OPinv=OPinv)
    # adjoint-equivalent factor applications: the TPU reverse pass runs up
    # to 2 restarts x 60 single-vector ladder steps + 1 blocked LAA solve.
    rng = np.random.default_rng(0)
    for _ in range(120):
        lu.solve(rng.standard_normal(n))
    lu.solve(rng.standard_normal((n, N_MODES + 3)))
    return time.perf_counter() - t0, lam


def run_1m_extra(budget_s):
    """Flagship 1M-DOF configuration (1024x512, multigrid factor), measured
    in a fresh subprocess so the default-size bench keeps its own HBM and
    compile-cache state. Returns a dict for the JSON 'extra_1m' field."""
    import subprocess

    env = dict(os.environ, EIGD_BENCH_NX="1024", EIGD_BENCH_NY="512",
               EIGD_BENCH_SKIP_1M="1", EIGD_BENCH_NO_BASELINE="1",
               EIGD_BENCH_BUDGET=str(int(budget_s)))
    t0 = time.perf_counter()
    rc, stdout, stderr = "timeout", "", ""
    try:
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             timeout=budget_s)
        rc, stdout, stderr = out.returncode, out.stdout, out.stderr
    except subprocess.TimeoutExpired as e:
        # The child re-prints its JSON after every stage — salvage the last
        # complete line from the partial output.
        log(f"1M extra timed out after {budget_s:.0f}s (salvaging)")
        stdout = (e.stdout or b"").decode() if isinstance(
            e.stdout, bytes) else (e.stdout or "")
    data = _last_json_line(stdout)
    if data is None:
        log(f"1M extra failed: rc={rc} stderr tail: {stderr[-500:]}")
        return {"error": rc}
    extra = {"dof": 1051650, "wall_s": data["value"],
             "fd_rel": data.get("fd_rel"),
             "jvp_rel": data.get("jvp_rel"),
             "total_s": round(time.perf_counter() - t0, 1)}
    if data.get("fd_detail"):
        extra["fd_detail"] = data["fd_detail"]
    if CPU_BASELINE_1M:
        extra["cpu_baseline_s"] = CPU_BASELINE_1M
        extra["vs_baseline"] = round(CPU_BASELINE_1M / data["value"], 3)
    return extra


def _last_json_line(stdout):
    for line in reversed((stdout or "").strip().splitlines()):
        try:
            return json.loads(line)
        except ValueError:
            continue
    return None


def run_crm_extra(budget_s):
    """CRM wingbox line (VERDICT r2 item 5): warm fwd+adjoint wall, CPU
    ARPACK+SuperLU baseline on the same mesh, FD check. Subprocess for
    HBM/compile isolation."""
    import subprocess

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "bench_crm.py")
    env = dict(os.environ, CRM_BUDGET=str(int(budget_s)))
    t0 = time.perf_counter()
    rc, stdout, stderr = "timeout", "", ""
    try:
        out = subprocess.run([sys.executable, script], env=env,
                             capture_output=True, text=True,
                             timeout=budget_s)
        rc, stdout, stderr = out.returncode, out.stdout, out.stderr
    except subprocess.TimeoutExpired as e:
        log(f"CRM extra timed out after {budget_s:.0f}s (salvaging)")
        stdout = (e.stdout or b"").decode() if isinstance(
            e.stdout, bytes) else (e.stdout or "")
    data = _last_json_line(stdout)
    if data is None:
        log(f"CRM extra failed: rc={rc} stderr tail: {stderr[-500:]}")
        return {"error": rc}
    data["total_s"] = round(time.perf_counter() - t0, 1)
    return data


def run_baseline():
    """CPU baseline, min of EIGD_BENCH_BASELINE_REPS reps (run-to-run CPU
    variance is ~±25%; the min is the conservative side for vs_baseline)."""
    try:
        reps = int(os.environ.get("EIGD_BENCH_BASELINE_REPS", 2))
        times = []
        for r in range(reps):
            t0 = time.perf_counter()
            bt, lam = cpu_baseline()
            log(f"CPU baseline rep {r}: {bt:.1f}s (total incl assembly "
                f"{time.perf_counter() - t0:.1f}s), lam[3:]={lam[3:6]}")
            times.append(bt)
        return min(times)
    except Exception as e:  # pragma: no cover
        log(f"CPU baseline failed: {e}")
        return float("nan")


def main():
    # Stage-by-stage execution with a re-print of the (cumulative) result
    # JSON after EVERY completed stage: whatever the driver's real timeout
    # is, the last complete stdout line records everything that finished.
    tpu_time, val, grad, fd_check, jvp_check = tpu_run()
    assert np.all(np.isfinite(grad)), "non-finite gradient"
    mfu, bw = efficiency_estimate(tpu_time)
    log(f"efficiency estimate: MFU {mfu * 100:.2f}%, effective HBM BW "
        f"{bw * 100:.1f}% of peak (memory-bound workload: BW is the "
        "relevant roofline)")
    n_dof = 2 * (NX + 1) * (NY + 1)
    prog = ("staged fwd/bwd jits" if getattr(tpu_run, "staged", False)
            else "monolithic jit")
    result = {
        "metric": f"wall time: {N_MODES} eigenpairs + adjoint gradient, "
                  f"{NX}x{NY} plane-stress topology ({n_dof} DOF), "
                  f"{prog}",
        "value": round(tpu_time, 4),
        "unit": "s",
        "vs_baseline": None,
    }
    print(json.dumps(result), flush=True)

    # Accuracy checks (reuse the compiled program: cheap once warm).
    if not os.environ.get("EIGD_BENCH_NO_FD") and _remaining() > 90:
        fd_check(result)
        print(json.dumps(result), flush=True)

    # CPU baseline for the headline vs_baseline gate: pure NumPy/SciPy work,
    # no compile risk — worth its ~2 min before the riskier jvp/extras.
    if not os.environ.get("EIGD_BENCH_NO_BASELINE") and _remaining() > 200:
        base_time = run_baseline()
        if np.isfinite(base_time):
            result["vs_baseline"] = round(base_time / tpu_time, 3)
            print(json.dumps(result), flush=True)

    # jvp-vs-vjp oracle: compiles two extra staged programs (cold ~10 min at
    # 263k; warm-cache seconds). Gate on budget so a cold-cache driver run
    # still reaches the extras line above it in the artifact.
    if not os.environ.get("EIGD_BENCH_NO_JVP") and _remaining() > (
            120 if _cache_warm() else 800):
        jvp_check(result)
        print(json.dumps(result), flush=True)

    # Extras: flagship 1M-DOF number (BASELINE.md north star) and the CRM
    # wingbox, each behind the remaining wall-clock budget and each followed
    # by a re-print. EIGD_BENCH_SKIP_1M=1 disables (set in the 1M child).
    if (NX, NY) == (512, 256) and not os.environ.get("EIGD_BENCH_SKIP_1M"):
        rem = _remaining()
        if rem > 300:
            result["extra_1m"] = run_1m_extra(rem - 120)
            print(json.dumps(result), flush=True)
        else:
            log(f"skipping 1M extra: only {rem:.0f}s of budget left")
        rem = _remaining()
        if rem > 180 and not os.environ.get("EIGD_BENCH_SKIP_CRM"):
            result["extra_crm"] = run_crm_extra(rem - 30)
            print(json.dumps(result), flush=True)


def _cache_warm():
    """Heuristic: a warm cache holds the multi-100-MB flagship executables."""
    try:
        return sum(os.path.getsize(os.path.join(_CACHE_DIR, f))
                   for f in os.listdir(_CACHE_DIR)
                   if f.endswith("-cache")) > 1e9
    except (OSError, TypeError):
        return False


if __name__ == "__main__":
    main()
