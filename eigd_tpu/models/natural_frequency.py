"""Natural-frequency topology analysis.

Rebuild of /root/reference/examples/natural_frequency.py (TopologyAnalysis
:14-691, MinFreqOpt :693-847) on the eigd_tpu functional core. The reference's
hand-written three-phase adjoint protocol (initialize / initialize_adjoint /
finalize_adjoint) is implemented here literally *as* a ``jax.vjp``: the whole
chain x -> filter -> element densities -> (K, M) -> eigensolve -> (omega, Q)
is one differentiable function; ``initialize`` records its VJP and
``finalize_adjoint`` pulls the accumulated (lamb, Qb) seeds through it. All
of the reference's hand-derived ``get_*_matrix_deriv`` / filter-transpose /
KS reverse passes are replaced by AD.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fem import assembly as fem
from ..fem.quad import plane_stress_tables
from ..ops.autodiff import EigProblem, EighGenConfig, eigh_gen


class TopologyAnalysis:
    """Plane-stress natural-frequency analysis K(x) phi = lam M(x) phi.

    The structure is free-free: the three rigid-body modes are solved along
    with the flexible modes and discarded (reference :348, 382-384).
    """

    def __init__(self, fltr, conn, X, node_sets=None, element_sets=None,
                 E=1.0, nu=0.3, ptype_K="simp", ptype_M="simp", rho0_K=1e-6,
                 rho0_M=1e-9, p=3.0, q=5.0, density=1.0, sigma=-10.0, N=10,
                 m=None, solver_type="lanczos", tol=1e-14, rtol=1e-10,
                 eig_atol=1e-5, adjoint_method="sibk", adjoint_options=None,
                 deriv_type="tensor", factor_kind="dense", grid_shape=None,
                 lanczos_tol=None, lanczos_block=1, lanczos_ortho="full",
                 lanczos_check_every=1, uniform_grid=False,
                 factor_options=None, lanczos_polish=0,
                 lanczos_polish_spare=0, lanczos_sweep="exact",
                 pallas_mv="auto"):
        del solver_type, deriv_type  # single TPU-native solver; always batched
        self.fltr = fltr
        self.conn = jnp.asarray(np.asarray(conn))
        self.X = jnp.asarray(np.asarray(X))
        self.node_sets = node_sets or {}
        self.element_sets = element_sets or {}
        self.nelems = int(self.conn.shape[0])
        self.nnodes = int(np.asarray(conn).max()) + 1
        self.nvars = 2 * self.nnodes
        self.N = N
        self.sigma = sigma
        self.eig_atol = eig_atol
        adjoint_options = adjoint_options or {}

        if m is None:
            m = max(3 * N + 1, 60)
        if lanczos_block > 1:
            # Block Krylov convergence is governed by the polynomial DEGREE
            # q = m / block, not the subspace size m — but each of the two
            # recovery channels relaxes the required degree (VERDICT r4
            # item 7: the old static q < 2N+6 bound fired on the blessed
            # bench config, which converges and oracle-verifies at 4e-7):
            #   * block columns beyond N: mode i's Chebyshev convergence
            #     factor uses the gap to mode p+1, not N+1 (block-Lanczos
            #     theory, e.g. Saad "Numerical Methods for Large Eigenvalue
            #     Problems" §6.. block bounds) — each spare column is worth
            #     at least one degree of separation for the wanted modes;
            #   * each Ritz polish step is one accurate shift-invert
            #     subspace iteration on the selected block — one more
            #     degree, applied exactly where it is needed.
            # Measured calibration: N=6, block=16, q=11, polish=3 gives
            # q_eff = 24 >= 18 and verifies at jvp 4.2e-7 (BENCH_r04);
            # block=8, q=17 (r3 default) gives q_eff = 22. A genuinely
            # marginal config (q_eff below 2N+6) still warns.
            q_deg = m // lanczos_block
            q_eff = (q_deg + max(0, lanczos_block - N)
                     + int(lanczos_polish or 0))
            if q_eff < 2 * N + 6:
                import warnings

                warnings.warn(
                    f"m={m} with lanczos_block={lanczos_block} gives only "
                    f"q={q_deg} block steps (effective degree {q_eff} after "
                    f"{lanczos_block - N} spare columns and "
                    f"{int(lanczos_polish or 0)} polish steps) for N={N} "
                    f"modes; expect non-convergence below ~ 2N+6.")
        self.m = m

        self.E = E
        self.nu = nu
        self.ptype_K = ptype_K.lower()
        self.ptype_M = "linear" if ptype_M.lower() == "simp" else ptype_M.lower()
        self.rho0_K = rho0_K
        self.rho0_M = rho0_M
        self.p = p
        self.q = q
        self.density = density

        self.C0 = fem.plane_stress_C0(E, nu)
        self.dofs = fem.element_dof_map(self.conn)
        self.Be, self.He, self.detJ = plane_stress_tables(self.X, self.conn)
        # On a uniform grid every element has identical quadrature tables:
        # keep one element's worth and broadcast inside the trace. This
        # keeps O(1) constants in the compiled program instead of O(nelems)
        # (the 376 MB of f64 tables at 1M DOF otherwise ship with every
        # XLA compile payload).
        self._uniform = bool(uniform_grid)
        if self._uniform:
            self.Be = self.Be[:, :1]
            self.He = self.He[:, :1]
            self.detJ = self.detJ[:, :1]

        # Eigensolve configuration. The reference solves N+3 modes and
        # discards the three rigid-body modes (natural_frequency.py:348,
        # 382-384); here the known rigid null space is *deflated* out of the
        # Krylov iteration instead — robust even though the rigid triple is
        # exactly degenerate, and three modes cheaper.
        self.cfg = EighGenConfig(
            N=N, m=self.m, sigma=sigma, mode="normal",
            adjoint_method=adjoint_method,
            adjoint_maxiter=adjoint_options.get("maxiter", 60),
            adjoint_rtol=rtol * 1e-2, nrestart=adjoint_options.get(
                "nrestart", 2), eig_atol=eig_atol,
            lanczos_tol=lanczos_tol, block=lanczos_block,
            lanczos_ortho=lanczos_ortho,
            lanczos_check_every=lanczos_check_every,
            adjoint_mixed=adjoint_options.get("mixed", False),
            adjoint_ladder=adjoint_options.get("ladder", "approx"),
            polish=lanczos_polish, polish_spare=lanczos_polish_spare,
            lanczos_sweep=lanczos_sweep, pallas_mv=pallas_mv)
        # Scalable path: never densify — block-tridiagonal Cholesky of the
        # shifted element matrices using the grid line structure, with
        # matrix-free element-operator matvecs everywhere else.
        # 'blocktridiag_f32' stores the factor in f32 (half the HBM, f32 MXU
        # rate on the apply scans) and recovers f64 solve accuracy with
        # iterative refinement against the matrix-free f64 operator.
        factor_fn = None
        self.grid_shape = grid_shape
        if factor_kind == "mg":
            # O(n)-memory shift-invert factor: geometric-multigrid
            # preconditioned CG on the 9-point grid stencil. The only factor
            # that fits 1M+ DOF on one chip (any direct block factor stores
            # O(nx * b^2) ~ 13 GB f32 at 1M DOF); also the factor whose
            # apply cost rides HBM bandwidth instead of factor reads.
            if grid_shape is None:
                raise ValueError("factor_kind='mg' needs grid_shape")

            mg_opts = dict(factor_options or {})

            def factor_fn(A, B, sig, mode):
                from ..ops.multigrid import GridMGFactor

                # A, B are GridStencilOperators on this path: the shifted
                # stencil is a single AXPY of the cached stencils.
                Wst = A.W - sig * B.W
                return GridMGFactor.build(Wst, self.grid_shape, 2,
                                          **mg_opts)

        elif factor_kind in ("blocktridiag", "blocktridiag_f32", "bcr",
                             "bcr_f32"):
            if grid_shape is None:
                raise ValueError(f"factor_kind={factor_kind!r} needs grid_shape")
            gnx, gny = grid_shape
            use_f32 = factor_kind.endswith("_f32")
            use_bcr = factor_kind.startswith("bcr")

            def factor_fn(A, B, sig, mode):
                from ..ops.blockfactor import (BCRFactor, BlockTridiagFactor,
                                               RefinedFactor,
                                               grid_block_tridiag)
                from ..ops.stencil import (GridStencilOperator,
                                           stencil_from_elements)

                shifted = A.mats - sig * B.mats
                cls_ = BCRFactor if use_bcr else BlockTridiagFactor
                if not use_f32:
                    D, Esub = grid_block_tridiag(shifted, gnx, gny,
                                                 ndof=2)
                    return cls_.from_blocks(D, Esub)
                # build the blocks directly in f32: the f64 D/E transients
                # are the peak-memory term at 1M DOF (~11 GB)
                D, Esub = grid_block_tridiag(shifted.astype(jnp.float32),
                                             gnx, gny, ndof=2)
                inner = cls_.from_blocks(D, Esub)
                # f64 residual operator for the refinement loop: stencil
                # matvec (gather-free) of the shifted matrix.
                Wst = stencil_from_elements(shifted, gnx, gny, 2)
                op = GridStencilOperator(shifted, A.dofs, A.n, Wst,
                                         (gnx, gny), 2)
                return RefinedFactor(inner, op, **(factor_options or {}))

        self.problem = EigProblem(assemble=self._assemble,
                                  nullspace=self._nullspace,
                                  factor=factor_fn)

        self.x = 0.95 * jnp.ones(self.fltr.num_design_vars)
        self.Q = None
        self.lam = None
        self._vjp = None
        self.profile = self._init_profile()

        self._solve_jit = jax.jit(self._solve_fn)

    # ------------------------------------------------------------------
    # Differentiable core
    # ------------------------------------------------------------------

    def _assemble(self, rhoE):
        if self._uniform:
            # Uniform grid: every element shares ONE reference matrix, so
            # K.mats = c(rhoE) * Ke0 — no per-element quadrature tables in
            # the program at all (O(1) constants, O(nelems) work).
            Ke0 = jnp.einsum("qij,ik,qkl,q->jl", self.Be[:, 0], self.C0,
                             self.Be[:, 0], self.detJ[:, 0])
            Me0 = jnp.einsum("qij,qil,q->jl", self.He[:, 0], self.He[:, 0],
                             self.detJ[:, 0])
            c = fem.stiffness_interp(rhoE, ptype=self.ptype_K, p=self.p,
                                     q=self.q, rho0=self.rho0_K)
            dens = fem.mass_interp(rhoE, ptype=self.ptype_M, q=self.q,
                                   rho0=self.rho0_M, density=self.density)
            from ..ops.operators import ElementOperator

            K = ElementOperator(c[:, None, None] * Ke0[None], self.dofs,
                                self.nvars)
            M = ElementOperator(dens[:, None, None] * Me0[None], self.dofs,
                                self.nvars)
        else:
            K = fem.stiffness_matrix(rhoE, self.Be, self.detJ, self.dofs,
                                     self.nvars, self.C0,
                                     ptype=self.ptype_K,
                                     p=self.p, q=self.q, rho0=self.rho0_K)
            M = fem.mass_matrix(rhoE, self.He, self.detJ, self.dofs,
                                self.nvars, ptype=self.ptype_M, q=self.q,
                                rho0=self.rho0_M, density=self.density)
        if self.grid_shape is not None:
            # Gather/scatter-free matvecs on the structured grid (stencil.py)
            from ..ops.stencil import GridStencilOperator

            K = GridStencilOperator.from_element_operator(
                K, self.grid_shape, ndof=2)
            M = GridStencilOperator.from_element_operator(
                M, self.grid_shape, ndof=2)
        return K, M

    def _nullspace(self, rhoE):
        """Rigid-body modes of the free-free plane-stress structure:
        two translations + the linearized rotation (3, nvars)."""
        del rhoE
        n = self.nvars
        tx = jnp.zeros(n).at[0::2].set(1.0)
        ty = jnp.zeros(n).at[1::2].set(1.0)
        rot = jnp.zeros(n).at[0::2].set(-self.X[:, 1]).at[1::2].set(
            self.X[:, 0])
        return jnp.stack([tx, ty, rot])

    def _solve_fn(self, x):
        """x (design vars) -> (lam, Q); rigid modes deflated out."""
        rho = self.fltr.apply(x)
        rhoE = fem.element_density(rho, self.conn)
        lam, Phi = eigh_gen(rhoE, self.problem, self.cfg)
        return lam, Phi, rho, rhoE

    # ------------------------------------------------------------------
    # Three-phase adjoint protocol (reference :394-519)
    # ------------------------------------------------------------------

    def initialize(self, store=False):
        t0 = time.time()
        (self.lam, Q, self.rho, self.rhoE), self._vjp = jax.vjp(
            lambda x: self._solve_fn(x), self.x)
        # Eigenvector sign continuity across design iterations (ref :386-390).
        if self.Q is not None and self.Q.shape == Q.shape:
            signs = jnp.where(jnp.sum(Q * self.Q, axis=0) < 0.0, -1.0, 1.0)
            Q = Q * signs[None, :]
            # vjp was taken before sign-flip: fold signs into the seeds later
            self._signs = signs
        else:
            self._signs = jnp.ones(Q.shape[1])
        self.Q = Q
        self.profile["eigenvalue solve time"] = time.time() - t0
        # Factor-application budgets (the reference counts actual applies
        # through SpLuOperator.count, eigenvector_derivatives.py:16-22;
        # here the counts are adaptive — upper bounds recorded here, actual
        # iteration counts recorded by add_check_adjoint_residual).
        self.profile["solve preconditioner count (max)"] = (
            self.m if self.cfg.block <= 1
            else -(-self.m // self.cfg.block))
        self.profile["adjoint preconditioner count (max)"] = (
            1 + self.cfg.nrestart * -(-self.cfg.adjoint_maxiter // self.N))
        self.profile["adjoint solution method"] = self.cfg.adjoint_method
        self.profile["natural frequencies"] = np.sqrt(
            np.asarray(self.lam)).tolist()
        if store:
            self.profile["eigenvalues"] = np.asarray(self.lam).tolist()
        return

    def initialize_adjoint(self):
        self.xb = jnp.zeros_like(self.x)
        self.lamb = jnp.zeros_like(self.lam)
        self.Qb = jnp.zeros_like(self.Q)
        return

    # ------------------------------------------------------------------
    # Checkpoint / warm restart (beyond-reference, SURVEY.md §5.4)
    # ------------------------------------------------------------------

    def save_state(self, path):
        """Checkpoint the optimization-loop state (design + eigenpairs).

        Restoring in a fresh process resumes the loop where it stopped AND
        re-arms the eigenvector sign-continuity logic (reference
        natural_frequency.py:386-390): the checkpointed Q becomes the
        "previous iterate" that the next initialize() aligns signs against,
        so gradients of |.|^2-type aggregates stay continuous across the
        restart boundary.
        """
        from ..utils.checkpoint import save_checkpoint

        return save_checkpoint(path, {"x": self.x, "lam": self.lam,
                                      "Q": self.Q})

    def restore_state(self, path):
        from ..utils.checkpoint import load_checkpoint

        like = {"x": jnp.zeros_like(jnp.asarray(self.x)),
                "lam": jnp.zeros(self.N),
                "Q": jnp.zeros((self.nvars, self.N))}
        state = load_checkpoint(path, like)
        self.x = jnp.asarray(state["x"])
        self.lam = jnp.asarray(state["lam"])
        self.Q = jnp.asarray(state["Q"])
        return self

    def finalize_adjoint(self):
        t0 = time.time()
        Qb = self.Qb * self._signs[None, :]
        (xb,) = self._vjp((self.lamb, Qb, jnp.zeros_like(self.rho),
                           jnp.zeros_like(self.rhoE)))
        self.xb = self.xb + xb
        self.profile["adjoint solution time"] = time.time() - t0
        return

    # ------------------------------------------------------------------
    # Functions of the solution + seed accumulation (reference :521-563)
    # ------------------------------------------------------------------

    def get_frequencies(self):
        return jnp.sqrt(self.lam)

    def add_frequency_derivatives(self, omegab):
        self.lamb = self.lamb + 0.5 * jnp.asarray(omegab) / jnp.sqrt(self.lam)
        return

    def get_point_coefficients(self, name):
        """Mean modal displacement coefficients over a node set (ref :531-555)."""
        nodes = jnp.asarray(self.node_sets[name])
        weight = 1.0 / len(self.node_sets[name])
        x0 = jnp.zeros(3)
        x0 = x0.at[0].set(weight * jnp.sum(self.X[nodes, 0]))
        x0 = x0.at[1].set(weight * jnp.sum(self.X[nodes, 1]))
        xcoef = jnp.stack([
            weight * jnp.sum(self.Q[2 * nodes, :], axis=0),
            weight * jnp.sum(self.Q[2 * nodes + 1, :], axis=0),
            jnp.zeros(self.Q.shape[1]),
        ])
        return x0, xcoef

    def add_point_derivative(self, name, x0b, xcoefb):
        if xcoefb is None:
            return
        nodes = jnp.asarray(self.node_sets[name])
        weight = 1.0 / len(self.node_sets[name])
        self.Qb = self.Qb.at[2 * nodes, :].add(weight * xcoefb[0][None, :])
        self.Qb = self.Qb.at[2 * nodes + 1, :].add(weight * xcoefb[1][None, :])
        return

    def eval_area(self):
        return jnp.sum(self.detJ * self.rhoE[None, :])

    def eval_area_gradient(self):
        def area(x):
            rho = self.fltr.apply(x)
            rhoE = fem.element_density(rho, self.conn)
            return jnp.sum(self.detJ * rhoE[None, :])
        return jax.grad(area)(self.x)

    def add_check_adjoint_residual(self, b_ortho=True):
        """Diagnostics (reference check_adjoint_residual, :428-440): re-run
        the adjoint solve standalone at the current design and record the
        per-mode residual and orthogonality of the adjoint equations."""
        from ..ops import adjoint as adj
        from ..ops.factor import make_shift_factor
        from ..ops.lanczos import b_orthonormalize_rows, lanczos_solve

        rho = self.fltr.apply(self.x)
        rhoE = fem.element_density(rho, self.conn)
        A, B = self._assemble(rhoE)
        if self.problem.factor is not None:
            factor = self.problem.factor(A, B, self.sigma, "normal")
        else:
            factor = make_shift_factor(A, B, self.sigma)
        deflate = b_orthonormalize_rows(self._nullspace(rhoE), B.mv)
        res = lanczos_solve(A, B, factor, self.sigma, self.cfg.N, self.m,
                            deflate=deflate)
        Phib = self.Qb * self._signs[None, :]
        psi0 = adj.laa(Phib, B, factor, res, b_ortho=True)
        psi, data, info = adj.sibk(
            Phib, A, B, res.lam, res.Phi, psi=psi0, sigma=self.sigma,
            factor=factor, rtol=self.cfg.adjoint_rtol,
            eig_atol=self.eig_atol, maxiter=self.cfg.adjoint_maxiter,
            nrestart=self.cfg.nrestart)
        r, o = adj.eval_adjoint_residual_norm(A, B, res.lam, res.Phi, Phib,
                                              psi, b_ortho=b_ortho)
        for i in range(self.N):
            self.profile[f"adjoint norm[{i:2d}]"] = float(r[i])
            self.profile[f"adjoint ortho[{i:2d}]"] = float(o[i])
            self.profile[f"adjoint lam[{i:2d}]"] = float(res.lam[i])
        self.profile["adjoint residuals"] = np.asarray(info["res"]).tolist()
        # Per-round residual curves for both solve phases (the reference
        # records these through iterative-solver callbacks,
        # natural_frequency.py:444-451).
        self.profile["adjoint residual history"] = np.asarray(
            info["hist"]).tolist()
        self.profile["adjoint iterations"] = int(info["niter"])
        self.profile["eigensolve iterations"] = int(res.niter)
        self.profile["eigensolve residuals"] = np.asarray(
            res.eig_res).tolist()
        # Factor-apply convergence diagnostics (the reference's
        # SpLuOperator.count role, eigenvector_derivatives.py:16-22): for
        # iterative factors (mg PCG / Schwarz-PCG) record the inner
        # iteration count and final residual of one probe apply so a
        # silently truncated solve is visible in the profile.
        if hasattr(factor, "mv_info"):
            probe = B.mv(res.Phi[:, :1])
            _, finfo = factor.mv_info(probe)
            self.profile["factor apply iterations"] = int(finfo["niter"])
            self.profile["factor apply final res2"] = float(
                np.max(np.asarray(finfo["res2"])))
            self.profile["factor apply tol2"] = float(
                np.max(np.asarray(finfo["tol2"])))
        return r

    def _init_profile(self):
        return {
            "nnodes": self.nnodes,
            "nelems": self.nelems,
            "N": self.N,
            "E": self.E,
            "nu": self.nu,
            "density": self.density,
            "p": self.p,
            "eig_atol": self.eig_atol,
            "sigma": self.sigma,
            "m": self.m,
        }


class MinFreqOpt:
    """KS-aggregated minimum natural frequency of the structure plus
    parasitic point masses (reference MinFreqOpt, :693-847).

    The reference hand-derives the reverse pass through two KS levels and a
    dense reduced eigenproblem (:784-806); here `_eval_min_frequency` is a
    plain differentiable function and the seeds come from jax.grad.
    """

    def __init__(self, topo: TopologyAnalysis, ks_param=1.0, fixed_mass=1.0):
        self.topo = topo
        self.ks_param = ks_param
        self.fixed_mass = fixed_mass
        self.node_sets = topo.node_sets

    def _eval_min_frequency(self, omega, coefs):
        """KS-min over node-set reduced eigenproblems (differentiable).

        For each point-mass set: reduced problem K0 = diag(omega^2),
        M0 = I + fixed_mass c0^T c0, KS-min over its frequencies; outer
        KS-min over sets (reference :740-806).
        """
        ks_param = self.ks_param
        N = omega.shape[0]
        ks_vals = []
        for name in sorted(coefs):
            c0 = coefs[name]
            M0 = jnp.eye(N) + self.fixed_mass * c0.T @ c0
            K0 = jnp.diag(omega**2)
            # dense generalized eigh via Cholesky transform of M0
            L = jnp.linalg.cholesky(M0)
            from jax.scipy.linalg import solve_triangular
            C = solve_triangular(L, K0, lower=True)
            C = solve_triangular(L, C.T, lower=True)
            lam0 = jnp.linalg.eigvalsh(0.5 * (C + C.T))
            omega0 = jnp.sqrt(lam0)
            min_omega0 = jnp.min(omega0)
            ks_vals.append(min_omega0 - jnp.log(jnp.sum(
                jnp.exp(-ks_param * (omega0 - min_omega0)))) / ks_param)
        ks_vals = jnp.stack(ks_vals)
        min_val = jnp.min(ks_vals)
        return min_val - jnp.log(jnp.sum(
            jnp.exp(-ks_param * (ks_vals - min_val)))) / ks_param

    def initialize(self, store=False):
        self.topo.initialize(store)
        self.omega = self.topo.get_frequencies()
        self.coef = {}
        for name in self.node_sets:
            _, self.coef[name] = self.topo.get_point_coefficients(name)
        self.ks_min = self._eval_min_frequency(self.omega, self.coef)
        # seeds via AD (replaces reference :784-806)
        self.omegab, self.coefb = jax.grad(
            self._eval_min_frequency, argnums=(0, 1))(self.omega, self.coef)

    def initialize_adjoint(self):
        self.topo.initialize_adjoint()

    def finalize_adjoint(self):
        self.topo.add_frequency_derivatives(self.omegab)
        for name in self.node_sets:
            self.topo.add_point_derivative(name, None, self.coefb[name])
        self.topo.finalize_adjoint()

    def get_min_frequency(self):
        return self.ks_min

    def test_ks_func(self, dh_fd=1e-6, pert=None):
        """FD verification driver (reference test_ks_func, :809-847)."""
        self.initialize(store=True)
        ks1 = self.get_min_frequency()
        x0 = jnp.asarray(self.topo.x)

        self.initialize_adjoint()
        self.finalize_adjoint()
        self.topo.add_check_adjoint_residual(b_ortho=True)

        if pert is None:
            pert = jnp.asarray(np.random.uniform(size=x0.shape))

        data = {"ans": float(pert @ self.topo.xb)}
        data.update({k: v for k, v in self.topo.profile.items()
                     if isinstance(v, (int, float, str))})

        self.topo.x = x0 + dh_fd * pert
        self.initialize()
        ks2 = self.get_min_frequency()
        self.topo.x = x0 - dh_fd * pert
        self.initialize()
        ks3 = self.get_min_frequency()
        self.topo.x = x0

        data["dh_fd"] = dh_fd
        data["fd"] = float((ks2 - ks3) / (2 * dh_fd))
        data["fd_err"] = abs((data["ans"] - data["fd"]) / data["fd"])
        print("%25s  %25s  %25s" % ("Answer", "FD", "FD Rel Error"))
        print("%25.15e  %25.15e  %25.15e" % (data["ans"], data["fd"],
                                             data["fd_err"]))
        return data


def make_model(nx=128, ny=64, Lx=1.0, Ly=1.0, rfact=4.0, N=10, Mx=3, My=3,
               ns=2, **kwargs):
    """Symmetric optimization model factory (reference make_model, :850-988)."""
    from ..fem.filter import NodeFilter
    from ..fem.model import make_grid, make_symmetric_dvmap_with_sets

    mesh = make_grid(nx, ny, Lx, Ly)
    r0 = rfact * (Ly / ny)
    dvmap, ndv, node_sets, element_sets = make_symmetric_dvmap_with_sets(
        mesh, Mx=Mx, My=My, ns=ns, rfact=rfact)

    # conv filter: exact spatial filter on the uniform grid with O(kernel)
    # constants (scales to 1M+ nodes); pass ftype="spatial" for the general
    # ELL gather path.
    ftype = kwargs.pop("ftype", "conv")
    fltr = NodeFilter(mesh.conn, mesh.X, r0=r0, dvmap=dvmap,
                      num_design_vars=ndv, ftype=ftype,
                      grid_shape=(nx, ny),
                      projection=kwargs.pop("projection", False),
                      beta=kwargs.pop("b0", 10.0))

    kwargs.setdefault("grid_shape", (nx, ny))
    kwargs.setdefault("uniform_grid", True)

    topo = TopologyAnalysis(fltr, mesh.conn, mesh.X, N=N,
                            node_sets=node_sets, element_sets=element_sets,
                            **kwargs)
    return topo
