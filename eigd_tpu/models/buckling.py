"""Linearized buckling topology analysis.

Rebuild of /root/reference/examples/buckling.py (:15-1471): Dirichlet BC
reduction, static preload solve K u = f, geometric/stress stiffness G(x, u),
buckling eigenproblem K phi + lam G phi = 0 (lam = buckling load factor,
solved in "buckling" mode with factor (K + sigma G)^{-1}), KS aggregates of
1/BLF, eigenvector aggregates, and the KS-of-KS aggregate-max objective
(:762-819).

The reference's finalize_adjoint is the most complex in the repo
(:874-986): eigenvector adjoint -> dG/du chain -> path adjoint
K psi_u = -df/du -> dK/dx contraction -> filter chain. Here the whole chain
x -> rho -> (K, u, G) -> eigensolve is one differentiable function whose
eigh_gen parameter is the pytree (rhoE, u); the path adjoint through the
static solve is the custom-VJP ``solve_spd``, and the dG/du bilinear VJP
replaces get_stress_stiffness_matrix_uderiv/_xderiv (:283-484).

Two factorization paths:

* dense (factor_kind "cholesky"/"eigh"): matrices reduced to the free DOFs
  with an index gather (reference reduce_matrix, :499-528) — small problems
  and the test oracle.
* scalable (factor_kind "bcr_f32"/"blocktridiag"/...): full-space operators
  with Dirichlet DOFs *masked* (zeroed rows/columns + unit diagonal), so
  matvecs are gather-free grid stencils and the shift factor is the
  block-cyclic-reduction Cholesky — no densification anywhere. The masked
  fixed subspace is invariant under every solver map (factor keeps it at
  the identity, G keeps it at zero), so with a start vector zeroed on the
  fixed DOFs the Krylov iteration never leaves the free subspace.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular

from ..fem import assembly as fem
from ..fem.quad import stress_stiffness_tables
from ..ops.autodiff import EigProblem, EighGenConfig, eigh_gen, solve_spd
from ..ops.operators import DenseOperator


def _chol_solve(L, b):
    y = solve_triangular(L, b, lower=True)
    return solve_triangular(L, y, lower=True, trans=1)


_SCALABLE_KINDS = ("bcr_f32", "bcr", "blocktridiag", "blocktridiag_f32")


class BucklingTopologyAnalysis:
    def __init__(self, fltr, conn, X, free_dofs, forces, E=1.0, nu=0.3,
                 ptype_K="simp", ptype_G="simp", rho0_K=1e-6, rho0_G=1e-9,
                 p=3.0, q=5.0, sigma=3.0, N=10, m=None, Ntarget=None,
                 solver_type="lanczos", tol=0.0, rtol=1e-10, eig_atol=1e-5,
                 adjoint_method="sibk", adjoint_options=None,
                 deriv_type="tensor", factor_kind="cholesky",
                 grid_shape=None, lanczos_tol=None, lanczos_polish=0):
        del solver_type, deriv_type
        self.fltr = fltr
        self.conn = jnp.asarray(np.asarray(conn))
        self.X = jnp.asarray(np.asarray(X))
        self.free = jnp.asarray(np.asarray(free_dofs))
        self.nelems = int(self.conn.shape[0])
        self.nnodes = int(np.asarray(conn).max()) + 1
        self.nvars = 2 * self.nnodes
        self.f = jnp.asarray(np.asarray(forces))
        if Ntarget is not None:
            N = max(N, Ntarget + 1)  # one extra mode to detect clustering
        self.N = N
        self.Ntarget = Ntarget
        self.sigma = sigma
        self.eig_atol = eig_atol
        self._adjoint_options = adjoint_options = adjoint_options or {}
        if m is None:
            m = max(3 * max(N, Ntarget or 0) + 1, 60)
        self.m = m
        self._rtol = rtol
        self._lanczos_tol = lanczos_tol
        self._lanczos_polish = lanczos_polish
        self._adjoint_method = adjoint_method

        self.E, self.nu = E, nu
        self.ptype_K = ptype_K.lower()
        self.ptype_G = ptype_G.lower()
        self.rho0_K, self.rho0_G = rho0_K, rho0_G
        self.p, self.q = p, q

        self.C0 = fem.plane_stress_C0(E, nu)
        self.dofs = fem.element_dof_map(self.conn)
        self.Be, self.Te, self.detJ = stress_stiffness_tables(self.X, self.conn)

        self.factor_kind = factor_kind
        self.scalable = factor_kind in _SCALABLE_KINDS
        self.grid_shape = tuple(grid_shape) if grid_shape is not None else None
        if self.scalable and self.grid_shape is None:
            raise ValueError(f"factor_kind={factor_kind!r} needs grid_shape")

        free_mask = np.zeros(self.nvars)
        free_mask[np.asarray(free_dofs)] = 1.0
        self.free_mask = jnp.asarray(free_mask)
        self.fixed_mask = jnp.asarray(1.0 - free_mask)

        self._build_cfg()

        self.x = 0.5 * jnp.ones(self.fltr.num_design_vars)
        self.lam = None
        self.Q = None
        self.profile = {"nnodes": self.nnodes, "nelems": self.nelems,
                        "N": N, "sigma": sigma, "m": self.m,
                        "factor_kind": factor_kind}

    def _build_cfg(self):
        self.cfg = EighGenConfig(
            N=self.N, m=self.m, sigma=self.sigma, mode="buckling",
            adjoint_method=self._adjoint_method,
            adjoint_maxiter=self._adjoint_options.get("maxiter", 60),
            adjoint_rtol=self._rtol * 1e-2,
            nrestart=self._adjoint_options.get("nrestart", 2),
            eig_atol=self.eig_atol,
            factor_kind=(self.factor_kind if not self.scalable
                         else "cholesky"),
            lanczos_tol=self._lanczos_tol, polish=self._lanczos_polish)
        if self.scalable:
            self.problem = EigProblem(assemble=self._assemble_pencil,
                                      factor=self._pencil_factor,
                                      v0=self._v0)
        else:
            self.problem = EigProblem(assemble=self._assemble_pencil)

    # -- differentiable pieces ---------------------------------------------

    def _mask_mats(self, mats):
        me = self.free_mask[self.dofs]  # (nelems, 8)
        return mats * me[:, :, None] * me[:, None, :]

    def _K_mats(self, rhoE):
        K = fem.stiffness_matrix(rhoE, self.Be, self.detJ, self.dofs,
                                 self.nvars, self.C0, ptype=self.ptype_K,
                                 p=self.p, q=self.q, rho0=self.rho0_K)
        return K

    def _G_mats(self, rhoE, u_full):
        return fem.stress_stiffness_matrix(
            rhoE, u_full, self.Be, self.Te, self.detJ, self.dofs, self.conn,
            self.nvars, self.C0, ptype=self.ptype_G, p=self.p, q=self.q,
            rho0=self.rho0_G)

    # dense-reduced path -----------------------------------------------------

    def _stiffness_dense_reduced(self, rhoE):
        Kd = self._K_mats(rhoE).to_dense()
        return Kd[jnp.ix_(self.free, self.free)]

    def _stress_stiffness_dense_reduced(self, rhoE, u_full):
        Gd = self._G_mats(rhoE, u_full).to_dense()
        return Gd[jnp.ix_(self.free, self.free)]

    # scalable masked path ---------------------------------------------------

    def _op_K(self, rhoE):
        """Masked full-space stiffness as a grid stencil operator with unit
        diagonal on the fixed DOFs."""
        from ..ops.operators import ElementOperator
        from ..ops.stencil import GridStencilOperator

        K = self._K_mats(rhoE)
        Km = self._mask_mats(K.mats)
        return GridStencilOperator.from_element_operator(
            ElementOperator(Km, self.dofs, self.nvars), self.grid_shape,
            ndof=2, extra_diag=self.fixed_mask)

    def _op_G(self, rhoE, u_full):
        from ..ops.operators import ElementOperator
        from ..ops.stencil import GridStencilOperator

        G = self._G_mats(rhoE, u_full * self.free_mask)
        Gm = self._mask_mats(G.mats)
        return GridStencilOperator.from_element_operator(
            ElementOperator(Gm, self.dofs, self.nvars), self.grid_shape,
            ndof=2)

    def _structured_factor(self, mats, extra_diag):
        """BCR / block-tridiag factor of masked element matrices plus a
        diagonal (per-line identity on fixed DOFs)."""
        from ..ops.blockfactor import (BCRFactor, BlockTridiagFactor,
                                       RefinedFactor, grid_block_tridiag)
        from ..ops.operators import ElementOperator
        from ..ops.stencil import GridStencilOperator

        gnx, gny = self.grid_shape
        b = 2 * (gny + 1)
        D, E = grid_block_tridiag(mats, gnx, gny, ndof=2)
        D = D + jax.vmap(jnp.diag)(extra_diag.reshape(gnx + 1, b))
        use_f32 = self.factor_kind.endswith("_f32")
        cls_ = (BCRFactor if self.factor_kind.startswith("bcr")
                else BlockTridiagFactor)
        if not use_f32:
            return cls_.from_blocks(D, E)
        inner = cls_.from_blocks(D.astype(jnp.float32),
                                 E.astype(jnp.float32))
        op = GridStencilOperator.from_element_operator(
            ElementOperator(mats, self.dofs, self.nvars), self.grid_shape,
            ndof=2, extra_diag=extra_diag)
        return RefinedFactor(inner, op)

    def _K_factor(self, rhoE):
        Km = self._mask_mats(self._K_mats(rhoE).mats)
        return self._structured_factor(Km, self.fixed_mask)

    def _pencil_factor(self, A, B, sig, mode):
        """(K + sigma*G)^{-1} for the buckling pencil (A=G, B=K-hat)."""
        assert mode == "buckling"
        mats = B.mats + sig * A.mats  # both already masked
        return self._structured_factor(mats, B.extra_diag)

    def _v0(self, theta):
        key = jax.random.PRNGKey(12345)
        v = jax.random.uniform(key, (self.nvars,), dtype=jnp.float64,
                               minval=-1.0, maxval=1.0)
        return v * self.free_mask

    # -------------------------------------------------------------------

    def _assemble_pencil(self, theta):
        """eigh_gen parameter: theta = (rhoE, u). Returns (A, B) = (G, K)
        operators for the buckling pencil (reduced dense or masked full)."""
        rhoE, u = theta
        if self.scalable:
            return self._op_G(rhoE, u), self._op_K(rhoE)
        u_full = jnp.zeros(self.nvars, dtype=u.dtype).at[self.free].set(u)
        Gr = self._stress_stiffness_dense_reduced(rhoE, u_full)
        Kr = self._stiffness_dense_reduced(rhoE)
        return DenseOperator(Gr), DenseOperator(Kr)

    def _solve_fn(self, x):
        rho = self.fltr.apply(x)
        rhoE = fem.element_density(rho, self.conn)
        if self.scalable:
            fm = self.f * self.free_mask
            u = solve_spd(rhoE, fm, self._op_K, self._K_factor)
            lam, Q = eigh_gen((rhoE, u), self.problem, self.cfg)
            compliance = fm @ u
            return lam, Q, compliance
        Kr = self._stiffness_dense_reduced(rhoE)
        L = jnp.linalg.cholesky(Kr)
        fr = self.f[self.free]
        ur = _chol_solve(L, fr)
        lam, Qr = eigh_gen((rhoE, ur), self.problem, self.cfg)
        compliance = fr @ ur
        return lam, Qr, compliance

    # -- three-phase protocol ----------------------------------------------

    def initialize(self, store=False):
        t0 = time.time()
        (self.lam, self.Qr, self.compliance_val), self._vjp = jax.vjp(
            self._solve_fn, self.x)
        self.BLF = self.lam
        if self.scalable:
            self.Q = self.Qr
        else:
            self.Q = jnp.zeros((self.nvars, self.N)).at[self.free].set(
                self.Qr)
        self.profile["eigenvalue solve time"] = time.time() - t0
        if store:
            self.profile["eigenvalues"] = np.asarray(self.BLF).tolist()

        # Ntarget: pick N >= Ntarget such that BLF[N-1] and BLF[N] are
        # distinct (the reference's Ntarget logic, thermal.py:308-321,
        # applied to buckling). Changing N changes static shapes, so a
        # grown N re-solves with a rebuilt config.
        if self.Ntarget is not None:
            lam_np = np.asarray(self.lam)
            N = self.Ntarget
            while (N < len(lam_np)
                   and abs(lam_np[N - 1] - lam_np[N]) < self.eig_atol):
                N += 1
            if N >= len(lam_np) and self.N < self.m - 1:
                # cluster may extend past the solved window: widen and redo
                self.N = min(self.N + 2, self.m - 1)
                self._build_cfg()
                return self.initialize(store=store)
            if N != self.N:
                self.N = N
                self._build_cfg()
                return self.initialize(store=store)
        return

    def initialize_adjoint(self):
        self.xb = jnp.zeros_like(self.x)
        self.lamb = jnp.zeros_like(self.lam)
        self.Qrb = jnp.zeros_like(self.Qr)
        self.complianceb = jnp.zeros(())
        return

    def finalize_adjoint(self):
        t0 = time.time()
        (xb,) = self._vjp((self.lamb, self.Qrb, self.complianceb))
        self.xb = self.xb + xb
        self.profile["adjoint solution time"] = time.time() - t0
        return

    # -- functions (reference :634-819) -------------------------------------

    def compliance(self):
        return self.compliance_val

    def compliance_derivative(self):
        def c(x):
            _, _, comp = self._solve_fn(x)
            return comp
        return jax.grad(c)(self.x)

    def eval_ks_buckling(self, ks_rho=160.0):
        mu = 1.0 / self.BLF
        c = jnp.max(mu)
        return c + jnp.log(jnp.sum(jnp.exp(ks_rho * (mu - c)))) / ks_rho

    def add_ks_buckling_derivative(self, ksb, ks_rho=160.0):
        def ks(lam):
            mu = 1.0 / lam
            c = jnp.max(mu)
            return c + jnp.log(jnp.sum(jnp.exp(ks_rho * (mu - c)))) / ks_rho
        self.lamb = self.lamb + ksb * jax.grad(ks)(self.lam)
        return

    def eval_ks_buckling_derivative(self, ks_rho=160.0):
        """Direct total derivative of the KS buckling aggregate (reference
        eval_ks_buckling_derivative, :650-700) — full chain via AD."""
        self.initialize_adjoint()
        self.add_ks_buckling_derivative(1.0, ks_rho)
        self.finalize_adjoint()
        return self.xb

    # eigenvector aggregates -------------------------------------------------

    def _full_Q(self, Qr):
        if self.scalable:
            return Qr
        return jnp.zeros((self.nvars, self.N), dtype=Qr.dtype).at[
            self.free].set(Qr)

    def _eta(self, lam, rho_agg, mode, lam_b=50.0):
        if mode == "exp":
            eta = jnp.exp(-rho_agg * (lam - jnp.min(lam)))
        else:
            a = jnp.tanh(rho_agg * (lam - 0.0))
            b = jnp.tanh(rho_agg * (lam - lam_b))
            eta = a - b
        return eta / jnp.sum(eta)

    def get_eigenvector_aggregate(self, rho_agg, node, mode="tanh"):
        eta = self._eta(self.lam, rho_agg, mode)
        return jnp.sum(eta * jnp.sum(self.Q[node, :] ** 2, axis=0))

    def add_eigenvector_aggregate_derivative(self, hb, rho_agg, node,
                                             mode="tanh"):
        def f(lam, Qr):
            Q = self._full_Q(Qr)
            eta = self._eta(lam, rho_agg, mode)
            return jnp.sum(eta * jnp.sum(Q[node, :] ** 2, axis=0))

        glam, gQr = jax.grad(f, argnums=(0, 1))(self.lam, self.Qr)
        self.lamb = self.lamb + hb * glam
        self.Qrb = self.Qrb + hb * gQr
        return

    def get_eigenvector_aggregate_max(self, rho_agg, node):
        """KS-of-KS aggregate-max over a node set (reference buckling.py:
        762-819): per-DOF magnitude h = sum_i eta_i Q[node, i]^2, then
        KS-max over the set with the same rho."""
        def f(lam, Qr):
            Q = self._full_Q(Qr)
            eta = self._eta(lam, rho_agg, "tanh", lam_b=1000.0)
            h = jnp.sum(eta[None, :] * Q[node, :] ** 2, axis=1)
            c = jnp.max(h)
            return c + jnp.log(jnp.sum(jnp.exp(rho_agg * (h - c)))) / rho_agg

        return f(self.lam, self.Qr)

    def add_eigenvector_aggregate_max_derivative(self, hb, rho_agg, node):
        def f(lam, Qr):
            Q = self._full_Q(Qr)
            eta = self._eta(lam, rho_agg, "tanh", lam_b=1000.0)
            h = jnp.sum(eta[None, :] * Q[node, :] ** 2, axis=1)
            c = jnp.max(h)
            return c + jnp.log(jnp.sum(jnp.exp(rho_agg * (h - c)))) / rho_agg

        glam, gQr = jax.grad(f, argnums=(0, 1))(self.lam, self.Qr)
        self.lamb = self.lamb + hb * glam
        self.Qrb = self.Qrb + hb * gQr
        return

    def eval_area(self):
        rho = self.fltr.apply(self.x)
        rhoE = fem.element_density(rho, self.conn)
        return jnp.sum(self.detJ * rhoE[None, :])

    def eval_area_gradient(self):
        def area(x):
            rho = self.fltr.apply(x)
            rhoE = fem.element_density(rho, self.conn)
            return jnp.sum(self.detJ * rhoE[None, :])
        return jax.grad(area)(self.x)


def make_buckling_model(nx=32, ny=16, Lx=2.0, Ly=1.0, rfact=2.0, N=6,
                        load_frac=0.2, **kwargs):
    """Compressed-column domain (reference buckling.py:1300-1409 analog):
    clamped at the left edge, compressive load applied on a centered strip of
    the right edge."""
    from ..fem.filter import NodeFilter
    from ..fem.model import cantilever_bcs, make_grid

    mesh = make_grid(nx, ny, Lx, Ly)
    r0 = rfact * (Ly / ny)
    free = cantilever_bcs(mesh, side="left")

    # compressive unit load in -x on the middle strip of the right edge
    forces = np.zeros(2 * mesh.nnodes)
    jmid = range(int(ny * (0.5 - load_frac / 2)), int(ny * (0.5 + load_frac / 2)) + 1)
    nodes = [mesh.nodes[-1, j] for j in jmid]
    for nd in nodes:
        forces[2 * nd] = -1.0 / len(nodes)

    if str(kwargs.get("factor_kind", "")) in _SCALABLE_KINDS:
        kwargs.setdefault("grid_shape", (nx, ny))
    fltr = NodeFilter(mesh.conn, mesh.X, r0=r0)
    topo = BucklingTopologyAnalysis(fltr, mesh.conn, mesh.X, free, forces,
                                    N=N, **kwargs)
    return topo
