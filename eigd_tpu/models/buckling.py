"""Linearized buckling topology analysis.

Rebuild of /root/reference/examples/buckling.py (:15-1471): Dirichlet BC
reduction, static preload solve K u = f, geometric/stress stiffness G(x, u),
buckling eigenproblem K phi + lam G phi = 0 (lam = buckling load factor,
solved in "buckling" mode with factor (K + sigma G)^{-1}), KS aggregates of
1/BLF, and eigenvector aggregates.

The reference's finalize_adjoint is the most complex in the repo
(:874-986): eigenvector adjoint -> dG/du chain -> path adjoint
K psi_u = -df/du -> dK/dx contraction -> filter chain. Here the whole chain
x -> rho -> (K, u, G) -> eigensolve is one differentiable function whose
eigh_gen parameter is the pytree (rhoE, u_r); the path adjoint through the
static solve falls out of AD of the Cholesky solve, and the dG/du bilinear
VJP replaces get_stress_stiffness_matrix_uderiv/_xderiv (:283-484).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular

from ..fem import assembly as fem
from ..fem.quad import stress_stiffness_tables
from ..ops.autodiff import EigProblem, EighGenConfig, eigh_gen
from ..ops.operators import DenseOperator


def _chol_solve(L, b):
    y = solve_triangular(L, b, lower=True)
    return solve_triangular(L, y, lower=True, trans=1)


class BucklingTopologyAnalysis:
    def __init__(self, fltr, conn, X, free_dofs, forces, E=1.0, nu=0.3,
                 ptype_K="simp", ptype_G="simp", rho0_K=1e-6, rho0_G=1e-9,
                 p=3.0, q=5.0, sigma=3.0, N=10, m=None,
                 solver_type="lanczos", tol=0.0, rtol=1e-10, eig_atol=1e-5,
                 adjoint_method="sibk", adjoint_options=None,
                 deriv_type="tensor", factor_kind="cholesky"):
        del solver_type, deriv_type
        self.fltr = fltr
        self.conn = jnp.asarray(np.asarray(conn))
        self.X = jnp.asarray(np.asarray(X))
        self.free = jnp.asarray(np.asarray(free_dofs))
        self.nelems = int(self.conn.shape[0])
        self.nnodes = int(np.asarray(conn).max()) + 1
        self.nvars = 2 * self.nnodes
        self.f = jnp.asarray(np.asarray(forces))
        self.N = N
        self.sigma = sigma
        self.eig_atol = eig_atol
        adjoint_options = adjoint_options or {}
        if m is None:
            m = max(3 * N + 1, 60)
        self.m = m

        self.E, self.nu = E, nu
        self.ptype_K = ptype_K.lower()
        self.ptype_G = ptype_G.lower()
        self.rho0_K, self.rho0_G = rho0_K, rho0_G
        self.p, self.q = p, q

        self.C0 = fem.plane_stress_C0(E, nu)
        self.dofs = fem.element_dof_map(self.conn)
        self.Be, self.Te, self.detJ = stress_stiffness_tables(self.X, self.conn)

        self.cfg = EighGenConfig(
            N=N, m=self.m, sigma=sigma, mode="buckling",
            adjoint_method=adjoint_method,
            adjoint_maxiter=adjoint_options.get("maxiter", 60),
            adjoint_rtol=rtol * 1e-2,
            nrestart=adjoint_options.get("nrestart", 2), eig_atol=eig_atol,
            factor_kind=factor_kind)
        self.problem = EigProblem(assemble=self._assemble_pencil)

        self.x = 0.5 * jnp.ones(self.fltr.num_design_vars)
        self.lam = None
        self.Q = None
        self.profile = {"nnodes": self.nnodes, "nelems": self.nelems,
                        "N": N, "sigma": sigma, "m": self.m}

    # -- differentiable pieces ---------------------------------------------

    def _stiffness_dense_reduced(self, rhoE):
        K = fem.stiffness_matrix(rhoE, self.Be, self.detJ, self.dofs,
                                 self.nvars, self.C0, ptype=self.ptype_K,
                                 p=self.p, q=self.q, rho0=self.rho0_K)
        Kd = K.to_dense()
        return Kd[jnp.ix_(self.free, self.free)]

    def _stress_stiffness_dense_reduced(self, rhoE, u_full):
        G = fem.stress_stiffness_matrix(rhoE, u_full, self.Be, self.Te,
                                        self.detJ, self.dofs, self.conn,
                                        self.nvars, self.C0,
                                        ptype=self.ptype_G, p=self.p,
                                        q=self.q, rho0=self.rho0_G)
        Gd = G.to_dense()
        return Gd[jnp.ix_(self.free, self.free)]

    def _assemble_pencil(self, theta):
        """eigh_gen parameter: theta = (rhoE, u_r). Returns (A, B) = (G, K)
        reduced operators for the buckling pencil."""
        rhoE, ur = theta
        u_full = jnp.zeros(self.nvars, dtype=ur.dtype).at[self.free].set(ur)
        Gr = self._stress_stiffness_dense_reduced(rhoE, u_full)
        Kr = self._stiffness_dense_reduced(rhoE)
        return DenseOperator(Gr), DenseOperator(Kr)

    def _solve_fn(self, x):
        rho = self.fltr.apply(x)
        rhoE = fem.element_density(rho, self.conn)
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
        # full-space eigenvectors
        self.Q = jnp.zeros((self.nvars, self.N)).at[self.free].set(self.Qr)
        self.profile["eigenvalue solve time"] = time.time() - t0
        if store:
            self.profile["eigenvalues"] = np.asarray(self.BLF).tolist()
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

    def get_eigenvector_aggregate(self, rho_agg, node, mode="tanh"):
        if mode == "exp":
            eta = jnp.exp(-rho_agg * (self.lam - jnp.min(self.lam)))
        else:
            a = jnp.tanh(rho_agg * (self.lam - 0.0))
            b = jnp.tanh(rho_agg * (self.lam - 50.0))
            eta = a - b
        eta = eta / jnp.sum(eta)
        return jnp.sum(eta * jnp.sum(self.Q[node, :] ** 2, axis=0))

    def add_eigenvector_aggregate_derivative(self, hb, rho_agg, node,
                                             mode="tanh"):
        free_np = np.asarray(self.free)
        lookup = -np.ones(self.nvars, dtype=np.int64)
        lookup[free_np] = np.arange(len(free_np))

        def f(lam, Qr):
            Q = jnp.zeros((self.nvars, self.N), dtype=Qr.dtype
                          ).at[self.free].set(Qr)
            if mode == "exp":
                eta = jnp.exp(-rho_agg * (lam - jnp.min(lam)))
            else:
                a = jnp.tanh(rho_agg * (lam - 0.0))
                b = jnp.tanh(rho_agg * (lam - 50.0))
                eta = a - b
            eta = eta / jnp.sum(eta)
            return jnp.sum(eta * jnp.sum(Q[node, :] ** 2, axis=0))

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

    fltr = NodeFilter(mesh.conn, mesh.X, r0=r0)
    topo = BucklingTopologyAnalysis(fltr, mesh.conn, mesh.X, free, forces,
                                    N=N, **kwargs)
    return topo
