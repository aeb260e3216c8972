"""Thermal topology analysis: modal heat conduction + transient reduced-order
model.

Rebuild of /root/reference/examples/thermal.py (ThermalTopologyAnalysis
:14-994, ThermalOpt :997-1725). Scalar field (1 DOF/node), pure-Neumann
conduction eigenproblem K(x) phi = lam M(x) phi whose mode 0 is the near-zero
constant mode (skipped by every objective, reference :428-442). The transient
reduced-order model integrates the modal ODE xi' + lam xi = q(t) with the
midpoint/Crank-Nicolson rule as a lax.scan; its discrete adjoint — which the
reference runs backwards in time by hand (:1292-1321) — is obtained by AD
through the scan.
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..fem import assembly as fem
from ..fem.quad import thermal_tables
from ..ops.autodiff import EigProblem, EighGenConfig, eigh_gen


class ThermalTopologyAnalysis:
    """Heat-conduction eigenproblem analysis (reference :14-994)."""

    def __init__(self, fltr, conn, X, node_sets=None, element_sets=None,
                 kappa=1.0, density=1.0, heat_capacity=1.0, rho0=1e-6, p=3,
                 beta=1e-6, sigma=-0.1, N=10, m=None, Ntarget=None,
                 solver_type="lanczos", tol=0.0, rtol=1e-10, eig_atol=1e-5,
                 adjoint_method="sibk", adjoint_options=None,
                 deriv_type="tensor", factor_kind="dense", grid_shape=None,
                 lanczos_tol=None, lanczos_block=1, lanczos_ortho="full",
                 factor_options=None, lanczos_polish=0):
        del solver_type, deriv_type
        self.fltr = fltr
        self.conn = jnp.asarray(np.asarray(conn))
        self.X = jnp.asarray(np.asarray(X))
        self.node_sets = node_sets or {}
        self.element_sets = element_sets or {}
        self.nelems = int(self.conn.shape[0])
        self.nnodes = int(np.asarray(conn).max()) + 1
        self.kappa = kappa
        self.density = density
        self.heat_capacity = heat_capacity
        self.rho0 = rho0
        self.p = p
        self.beta = beta
        self.sigma = sigma
        self.Ntarget = Ntarget
        self.eig_atol = eig_atol
        adjoint_options = adjoint_options or {}

        # Solve a few spare modes so the host-side Ntarget rule (pick N with
        # lam[N-1], lam[N] distinct, reference :1614-1634) can grow N without
        # recompiling the eigensolve.
        self.Nmax = (Ntarget if Ntarget is not None else N) + 4
        self.N = N if Ntarget is None else Ntarget
        if m is None:
            m = max(3 * self.Nmax + 1, 60)
        self.m = m

        self.Be, self.He, self.detJ = thermal_tables(self.X, self.conn)
        self.cfg = EighGenConfig(
            N=self.Nmax, m=self.m, sigma=sigma, mode="normal",
            adjoint_method=adjoint_method,
            adjoint_maxiter=adjoint_options.get("maxiter", 60),
            adjoint_rtol=rtol * 1e-2,
            nrestart=adjoint_options.get("nrestart", 2), eig_atol=eig_atol,
            lanczos_tol=lanczos_tol, block=lanczos_block,
            lanczos_ortho=lanczos_ortho,
            adjoint_mixed=adjoint_options.get("mixed", False),
            adjoint_ladder=adjoint_options.get("ladder", "approx"),
            polish=lanczos_polish)

        # Scalable path for structured grids: stencil matvecs (ndof=1) and a
        # block-cyclic-reduction Cholesky factor, exactly as in the
        # natural-frequency model but for the scalar heat problem.
        self.grid_shape = tuple(grid_shape) if grid_shape is not None else None
        factor_fn = None
        if factor_kind == "mg":
            # O(n)-memory multigrid-PCG factor (see natural_frequency.py);
            # scalar heat stencil, ndof=1.
            if self.grid_shape is None:
                raise ValueError("factor_kind='mg' needs grid_shape")

            mg_opts = dict(factor_options or {})

            def factor_fn(A, B, sig, mode):
                from ..ops.multigrid import GridMGFactor

                Wst = A.W - sig * B.W
                return GridMGFactor.build(Wst, self.grid_shape, 1,
                                          **mg_opts)

        elif factor_kind in ("blocktridiag", "blocktridiag_f32", "bcr",
                             "bcr_f32"):
            if self.grid_shape is None:
                raise ValueError(f"factor_kind={factor_kind!r} needs grid_shape")
            gnx, gny = self.grid_shape
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
                                                 ndof=1)
                    return cls_.from_blocks(D, Esub)
                # build the blocks directly in f32: the f64 D/E transients
                # are the peak-memory term at 1M DOF (~11 GB)
                D, Esub = grid_block_tridiag(shifted.astype(jnp.float32),
                                             gnx, gny, ndof=1)
                inner = cls_.from_blocks(D, Esub)
                Wst = stencil_from_elements(shifted, gnx, gny, 1)
                op = GridStencilOperator(shifted, A.dofs, A.n, Wst,
                                         (gnx, gny), 1)
                return RefinedFactor(inner, op)

        self.problem = EigProblem(assemble=self._assemble, factor=factor_fn)

        self.x = 0.95 * jnp.ones(self.fltr.num_design_vars)
        self.Q = None
        self.lam = None
        self._init_mean_coefficients()
        self.profile = {"nnodes": self.nnodes, "nelems": self.nelems,
                        "N": self.N, "kappa": kappa, "sigma": sigma,
                        "m": self.m, "eig_atol": eig_atol}

    # -- differentiable core ------------------------------------------------

    def _assemble(self, rhoE):
        K = fem.thermal_stiffness_matrix(rhoE, self.Be, self.detJ, self.conn,
                                         self.nnodes, kappa=self.kappa,
                                         beta=self.beta, p=self.p)
        M = fem.thermal_mass_matrix(rhoE, self.He, self.detJ, self.conn,
                                    self.nnodes, density=self.density,
                                    heat_capacity=self.heat_capacity,
                                    beta=self.beta)
        if self.grid_shape is not None:
            from ..ops.stencil import GridStencilOperator

            K = GridStencilOperator.from_element_operator(
                K, self.grid_shape, ndof=1)
            M = GridStencilOperator.from_element_operator(
                M, self.grid_shape, ndof=1)
        return K, M

    def _solve_fn(self, x):
        rho = self.fltr.apply(x)
        rhoE = fem.element_density(rho, self.conn)
        lam, Q = eigh_gen(rhoE, self.problem, self.cfg)
        return lam, Q

    # -- three-phase protocol ----------------------------------------------

    def initialize(self, store=False):
        t0 = time.time()
        (lam, Q), self._vjp = jax.vjp(self._solve_fn, self.x)
        self.lam, self.Q = lam, Q
        # Ntarget adaptation (host side): grow N past numerically repeated
        # boundaries (reference :1614-1634).
        if self.Ntarget is not None:
            lam_np = np.asarray(lam)
            N = self.Ntarget
            while N < self.Nmax - 1 and abs(
                    lam_np[N - 1] - lam_np[N]) < self.eig_atol:
                N += 1
            self.N = N
        self.profile["eigenvalue solve time"] = time.time() - t0
        if store:
            self.profile["eigenvalues"] = np.asarray(lam).tolist()
        return

    def initialize_adjoint(self):
        self.xb = jnp.zeros_like(self.x)
        self.lamb = jnp.zeros_like(self.lam)
        self.Qb = jnp.zeros_like(self.Q)
        return

    def finalize_adjoint(self):
        t0 = time.time()
        (xb,) = self._vjp((self.lamb, self.Qb))
        self.xb = self.xb + xb
        self.profile["adjoint solution time"] = time.time() - t0
        return

    # -- mean-temperature coefficient vectors (reference :402-426) ----------

    def _init_mean_coefficients(self):
        self.mean_vecs = {}
        conn_np = np.asarray(self.conn)
        detJ = np.asarray(self.detJ)  # (nq, nelems)
        for name, elems in self.element_sets.items():
            v = np.zeros(self.nnodes)
            for e in np.asarray(elems):
                for q in range(4):
                    v[conn_np[e]] += detJ[q, e]
            v = v / v.sum()
            self.mean_vecs[name] = jnp.asarray(v)

    def get_mean_coefficients(self):
        return {name: self.Q.T @ v for name, v in self.mean_vecs.items()}

    def add_mean_derivatives(self, coefb):
        for name, v in self.mean_vecs.items():
            self.Qb = self.Qb + jnp.outer(v, coefb[name])
        return

    # -- objective functions (mode 0 skipped, reference :428-545) ------------

    def _mode_mask(self):
        mask = np.zeros(self.Nmax)
        mask[1:self.N] = 1.0
        return jnp.asarray(mask)

    def get_thermal_compliance(self, vec):
        mask = self._mode_mask()
        vals = self.Q.T @ vec
        return jnp.sum(mask * vals**2 / self.lam)

    def add_thermal_compliance_derivative(self, compb, vec):
        mask = self._mode_mask()
        vals = self.Q.T @ vec
        self.Qb = self.Qb + compb * 2.0 * mask[None, :] * jnp.outer(
            vec, vals / self.lam)
        self.lamb = self.lamb - compb * mask * vals**2 / self.lam**2
        return

    def _tanh_weights(self, rho_agg, lam_a=0.0, lam_b=50.0):
        mask = self._mode_mask()
        a = jnp.tanh(rho_agg * (self.lam - lam_a))
        b = jnp.tanh(rho_agg * (self.lam - lam_b))
        eta = mask * (a - b)
        return eta / jnp.sum(eta), a, b, mask

    def get_eigenvector_aggregate(self, rho_agg, node):
        eta, _, _, _ = self._tanh_weights(rho_agg)
        return jnp.sum(eta * jnp.sum(self.Q[node, :] ** 2, axis=0))

    def add_eigenvector_aggregate_derivative(self, hb, rho_agg, node):
        def f(lam, Q):
            mask = self._mode_mask()
            a = jnp.tanh(rho_agg * (lam - 0.0))
            b = jnp.tanh(rho_agg * (lam - 50.0))
            eta = mask * (a - b)
            eta = eta / jnp.sum(eta)
            return jnp.sum(eta * jnp.sum(Q[node, :] ** 2, axis=0))
        glam, gQ = jax.grad(f, argnums=(0, 1))(self.lam, self.Q)
        self.lamb = self.lamb + hb * glam
        self.Qb = self.Qb + hb * gQ
        return

    def KSmax(self, q, ks_rho):
        c = jnp.max(q)
        return c + jnp.log(jnp.sum(jnp.exp(ks_rho * (q - c)))) / ks_rho

    def get_eigenvector_aggregate_max(self, rho_agg, node):
        eta, _, _, _ = self._tanh_weights(rho_agg, lam_b=1000.0)
        h = jnp.sum(eta[None, :] * self.Q[node, :] ** 2, axis=1)
        return self.KSmax(h, rho_agg)

    def add_eigenvector_aggregate_max_derivative(self, hb, rho_agg, node):
        def f(lam, Q):
            mask = self._mode_mask()
            a = jnp.tanh(rho_agg * (lam - 0.0))
            b = jnp.tanh(rho_agg * (lam - 1000.0))
            eta = mask * (a - b)
            eta = eta / jnp.sum(eta)
            h = jnp.sum(eta[None, :] * Q[node, :] ** 2, axis=1)
            c = jnp.max(h)
            return c + jnp.log(jnp.sum(jnp.exp(rho_agg * (h - c)))) / rho_agg
        glam, gQ = jax.grad(f, argnums=(0, 1))(self.lam, self.Q)
        self.lamb = self.lamb + hb * glam
        self.Qb = self.Qb + hb * gQ
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


class ThermalOpt:
    """Transient reduced-order thermal problem (reference ThermalOpt,
    :997-1725): project the heat loads onto the modes, integrate the diagonal
    modal ODE with Crank-Nicolson, and take KS maxima of set-averaged
    temperatures over time. The reverse sweep is AD through the scan."""

    def __init__(self, topo: ThermalTopologyAnalysis,
                 heat_func: Dict[str, Dict[str, Callable]],
                 compliance_func=None, nsteps=100, tfinal=1.0):
        self.topo = topo
        self.heat_func = heat_func
        self.cases = sorted(heat_func)
        self.nsteps = nsteps
        self.tfinal = tfinal
        self.t = jnp.linspace(0.0, tfinal, nsteps + 1)
        self.dt = tfinal / nsteps

        self.vec = jnp.ones(topo.nnodes)
        if compliance_func is not None:
            for key, val in compliance_func.items():
                if key in topo.mean_vecs:
                    self.vec = self.vec + val[0] * topo.mean_vecs[key]

    # -- differentiable transient core -------------------------------------

    def _solve_forward(self, case_name, lam, coef):
        """Integrate xi' + lam xi = q(t) (midpoint rule, reference
        :1260-1290). Returns xi (N, nsteps+1)."""
        beta = 1.0 / self.dt
        J = beta + 0.5 * lam
        tmid = 0.5 * (self.t[1:] + self.t[:-1])

        # load coefficient vector at each midpoint: q_k = sum_set coef_set *
        # heat(t)
        q = jnp.zeros((self.nsteps, lam.shape[0]))
        for name, func in self.heat_func[case_name].items():
            if name in coef:
                vals = jax.vmap(func)(tmid)
                q = q + vals[:, None] * coef[name][None, :]

        def step(xi_prev, qk):
            # Crank-Nicolson: (beta + lam/2) xi_k = (beta - lam/2) xi_{k-1} + q
            xi_k = ((beta - 0.5 * lam) * xi_prev + qk) / J
            return xi_k, xi_k

        _, xi_hist = jax.lax.scan(step, jnp.zeros_like(lam), q)
        xi = jnp.concatenate([jnp.zeros((1, lam.shape[0])), xi_hist], axis=0)
        return xi.T  # (N, nsteps+1)

    def _eval_ks_function(self, rho_ks, xi, coef):
        """KS max of set-averaged temperatures over time x sets (:1102-1121).
        Only modes 1..N contribute (mode-0 masking is inherited from coef
        usage in the reference; here all coef entries participate exactly as
        in the reference since coef includes mode 0)."""
        Ts = []
        for name in sorted(coef):
            T = coef[name] @ xi[:, 1:self.nsteps]  # (nsteps-1,)
            Ts.append(T)
        T = jnp.concatenate(Ts)
        Tmax = jnp.max(T)
        return Tmax + jnp.log(jnp.sum(jnp.exp(rho_ks * (T - Tmax)))) / rho_ks

    def _ks_from_eig(self, lam, Q, rho_ks):
        coef = {name: Q.T @ v for name, v in self.topo.mean_vecs.items()}
        ks = {}
        for case in self.cases:
            xi = self._solve_forward(case, lam, coef)
            ks[case] = self._eval_ks_function(rho_ks, xi, coef)
        return ks

    # -- reference API surface ----------------------------------------------

    def initialize(self, store=False):
        self.topo.initialize(store)
        self.lam = self.topo.lam
        self.coef = self.topo.get_mean_coefficients()
        self.xi = {c: self._solve_forward(c, self.lam, self.coef)
                   for c in self.cases}

    def initialize_adjoint(self):
        self.topo.initialize_adjoint()

    def eval_ks_functions(self, rho_ks):
        return {c: self._eval_ks_function(rho_ks, self.xi[c], self.coef)
                for c in self.cases}

    def add_ks_derivative(self, rho_ks, ksb):
        """Accumulate (lamb, Qb) seeds for sum_case ksb[case]*KS_case via AD
        through the transient scan (replaces the reference's hand reverse
        time sweep, :1292-1321)."""
        def total(lam, Q):
            ks = self._ks_from_eig(lam, Q, rho_ks)
            return sum(ksb[c] * ks[c] for c in self.cases)
        glam, gQ = jax.grad(total, argnums=(0, 1))(self.topo.lam, self.topo.Q)
        self.topo.lamb = self.topo.lamb + glam
        self.topo.Qb = self.topo.Qb + gQ
        return

    def finalize_adjoint(self):
        self.topo.finalize_adjoint()

    def get_thermal_compliance(self):
        return self.topo.get_thermal_compliance(self.vec)

    def add_thermal_compliance_derivative(self, scale=1.0):
        return self.topo.add_thermal_compliance_derivative(scale, self.vec)

    def test_ks_func(self, rho_ks=10.0, dh_fd=1e-6, ksb=None, pert=None):
        """FD verification driver (reference :1143-1233; jax.jvp plays the
        complex-step role)."""
        self.initialize(store=True)
        ks = self.eval_ks_functions(rho_ks)
        x0 = jnp.asarray(self.topo.x)

        if ksb is None:
            rng = np.random.default_rng(0)
            ksb = {c: float(rng.uniform()) for c in self.cases}

        self.initialize_adjoint()
        self.add_ks_derivative(rho_ks, ksb)
        self.finalize_adjoint()

        if pert is None:
            pert = jnp.asarray(np.random.uniform(size=x0.shape))

        data = {"ans": float(pert @ self.topo.xb)}

        def total_at(x):
            self.topo.x = x
            self.initialize()
            ks_v = self.eval_ks_functions(rho_ks)
            return sum(ksb[c] * float(ks_v[c]) for c in self.cases)

        f_p = total_at(x0 + dh_fd * pert)
        f_m = total_at(x0 - dh_fd * pert)
        self.topo.x = x0
        data["cd"] = (f_p - f_m) / (2 * dh_fd)
        data["cd_err"] = abs((data["ans"] - data["cd"]) / data["cd"])
        print("%25s  %25s  %25s" % ("Answer", "CD", "CD Rel Error"))
        print("%25.15e  %25.15e  %25.15e" % (data["ans"], data["cd"],
                                             data["cd_err"]))
        return data


def make_model(nx=32, ny=32, Lx=1.0, Ly=1.0, rfact=4.0, **kwargs):
    """Thermal model factory (reference make_model, thermal.py:1475-1510)."""
    from ..fem.filter import NodeFilter
    from ..fem.model import make_grid

    mesh = make_grid(nx, ny, Lx, Ly)
    r0 = rfact * (Ly / ny)

    eset = []
    for j in range(ny // 2, 3 * ny // 4):
        for i in range(nx // 2, 3 * nx // 4):
            eset.append(i + nx * j)
    element_sets = {"center": np.array(eset, dtype=np.int32)}

    kwargs.setdefault("grid_shape", (nx, ny))
    fltr = NodeFilter(mesh.conn, mesh.X, r0=r0)
    topo = ThermalTopologyAnalysis(fltr, mesh.conn, mesh.X,
                                   element_sets=element_sets, **kwargs)
    return topo


def make_opt_model(nx=64, Lx=1.0, rfact=4.0, epsilon=0.0, element_sets=None,
                   **kwargs):
    """Square-domain model with 8-fold symmetric dvmap and an epsilon domain
    asymmetry used by the repeated-eigenvalue sweep (reference
    :1512-1616)."""
    from ..fem.filter import NodeFilter
    from ..fem.model import make_grid

    mesh = make_grid(nx, nx, Lx, Lx + epsilon)
    r0 = rfact * (Lx / nx)

    if element_sets is None:
        element_sets = {}
    if "center" in element_sets:
        es = list(element_sets["center"])
        for j in range(2 * nx // 5, 3 * nx // 5):
            for i in range(2 * nx // 5, 3 * nx // 5):
                es.append(i + nx * j)
        element_sets["center"] = np.array(es, dtype=np.int32)
    for k in range(4):
        key = f"corner{k}"
        if key in element_sets:
            es = list(element_sets[key])
            istart = (3 * nx // 5) * (k % 2)
            jstart = (3 * nx // 5) * (k // 2)
            for j in range(jstart, jstart + 2 * nx // 5):
                for i in range(istart, istart + 2 * nx // 5):
                    es.append(i + nx * j)
            element_sets[key] = np.array(es, dtype=np.int32)

    # 8-fold symmetric design-variable map (reference :1576-1599)
    dvmap = -np.ones((nx + 1, nx + 1), dtype=np.int64)
    index = 0
    for i in range(nx // 2, nx + 1):
        for j in range(nx // 2, i + 1):
            dvmap[i, j] = index
            dvmap[j, i] = index
            dvmap[nx - i, j] = index
            dvmap[j, nx - i] = index
            dvmap[i, nx - j] = index
            dvmap[nx - j, i] = index
            dvmap[nx - i, nx - j] = index
            dvmap[nx - j, nx - i] = index
            index += 1

    fltr = NodeFilter(mesh.conn, mesh.X, r0=r0, dvmap=dvmap.reshape(-1),
                      num_design_vars=index,
                      projection=kwargs.pop("projection", False),
                      beta=kwargs.pop("b0", 10.0))
    topo = ThermalTopologyAnalysis(fltr, mesh.conn, mesh.X,
                                   element_sets=element_sets, **kwargs)
    return topo
