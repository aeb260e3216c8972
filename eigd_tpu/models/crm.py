"""Wingbox modal analysis with per-component shell thickness design variables.

TPU-native stand-in for the reference's CRM example
(/root/reference/examples/crm.py): where the reference builds the CRM wingbox
from a NASTRAN BDF through pyTACS (C++/MPI) and bridges matrices into SciPy
(crm.py:62-144), this model meshes a parametric swept/tapered wingbox (skins,
spars, ribs) out of flat-shell quads, assembles K(t), M(t) as differentiable
batched einsums, and runs the same modal-analysis + modal-compliance +
adjoint-total-derivative pipeline (crm.py:212-376) fully on device. The
per-component thickness DVs mirror the per-component TACS design variables
(crm.py:86-121); their sensitivities come from jax.vjp of the assembly
instead of TACS addMatDVSensInnerProduct (crm.py:343-357).
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.shell import shell_dof_map, shell_element_matrices
from ..ops.autodiff import EigProblem, EighGenConfig, eigh_gen
from ..ops.operators import DenseOperator


def make_wingbox_mesh(nspan=8, nchord=4, nheight=2, span=10.0, c_root=3.0,
                      c_tip=1.2, h_root=0.6, h_tip=0.25, sweep=0.3,
                      nribs=3):
    """Parametric wingbox: top/bottom skins, front/rear spars, evenly spaced
    ribs. Returns (X (nnodes,3), conn (nelems,4), comp (nelems,), names)."""
    key2node = {}
    X = []

    def node(x, y, z):
        key = (round(x, 9), round(y, 9), round(z, 9))
        if key not in key2node:
            key2node[key] = len(X)
            X.append([x, y, z])
        return key2node[key]

    def section(j):
        f = j / nspan
        c = c_root + (c_tip - c_root) * f
        h = h_root + (h_tip - h_root) * f
        xoff = sweep * span * f
        y = span * f
        return c, h, xoff, y

    conn = []
    comp = []
    names = ["top_skin", "bottom_skin", "front_spar", "rear_spar", "ribs"]

    def add_quad(n0, n1, n2, n3, cid):
        conn.append([n0, n1, n2, n3])
        comp.append(cid)

    # skins: grid in (chord i, span j)
    def skin(zsign, cid):
        for j in range(nspan):
            c0, h0, x0, y0 = section(j)
            c1, h1, x1, y1 = section(j + 1)
            for i in range(nchord):
                fa, fb = i / nchord, (i + 1) / nchord
                a = node(x0 + (fa - 0.5) * c0, y0, zsign * h0 / 2)
                b = node(x0 + (fb - 0.5) * c0, y0, zsign * h0 / 2)
                d = node(x1 + (fb - 0.5) * c1, y1, zsign * h1 / 2)
                e = node(x1 + (fa - 0.5) * c1, y1, zsign * h1 / 2)
                add_quad(a, b, d, e, cid)

    skin(+1, 0)
    skin(-1, 1)

    # spars: grid in (span j, height k) at chord fraction 0 / 1
    def spar(cfrac, cid):
        for j in range(nspan):
            c0, h0, x0, y0 = section(j)
            c1, h1, x1, y1 = section(j + 1)
            for k in range(nheight):
                ga, gb = k / nheight - 0.5, (k + 1) / nheight - 0.5
                a = node(x0 + (cfrac - 0.5) * c0, y0, ga * h0)
                b = node(x0 + (cfrac - 0.5) * c0, y0, gb * h0)
                d = node(x1 + (cfrac - 0.5) * c1, y1, gb * h1)
                e = node(x1 + (cfrac - 0.5) * c1, y1, ga * h1)
                add_quad(a, e, d, b, cid)

    spar(0.0, 2)
    spar(1.0, 3)

    # ribs: full cross-section sheets at evenly spaced interior stations
    rib_js = np.linspace(0, nspan, nribs + 2).astype(int)[1:-1]
    for j in rib_js:
        c0, h0, x0, y0 = section(int(j))
        for i in range(nchord):
            fa, fb = i / nchord, (i + 1) / nchord
            for k in range(nheight):
                ga, gb = k / nheight - 0.5, (k + 1) / nheight - 0.5
                a = node(x0 + (fa - 0.5) * c0, y0, ga * h0)
                b = node(x0 + (fb - 0.5) * c0, y0, ga * h0)
                d = node(x0 + (fb - 0.5) * c0, y0, gb * h0)
                e = node(x0 + (fa - 0.5) * c0, y0, gb * h0)
                add_quad(a, b, d, e, 4)

    return (np.array(X), np.array(conn, dtype=np.int32),
            np.array(comp, dtype=np.int32), names)


class CRM:
    """Wingbox modal analysis (reference CRM class surface, crm.py:19-407)."""

    def __init__(self, nspan=8, nchord=4, nheight=2, N=6, m=None, sigma=None,
                 E=70e9, nu=0.3, rho=2700.0, t0=0.01, omega0=None,
                 adjoint_method="sibk", rtol=1e-10, eig_atol=1e-5, **mesh_kw):
        X, conn, comp, names = make_wingbox_mesh(nspan, nchord, nheight,
                                                 **mesh_kw)
        self.X = jnp.asarray(X)
        self.conn = jnp.asarray(conn)
        self.comp = jnp.asarray(comp)
        self.component_names = names
        self.ncomp = len(names)
        self.nnodes = X.shape[0]
        self.nvars = 6 * self.nnodes
        self.E, self.nu, self.rho = E, nu, rho
        self.N = N
        if m is None:
            m = max(3 * N + 1, 60)
        self.m = m

        self.dofs = shell_dof_map(conn)

        # clamp the root section (y = 0) — the reference detects constrained
        # DOFs from identity rows of the TACS matrix (crm.py:146-183); here
        # the root boundary is explicit.
        fixed_nodes = np.nonzero(np.abs(X[:, 1]) < 1e-9)[0]
        fixed = np.zeros(self.nvars, dtype=bool)
        for d in range(6):
            fixed[6 * fixed_nodes + d] = True
        self.free = jnp.asarray(np.nonzero(~fixed)[0].astype(np.int32))

        # design variables: per-component thickness
        self.x = jnp.full(self.ncomp, t0)

        # estimate sigma from a first solve if not given
        self._sigma = sigma
        self.adjoint_method = adjoint_method
        self.rtol = rtol
        self.eig_atol = eig_atol
        self.cfg = None
        self.problem = EigProblem(assemble=self._assemble)
        self.profile: Dict = {"nnodes": self.nnodes, "nvars": self.nvars,
                              "nelems": int(conn.shape[0]), "N": N, "m": m}

    # -- differentiable assembly -------------------------------------------

    def _assemble(self, tcomp):
        t_elem = tcomp[self.comp]
        Xe = self.X[self.conn]
        Ke, Me = shell_element_matrices(Xe, t_elem, E=self.E, nu=self.nu,
                                        rho=self.rho)
        nK = self.nvars

        def todense(mats):
            out = jnp.zeros((nK, nK))
            out = out.at[self.dofs[:, :, None],
                         self.dofs[:, None, :]].add(mats)
            return out[jnp.ix_(self.free, self.free)]

        return DenseOperator(todense(Ke)), DenseOperator(todense(Me))

    def _ensure_cfg(self):
        if self.cfg is not None:
            return
        if self._sigma is None:
            # cheap estimate of the lowest eigenvalue scale via a few
            # inverse-power iterations on the dense pencil at the initial DVs
            A, B = self._assemble(self.x)
            from ..ops.factor import CholeskyFactor

            f = CholeskyFactor.from_matrix(A.mat)
            rng = np.random.default_rng(0)
            v = jnp.asarray(rng.standard_normal(A.mat.shape[0]))
            for _ in range(15):
                v = f.mv(B.mv(v))
                v = v / jnp.linalg.norm(v)
            lam1 = float((v @ A.mv(v)) / (v @ B.mv(v)))
            self._sigma = 0.5 * lam1
        self.cfg = EighGenConfig(
            N=self.N, m=self.m, sigma=float(self._sigma), mode="normal",
            adjoint_method=self.adjoint_method, adjoint_maxiter=60,
            adjoint_rtol=self.rtol * 1e-2, nrestart=2,
            eig_atol=self.eig_atol)

    def _solve_fn(self, tcomp):
        lam, Qr = eigh_gen(tcomp, self.problem, self.cfg)
        return lam, Qr

    # -- three-phase protocol (crm.py:212-376) ------------------------------

    def initialize(self, store=False):
        self._ensure_cfg()
        t0 = time.time()
        (self.lam, self.Qr), self._vjp = jax.vjp(self._solve_fn, self.x)
        self.Q = jnp.zeros((self.nvars, self.N)).at[self.free].set(self.Qr)
        self.profile["eigenvalue solve time"] = time.time() - t0
        self.profile["natural frequencies (Hz)"] = (
            np.sqrt(np.asarray(self.lam)) / (2 * np.pi)).tolist()
        if store:
            self.profile["eigenvalues"] = np.asarray(self.lam).tolist()

    def initialize_adjoint(self):
        self.xb = jnp.zeros_like(self.x)
        self.lamb = jnp.zeros_like(self.lam)
        self.Qrb = jnp.zeros_like(self.Qr)

    def finalize_adjoint(self):
        t0 = time.time()
        (xb,) = self._vjp((self.lamb, self.Qrb))
        self.xb = self.xb + xb
        self.profile["adjoint solution time"] = time.time() - t0

    # -- modal compliance (crm.py:267-293) ----------------------------------

    def tip_load(self):
        """Unit vertical load at the tip section nodes."""
        Xn = np.asarray(self.X)
        tip_nodes = np.nonzero(Xn[:, 1] > Xn[:, 1].max() - 1e-9)[0]
        f = np.zeros(self.nvars)
        f[6 * tip_nodes + 2] = 1.0 / len(tip_nodes)
        return jnp.asarray(f)

    def get_modal_compliance(self, f=None):
        if f is None:
            f = self.tip_load()
        fr = f[self.free]
        vals = self.Qr.T @ fr
        return jnp.sum(vals**2 / self.lam)

    def add_modal_compliance_derivative(self, scale=1.0, f=None):
        if f is None:
            f = self.tip_load()
        fr = f[self.free]

        def c(lam, Qr):
            vals = Qr.T @ fr
            return jnp.sum(vals**2 / lam)

        glam, gQr = jax.grad(c, argnums=(0, 1))(self.lam, self.Qr)
        self.lamb = self.lamb + scale * glam
        self.Qrb = self.Qrb + scale * gQr
