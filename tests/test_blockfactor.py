"""Block-tridiagonal factor tests: block extraction and solve vs dense."""

import numpy as np
import pytest

import jax.numpy as jnp

from eigd_tpu.fem import assembly as fem
from eigd_tpu.fem.model import make_grid
from eigd_tpu.fem.quad import plane_stress_tables
from eigd_tpu.ops.blockfactor import BlockTridiagFactor, grid_block_tridiag


@pytest.fixture(scope="module")
def grid_problem():
    nx, ny = 10, 6
    mesh = make_grid(nx, ny, 2.0, 1.0)
    conn = jnp.asarray(mesh.conn)
    X = jnp.asarray(mesh.X)
    Be, He, detJ = plane_stress_tables(X, conn)
    dofs = fem.element_dof_map(conn)
    C0 = fem.plane_stress_C0()
    rng = np.random.default_rng(0)
    rhoE = jnp.asarray(rng.uniform(0.3, 1.0, mesh.nelems))
    K = fem.stiffness_matrix(rhoE, Be, detJ, dofs, 2 * mesh.nnodes, C0)
    M = fem.mass_matrix(rhoE, He, detJ, dofs, 2 * mesh.nnodes)
    sigma = -10.0
    shifted = jnp.asarray(K.mats - sigma * M.mats)
    return nx, ny, mesh, K, M, shifted


class TestBlockExtraction:
    def test_blocks_match_dense(self, grid_problem):
        nx, ny, mesh, K, M, shifted = grid_problem
        D, E = grid_block_tridiag(shifted, nx, ny, ndof=2)
        b = 2 * (ny + 1)
        from eigd_tpu.ops.operators import ElementOperator

        dense = np.asarray(
            ElementOperator(shifted, K.dofs, K.n).to_dense())
        for i in range(nx + 1):
            sl = slice(i * b, (i + 1) * b)
            np.testing.assert_allclose(np.asarray(D[i]), dense[sl, sl],
                                       atol=1e-12)
        for i in range(nx):
            sl0 = slice(i * b, (i + 1) * b)
            sl1 = slice((i + 1) * b, (i + 2) * b)
            np.testing.assert_allclose(np.asarray(E[i]), dense[sl1, sl0],
                                       atol=1e-12)
        # no couplings beyond adjacent lines
        assert abs(dense[2 * b:, :b]).max() == 0.0


class TestBlockSolve:
    def test_solve_matches_dense(self, grid_problem):
        nx, ny, mesh, K, M, shifted = grid_problem
        D, E = grid_block_tridiag(shifted, nx, ny, ndof=2)
        factor = BlockTridiagFactor.from_blocks(D, E)

        from eigd_tpu.ops.operators import ElementOperator

        dense = np.asarray(ElementOperator(shifted, K.dofs, K.n).to_dense())
        rng = np.random.default_rng(1)
        x = rng.standard_normal(dense.shape[0])
        y = np.asarray(factor.mv(jnp.asarray(x)))
        ref = np.linalg.solve(dense, x)
        np.testing.assert_allclose(y, ref, atol=1e-9 * np.abs(ref).max())

        # block RHS
        Xb = rng.standard_normal((dense.shape[0], 3))
        Yb = np.asarray(factor.mv(jnp.asarray(Xb)))
        np.testing.assert_allclose(Yb, np.linalg.solve(dense, Xb),
                                   atol=1e-9 * np.abs(Yb).max())

    def test_lanczos_with_block_factor(self, grid_problem):
        """End-to-end eigensolve using the block factor (matrix-free B)."""
        nx, ny, mesh, K, M, shifted = grid_problem
        import scipy.linalg

        from eigd_tpu.ops.lanczos import lanczos_solve

        D, E = grid_block_tridiag(shifted, nx, ny, ndof=2)
        factor = BlockTridiagFactor.from_blocks(D, E)
        res = lanczos_solve(K, M, factor, -10.0, 9, m=60)
        lam = np.asarray(res.lam)

        Kd = np.asarray(K.to_dense())
        Md = np.asarray(M.to_dense())
        lam_ref = scipy.linalg.eigh(Kd, Md, eigvals_only=True)
        # Single-vector Krylov may resolve only 2 of the 3 exactly-degenerate
        # rigid modes within m iterations; the flexible spectrum is the check.
        flex = lam[lam > 1e-6][:6]
        flex_ref = lam_ref[lam_ref > 1e-6][:6]
        np.testing.assert_allclose(flex, flex_ref, rtol=1e-8)


class TestPCGFactor:
    """PCGFactor: the ill-conditioned (thin-shell) mixed-precision path
    (reference role: SuperLU's robustness across conditioning,
    eigenvector_derivatives.py:11-23)."""

    def _problem(self, scale_hi=1e8):
        """Synthetic block-tridiagonal SPD system with a DOF-scale
        disparity (diag entries spanning 1..scale_hi) that pushes the
        UNscaled condition number past the f32 Cholesky breakdown."""
        rng = np.random.default_rng(3)
        nb, b = 12, 16
        n = nb * b
        # SPD base: tridiag-ish Laplacian blocks + random coupling
        D = np.zeros((nb, b, b))
        E = rng.standard_normal((nb - 1, b, b)) * 0.1
        for i in range(nb):
            Q = rng.standard_normal((b, b)) * 0.1
            D[i] = np.eye(b) * 4.0 + Q @ Q.T
        # per-DOF scaling: alternate stiff (rotation-like) and soft DOFs
        s = np.ones(n)
        s[::2] = np.sqrt(scale_hi)
        S = s.reshape(nb, b)
        D = D * S[:, :, None] * S[:, None, :]
        E = E * S[1:, :, None] * S[:-1, None, :]
        dense = np.zeros((n, n))
        for i in range(nb):
            dense[i * b:(i + 1) * b, i * b:(i + 1) * b] = D[i]
        for i in range(nb - 1):
            blk = E[i]
            dense[(i + 1) * b:(i + 2) * b, i * b:(i + 1) * b] = blk
            dense[i * b:(i + 1) * b, (i + 1) * b:(i + 2) * b] = blk.T
        return nb, b, D, E, dense

    def test_converges_where_f32_breaks(self):
        from eigd_tpu.ops.blockfactor import BCRFactor, PCGFactor
        from eigd_tpu.ops.operators import DenseOperator

        nb, b, D, E, dense = self._problem()
        n = nb * b
        # unscaled f32 factor quality is useless at cond ~ 1e8+: verify the
        # equilibrated + jittered PCG path recovers an f64-accurate solve
        diag = np.diag(dense)
        s = 1.0 / np.sqrt(diag)
        Dsc = D * s.reshape(nb, b)[:, :, None] * s.reshape(nb, b)[:, None, :]
        Esc = (E * s.reshape(nb, b)[1:, :, None]
               * s.reshape(nb, b)[:-1, None, :])
        inner = BCRFactor.from_blocks(jnp.asarray(Dsc, jnp.float32),
                                      jnp.asarray(Esc, jnp.float32),
                                      jitter=1e-4)
        fac = PCGFactor(inner, DenseOperator(jnp.asarray(dense)),
                        jnp.asarray(s), tol=1e-12, maxiter=300)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((n, 3))
        y, info = fac.mv_info(jnp.asarray(x))
        ref = np.linalg.solve(dense, x)
        assert np.all(np.isfinite(np.asarray(y)))
        np.testing.assert_allclose(np.asarray(y), ref,
                                   atol=1e-8 * np.abs(ref).max())
        assert np.all(np.asarray(info["res"]) < 1e-11)

    def test_mask_identity_completion(self):
        """Unmasked RHS components must not blow up the PCG (zero operator
        rows behave as identity, matching the preconditioner's unit
        diagonals)."""
        from eigd_tpu.ops.blockfactor import BCRFactor, PCGFactor
        from eigd_tpu.ops.operators import DenseOperator

        nb, b, D, E, dense = self._problem(scale_hi=1e4)
        n = nb * b
        mask = np.ones(n)
        mask[:b // 2] = 0.0  # constrain part of the first block
        dense_m = dense * mask[:, None] * mask[None, :]
        Dm = dense_m.reshape(nb, b, nb, b)
        D2 = np.stack([Dm[i, :, i, :] for i in range(nb)])
        E2 = np.stack([Dm[i + 1, :, i, :] for i in range(nb - 1)])
        # unit diagonal on masked slots (what block_tridiag_from_dof_groups
        # injects for padding)
        for i in range(nb):
            dzero = np.diag(D2[i]) == 0.0
            D2[i][np.diag_indices(b)] += dzero.astype(float)
        diag = np.where(np.diag(dense_m) <= 0, 1.0, np.diag(dense_m))
        s = 1.0 / np.sqrt(diag)
        sb = s.reshape(nb, b)
        D2 = D2 * sb[:, :, None] * sb[:, None, :]
        E2 = E2 * sb[1:, :, None] * sb[:-1, None, :]
        inner = BCRFactor.from_blocks(jnp.asarray(D2, jnp.float32),
                                      jnp.asarray(E2, jnp.float32),
                                      jitter=1e-5)
        fac = PCGFactor(inner, DenseOperator(jnp.asarray(dense_m)),
                        jnp.asarray(s), mask=jnp.asarray(mask),
                        tol=1e-12, maxiter=300)
        rng = np.random.default_rng(1)
        x = rng.standard_normal(n)  # deliberately NOT masked
        y, info = fac.mv_info(jnp.asarray(x))
        y = np.asarray(y)
        assert np.all(np.isfinite(y))
        free = mask > 0
        ref = np.linalg.solve(dense_m[np.ix_(free, free)], x[free])
        np.testing.assert_allclose(y[free], ref,
                                   atol=1e-8 * np.abs(ref).max())
        # masked components solve the identity: y = x there
        np.testing.assert_allclose(y[~free], x[~free], rtol=1e-10)
