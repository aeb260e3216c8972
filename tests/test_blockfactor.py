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
