"""FEM layer tests: element kernels, assembly, filters."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eigd_tpu.fem import assembly as fem
from eigd_tpu.fem.filter import NodeFilter
from eigd_tpu.fem.model import make_grid
from eigd_tpu.fem.quad import (
    plane_stress_tables,
    shape_functions,
    stress_stiffness_tables,
    thermal_tables,
)


class TestQuadKernels:
    def test_partition_of_unity(self):
        N, Nxi, Neta = shape_functions(0.3, -0.7)
        assert abs(float(jnp.sum(N)) - 1.0) < 1e-14
        assert abs(float(jnp.sum(Nxi))) < 1e-14
        assert abs(float(jnp.sum(Neta))) < 1e-14

    def test_detJ_uniform_grid(self):
        mesh = make_grid(4, 4, 1.0, 1.0)
        _, _, detJ = plane_stress_tables(jnp.asarray(mesh.X),
                                         jnp.asarray(mesh.conn))
        # uniform grid: detJ = (dx/2)(dy/2)
        expect = (0.25 / 2) * (0.25 / 2)
        np.testing.assert_allclose(np.asarray(detJ), expect, rtol=1e-12)

    def test_stiffness_rigid_body_modes(self):
        """K must annihilate translations and the linearized rotation."""
        mesh = make_grid(5, 3, 1.0, 0.6)
        conn = jnp.asarray(mesh.conn)
        X = jnp.asarray(mesh.X)
        Be, He, detJ = plane_stress_tables(X, conn)
        dofs = fem.element_dof_map(conn)
        C0 = fem.plane_stress_C0()
        rhoE = jnp.ones(mesh.nelems)
        K = fem.stiffness_matrix(rhoE, Be, detJ, dofs, 2 * mesh.nnodes, C0)

        tx = jnp.zeros(2 * mesh.nnodes).at[0::2].set(1.0)
        ty = jnp.zeros(2 * mesh.nnodes).at[1::2].set(1.0)
        rot = jnp.zeros(2 * mesh.nnodes)
        rot = rot.at[0::2].set(-X[:, 1]).at[1::2].set(X[:, 0])
        for v in (tx, ty, rot):
            assert float(jnp.abs(K.mv(v)).max()) < 1e-12

    def test_mass_total(self):
        """Total mass = integral of density = sum over translations."""
        mesh = make_grid(6, 4, 2.0, 1.0)
        conn = jnp.asarray(mesh.conn)
        X = jnp.asarray(mesh.X)
        Be, He, detJ = plane_stress_tables(X, conn)
        dofs = fem.element_dof_map(conn)
        rhoE = jnp.full(mesh.nelems, 0.7)
        M = fem.mass_matrix(rhoE, He, detJ, dofs, 2 * mesh.nnodes,
                            density=2.0)
        tx = jnp.zeros(2 * mesh.nnodes).at[0::2].set(1.0)
        total = float(tx @ M.mv(tx))
        np.testing.assert_allclose(total, 0.7 * 2.0 * 2.0 * 1.0, rtol=1e-12)

    def test_thermal_stiffness_annihilates_constants(self):
        mesh = make_grid(5, 5, 1.0, 1.0)
        conn = jnp.asarray(mesh.conn)
        X = jnp.asarray(mesh.X)
        Be, He, detJ = thermal_tables(X, conn)
        rhoE = jnp.ones(mesh.nelems)
        K = fem.thermal_stiffness_matrix(rhoE, Be, detJ, conn, mesh.nnodes)
        ones = jnp.ones(mesh.nnodes)
        assert float(jnp.abs(K.mv(ones)).max()) < 1e-13

    def test_stress_stiffness_symmetric(self):
        mesh = make_grid(4, 3, 1.0, 1.0)
        conn = jnp.asarray(mesh.conn)
        X = jnp.asarray(mesh.X)
        Be, Te, detJ = stress_stiffness_tables(X, conn)
        dofs = fem.element_dof_map(conn)
        C0 = fem.plane_stress_C0()
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal(2 * mesh.nnodes))
        rhoE = jnp.asarray(rng.uniform(0.3, 1.0, mesh.nelems))
        G = fem.stress_stiffness_matrix(rhoE, u, Be, Te, detJ, dofs, conn,
                                        2 * mesh.nnodes, C0)
        Gd = np.asarray(G.to_dense())
        np.testing.assert_allclose(Gd, Gd.T, atol=1e-12)


class TestElementOperator:
    def test_matvec_matches_dense(self):
        rng = np.random.default_rng(1)
        mesh = make_grid(4, 4, 1.0, 1.0)
        conn = jnp.asarray(mesh.conn)
        X = jnp.asarray(mesh.X)
        Be, He, detJ = plane_stress_tables(X, conn)
        dofs = fem.element_dof_map(conn)
        C0 = fem.plane_stress_C0()
        rhoE = jnp.asarray(rng.uniform(0.2, 1.0, mesh.nelems))
        K = fem.stiffness_matrix(rhoE, Be, detJ, dofs, 2 * mesh.nnodes, C0)
        x = jnp.asarray(rng.standard_normal(2 * mesh.nnodes))
        np.testing.assert_allclose(np.asarray(K.mv(x)),
                                   np.asarray(K.to_dense() @ x), atol=1e-12)
        # block matvec
        Xb = jnp.asarray(rng.standard_normal((2 * mesh.nnodes, 3)))
        np.testing.assert_allclose(np.asarray(K.mv(Xb)),
                                   np.asarray(K.to_dense() @ Xb), atol=1e-12)


class TestNodeFilter:
    @pytest.mark.parametrize("ftype", ["spatial", "helmholtz"])
    def test_filter_preserves_constants(self, ftype):
        mesh = make_grid(8, 6, 1.0, 1.0)
        fltr = NodeFilter(mesh.conn, mesh.X, r0=0.2, ftype=ftype)
        rho = fltr.apply(jnp.ones(fltr.num_design_vars))
        np.testing.assert_allclose(np.asarray(rho), 1.0, atol=1e-9)

    @pytest.mark.parametrize("ftype", ["spatial", "helmholtz"])
    def test_apply_gradient_is_transpose(self, ftype):
        mesh = make_grid(6, 5, 1.0, 1.0)
        fltr = NodeFilter(mesh.conn, mesh.X, r0=0.25, ftype=ftype)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(0.2, 0.9, fltr.num_design_vars))
        g = jnp.asarray(rng.standard_normal(fltr.nnodes))
        gx = fltr.apply_gradient(g, x)
        # directional check: g . d(apply)/dx . p == p . gx
        p = jnp.asarray(rng.standard_normal(fltr.num_design_vars))
        _, jvp = jax.jvp(fltr.apply, (x,), (p,))
        np.testing.assert_allclose(float(g @ jvp), float(p @ gx), rtol=1e-10)

    def test_projection_and_dvmap(self):
        mesh = make_grid(6, 6, 1.0, 1.0)
        dvmap = np.arange(mesh.nnodes)
        dvmap[:5] = -1  # frozen nodes
        dvmap[5:] = np.arange(mesh.nnodes - 5)
        fltr = NodeFilter(mesh.conn, mesh.X, r0=0.2, dvmap=dvmap,
                          num_design_vars=mesh.nnodes - 5, projection=True,
                          beta=8.0)
        x = jnp.full(mesh.nnodes - 5, 0.4)
        rho = fltr.apply(x)
        assert np.all(np.isfinite(np.asarray(rho)))
        # frozen nodes pull toward 1.0 through projection
        g = fltr.apply_gradient(jnp.ones(mesh.nnodes), x)
        assert g.shape == (mesh.nnodes - 5,)


class TestConvFilter:
    def test_conv_matches_spatial_on_uniform_grid(self):
        """The convolution form of the spatial filter (O(kernel) constants)
        is exact on uniform grids, including the per-node boundary
        normalization (reference node_filter.py:74-83)."""
        from eigd_tpu.fem.filter import NodeFilter
        from eigd_tpu.fem.model import make_grid

        nx, ny = 20, 12
        grid = make_grid(nx, ny, 2.0, 1.0)
        r0 = 2.0 * (1.0 / ny)
        f1 = NodeFilter(grid.conn, grid.X, r0=r0)
        f2 = NodeFilter(grid.conn, grid.X, r0=r0, ftype="conv",
                        grid_shape=(nx, ny))
        x = jnp.asarray(np.random.default_rng(0).uniform(size=grid.nnodes))
        np.testing.assert_allclose(np.asarray(f1.apply(x)),
                                   np.asarray(f2.apply(x)), atol=1e-14)

    def test_uniform_assembly_matches_general(self):
        """make_model's uniform-grid analytic assembly (one reference element
        matrix scaled per element) equals the general quadrature path."""
        from eigd_tpu.models.natural_frequency import make_model

        t1 = make_model(nx=16, ny=8, Lx=2.0, Ly=1.0, N=4, uniform_grid=True)
        t2 = make_model(nx=16, ny=8, Lx=2.0, Ly=1.0, N=4, uniform_grid=False)
        rho = t1.fltr.apply(t1.x)
        from eigd_tpu.fem import assembly as fem

        rhoE = fem.element_density(rho, t1.conn)
        K1, M1 = t1._assemble(rhoE)
        K2, M2 = t2._assemble(rhoE)
        np.testing.assert_allclose(np.asarray(K1.mats), np.asarray(K2.mats),
                                   atol=1e-13)
        np.testing.assert_allclose(np.asarray(M1.mats), np.asarray(M2.mats),
                                   atol=1e-13)
