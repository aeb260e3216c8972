"""Pallas stencil kernel vs the XLA reference matvec (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from eigd_tpu.fem import assembly as fem
from eigd_tpu.fem.model import make_grid
from eigd_tpu.fem.quad import plane_stress_tables, thermal_tables
from eigd_tpu.ops.pallas_stencil import pallas_stencil_matvec, stencil_planes
from eigd_tpu.ops.stencil import stencil_from_elements, stencil_matvec


def _plane_stress_W(nx, ny, seed=0):
    mesh = make_grid(nx, ny, 2.0, 1.0)
    conn = jnp.asarray(mesh.conn)
    X = jnp.asarray(mesh.X)
    Be, He, detJ = plane_stress_tables(X, conn)
    dofs = fem.element_dof_map(conn)
    C0 = fem.plane_stress_C0()
    rng = np.random.default_rng(seed)
    rhoE = jnp.asarray(rng.uniform(0.3, 1.0, mesh.nelems))
    K = fem.stiffness_matrix(rhoE, Be, detJ, dofs, 2 * mesh.nnodes, C0)
    return stencil_from_elements(jnp.asarray(K.mats), nx, ny, 2), 2 * mesh.nnodes


class TestPallasStencil:
    @pytest.mark.parametrize("nx,ny,TX", [(16, 8, 4), (33, 17, 8)])
    @pytest.mark.parametrize("k", [1, 8])
    def test_matches_reference(self, nx, ny, TX, k):
        W, n = _plane_stress_W(nx, ny)
        Wp = stencil_planes(W, 2)
        rng = np.random.default_rng(3)
        shape = (n, k) if k > 1 else (n,)
        x = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
        ref = np.asarray(stencil_matvec(W.astype(jnp.float32), x, nx, ny, 2))
        got = np.asarray(pallas_stencil_matvec(Wp, x, nx, ny, 2, TX=TX,
                                               interpret=True))
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() < 1e-5 * scale

    @pytest.mark.parametrize("k", [2, 12])
    def test_dd_matvec_f64_accuracy(self, k):
        """Compensated dd kernel reproduces the f64 stencil matvec to
        ~1e-12 backward error (vs ~1e-8 for the plain f32 kernel); k=12
        also exercises the column-chunked path."""
        from eigd_tpu.ops.pallas_stencil import (dd_stencil_matvec,
                                                 stencil_planes_dd)

        nx, ny = 16, 8
        W, n = _plane_stress_W(nx, ny)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((n, k)))
        ref = np.asarray(stencil_matvec(W, x, nx, ny, 2))
        Wdd = stencil_planes_dd(W, 2)
        got = np.asarray(dd_stencil_matvec(Wdd, x, nx, ny, 2,
                                           interpret=True))
        scale = (np.abs(np.asarray(x)).max() * 18
                 * np.abs(np.asarray(W)).max())
        assert np.abs(got - ref).max() < 1e-11 * scale

    def test_operator_with_pallas_dispatch(self):
        """GridStencilOperator.with_pallas: f64 inputs route to the dd
        kernel, f32 inputs to the f32 kernel, both matching the XLA
        stencil matvec (the solver-boundary enhancement of
        ops/autodiff._pallas_ops)."""
        from eigd_tpu.ops.stencil import GridStencilOperator

        nx, ny = 16, 8
        W, n = _plane_stress_W(nx, ny)
        mesh = make_grid(nx, ny, 2.0, 1.0)
        dofs = fem.element_dof_map(jnp.asarray(mesh.conn))
        op = GridStencilOperator(None, dofs, n, W, (nx, ny), 2)
        fast = op.with_pallas(interpret=True)
        assert fast.Wdd is not None and fast.Wps is not None
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.standard_normal((n, 6)))
        ref = np.asarray(op.mv(x))
        got = np.asarray(fast.mv(x))
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() < 1e-10 * scale
        # (n,) f64 squeeze path
        got1 = np.asarray(fast.mv(x[:, 0]))
        assert np.abs(got1 - ref[:, 0]).max() < 1e-10 * scale
        # f32 path
        x32 = x.astype(jnp.float32)
        ref32 = np.asarray(stencil_matvec(W.astype(jnp.float32), x32,
                                          nx, ny, 2))
        got32 = np.asarray(fast.mv(x32))
        assert np.abs(got32 - ref32).max() < 1e-4 * scale

    def test_end_to_end_interpret_dispatch(self):
        """pallas_mv='interpret': the FULL eigh_gen solve + gradient runs
        through the dd-Pallas operator dispatch (interpret-mode kernels on
        CPU) and matches the plain-XLA path — the exact code path the TPU
        executes is exercised by CI, not just the kernel in isolation
        (ADVICE r1 pattern)."""
        import jax

        from eigd_tpu.models.natural_frequency import make_model

        kw = dict(nx=12, ny=6, N=2, m=32, Lx=2.0, Ly=1.0, rfact=2.0,
                  factor_kind="mg", lanczos_block=4, lanczos_ortho="local",
                  factor_options={"min_coarse": 64}, lanczos_tol=1e-11,
                  lanczos_polish=1)
        grads = {}
        for mode in ("off", "interpret"):
            topo = make_model(pallas_mv=mode, **kw)

            def f(x):
                lam, Q, rho, rhoE = topo._solve_fn(x)
                return jnp.sum(jnp.sqrt(lam)) + jnp.sum(Q[:6, :] ** 2)

            x0 = jnp.asarray(topo.x)
            grads[mode] = np.asarray(jax.grad(f)(x0))
        rel = (np.abs(grads["interpret"] - grads["off"]).max()
               / np.abs(grads["off"]).max())
        assert rel < 1e-9, rel

    def test_thermal_ndof1(self):
        nx, ny = 12, 10
        mesh = make_grid(nx, ny, 1.0, 1.0)
        conn = jnp.asarray(mesh.conn)
        X = jnp.asarray(mesh.X)
        Bt, Ht, detJ = thermal_tables(X, conn)
        dofs = jnp.asarray(np.asarray(conn))
        rng = np.random.default_rng(1)
        rhoE = jnp.asarray(rng.uniform(0.3, 1.0, mesh.nelems))
        K = fem.thermal_stiffness_matrix(rhoE, Bt, detJ, dofs, mesh.nnodes)
        W = stencil_from_elements(jnp.asarray(K.mats), nx, ny, 1)
        Wp = stencil_planes(W, 1)
        x = jnp.asarray(rng.standard_normal((mesh.nnodes, 4)),
                        dtype=jnp.float32)
        ref = np.asarray(stencil_matvec(W.astype(jnp.float32), x, nx, ny, 1))
        got = np.asarray(pallas_stencil_matvec(Wp, x, nx, ny, 1, TX=8,
                                               interpret=True))
        assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max()
