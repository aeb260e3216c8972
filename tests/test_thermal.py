"""Thermal model tests: compliance/aggregate derivatives, transient KS, and
the repeated-eigenvalue epsilon sweep (reference thermal.py:1619-1725)."""

import jax.numpy as jnp
import numpy as np
import pytest

from eigd_tpu.models.thermal import ThermalOpt, make_model, make_opt_model


@pytest.fixture(scope="module")
def topo():
    # Slightly rectangular domain: distinct spectrum, so generic FD
    # perturbations are valid (the exactly-square domain has degenerate
    # pairs, where objectives with unequal per-mode weights are only
    # directionally differentiable — covered by TestRepeatedEigSweep with
    # the suppressed-rotation oracle instead).
    t = make_model(nx=12, ny=12, Ly=1.15, N=6)
    t.initialize()
    return t


class TestThermalAnalysis:
    def test_mode0_is_constant_mode(self, topo):
        lam = np.asarray(topo.lam)
        assert abs(lam[0]) < 1e-6
        assert lam[1] > 1.0e-1

    def test_compliance_gradient_fd(self, topo):
        # A localized load vector (the uniform vector is M-orthogonal to all
        # non-constant modes, making the compliance vanish identically).
        vec = topo.mean_vecs["center"]
        x0 = jnp.asarray(topo.x)

        topo.initialize_adjoint()
        topo.add_thermal_compliance_derivative(1.0, vec)
        topo.finalize_adjoint()

        rng = np.random.default_rng(0)
        pert = jnp.asarray(rng.uniform(size=x0.shape))
        h = 1e-6

        def val(x):
            topo.x = x
            topo.initialize()
            return float(topo.get_thermal_compliance(vec))

        fd = (val(x0 + h * pert) - val(x0 - h * pert)) / (2 * h)
        topo.x = x0
        topo.initialize()
        rel = abs(float(pert @ topo.xb) - fd) / abs(fd)
        assert rel < 1e-6, rel

    def test_aggregate_gradient_fd(self, topo):
        node = jnp.asarray([5, 20, 33])
        rho_agg = 3.0
        x0 = jnp.asarray(topo.x)

        topo.initialize_adjoint()
        topo.add_eigenvector_aggregate_derivative(1.0, rho_agg, node)
        topo.finalize_adjoint()

        rng = np.random.default_rng(1)
        pert = jnp.asarray(rng.uniform(size=x0.shape))
        h = 1e-6

        def val(x):
            topo.x = x
            topo.initialize()
            return float(topo.get_eigenvector_aggregate(rho_agg, node))

        fd = (val(x0 + h * pert) - val(x0 - h * pert)) / (2 * h)
        topo.x = x0
        topo.initialize()
        rel = abs(float(pert @ topo.xb) - fd) / abs(fd)
        assert rel < 1e-6, rel


class TestThermalOpt:
    def test_transient_ks_fd(self):
        np.random.seed(0)
        topo = make_model(nx=10, ny=10, Ly=1.2, N=5)
        heat_func = {
            "case": {"center": lambda t: 1.0 + 0.5 * jnp.sin(4.0 * t)}
        }
        opt = ThermalOpt(topo, heat_func, nsteps=40, tfinal=2.0)
        data = opt.test_ks_func(rho_ks=10.0, dh_fd=1e-6)
        assert data["cd_err"] < 1e-6, data

    def test_transient_matches_full_model(self):
        """Reduced modal solution vs full M u' + K u = f integration
        (reference cross-check, thermal.py:1392-1472)."""
        topo = make_model(nx=8, ny=8, N=20, m=80)
        heat = lambda t: 1.0 + 0.0 * t
        opt = ThermalOpt(topo, {"c": {"center": heat}}, nsteps=60,
                         tfinal=1.0)
        opt.initialize()
        xi = opt.xi["c"]
        # full model
        rho = topo.fltr.apply(topo.x)
        from eigd_tpu.fem import assembly as fem
        rhoE = fem.element_density(rho, topo.conn)
        K, M = topo._assemble(rhoE)
        Kd, Md = K.to_dense(), M.to_dense()
        v = topo.mean_vecs["center"]
        dt = opt.dt
        nsteps = opt.nsteps
        u = jnp.zeros(topo.nnodes)
        lhs = Md / dt + 0.5 * Kd
        import scipy.linalg
        lu = scipy.linalg.lu_factor(np.asarray(lhs))
        us = [np.zeros(topo.nnodes)]
        for k in range(nsteps):
            tmid = 0.5 * (float(opt.t[k]) + float(opt.t[k + 1]))
            rhs = (np.asarray(Md) / dt - 0.5 * np.asarray(Kd)) @ us[-1] \
                + np.asarray(v) * float(heat(tmid))
            us.append(scipy.linalg.lu_solve(lu, rhs))
        us = np.array(us)  # (nsteps+1, nnodes)
        # set-average temperature histories
        T_full = us @ np.asarray(v)
        coef = np.asarray(opt.coef["center"])
        T_modal = coef @ np.asarray(xi)
        err = np.abs(T_full - T_modal).max() / np.abs(T_full).max()
        assert err < 2e-2, err  # modal truncation error only (N=20 of n=81)


class TestRepeatedEigSweep:
    """Domain-asymmetry sweep: eigenvalues transition distinct -> repeated
    (reference thermal.py __main__, :1656-1676)."""

    @pytest.mark.parametrize("epsilon", [0.1, 1e-6, 1e-8])
    def test_aggregate_gradient(self, epsilon):
        """Verified against the suppressed-rotation directional oracle — the
        jax.jvp equivalent of the reference's complex-step channel (their
        _eigh zeroes divided differences of numerically repeated
        eigenvalues, eigenvector_derivatives.py:1403-1408). Plain FD is
        invalid here: finite steps cross the eigenvalue-crossing region."""
        import jax

        from eigd_tpu.fem import assembly as fem
        from eigd_tpu.ops.autodiff import eigh_gen_directional_oracle

        np.random.seed(2)
        topo = make_opt_model(nx=10, epsilon=epsilon, N=5, Ntarget=5)
        topo.initialize()
        node = jnp.asarray([7, 31])
        rho_agg = 2.0
        x0 = jnp.asarray(topo.x)

        topo.initialize_adjoint()
        topo.add_eigenvector_aggregate_derivative(1.0, rho_agg, node)
        topo.finalize_adjoint()

        rng = np.random.default_rng(3)
        pert = jnp.asarray(rng.uniform(size=x0.shape))
        ans = float(pert @ topo.xb)

        def assemble_dense(x):
            rho = topo.fltr.apply(x)
            rhoE = fem.element_density(rho, topo.conn)
            K, M = topo._assemble(rhoE)
            return K.to_dense(), M.to_dense()

        (Kd, Md), (dK, dM) = jax.jvp(assemble_dense, (x0,), (pert,))
        lam, Phi, dlam, dPhi = eigh_gen_directional_oracle(
            Kd, Md, dK, dM, topo.Nmax, eig_atol=topo.eig_atol)

        mask = topo._mode_mask()

        def agg(lam, Q):
            a = jnp.tanh(rho_agg * (lam - 0.0))
            b = jnp.tanh(rho_agg * (lam - 50.0))
            eta = mask * (a - b)
            eta = eta / jnp.sum(eta)
            return jnp.sum(eta * jnp.sum(Q[node, :] ** 2, axis=0))

        _, dval = jax.jvp(agg, (jnp.asarray(lam), jnp.asarray(Phi)),
                          (jnp.asarray(dlam), jnp.asarray(dPhi)))
        rel = abs(ans - float(dval)) / abs(float(dval))
        assert rel < 5e-7, (epsilon, rel, ans, float(dval))


class TestThermalScalable:
    """Scalar-field scalable path: ndof=1 stencil matvecs + BCR f32 factor."""

    def test_matches_dense_path(self):
        t1 = make_model(nx=16, ny=16, N=5)
        t1.initialize()
        t2 = make_model(nx=16, ny=16, N=5, factor_kind="bcr_f32")
        t2.initialize()
        np.testing.assert_allclose(np.asarray(t2.lam), np.asarray(t1.lam),
                                   rtol=1e-9, atol=1e-10)

    def test_aggregate_fd_scalable(self):
        # N=4: the mode-4/5 pair of the square domain is degenerate, so an
        # aggregate window must not straddle it
        t = make_model(nx=16, ny=16, N=4, factor_kind="bcr_f32",
                       lanczos_tol=1e-12)
        t.initialize()
        node = jnp.asarray([40, 41])
        t.initialize_adjoint()
        t.add_eigenvector_aggregate_derivative(1.0, 2.0, node)
        t.finalize_adjoint()
        x0 = jnp.asarray(t.x)
        pert = jnp.asarray(np.random.default_rng(0).uniform(size=x0.shape))
        h = 1e-6

        def val(x):
            t.x = x
            t.initialize()
            return float(t.get_eigenvector_aggregate(2.0, node))

        fd = (val(x0 + h * pert) - val(x0 - h * pert)) / (2 * h)
        t.x = x0
        rel = abs(float(pert @ t.xb) - fd) / abs(fd)
        assert rel < 5e-6, rel
