"""Buckling model tests: BLFs vs dense oracle, KS-of-1/BLF and eigenvector
aggregate total derivatives vs FD (reference buckling.py:988-1161)."""

import jax.numpy as jnp
import numpy as np
import pytest

from eigd_tpu.models.buckling import make_buckling_model


@pytest.fixture(scope="module")
def topo():
    t = make_buckling_model(nx=14, ny=7, N=4, sigma=None)
    return t


def _pick_sigma():
    """Find the first BLF from the dense pencil, shift just below it."""
    import scipy.linalg

    from eigd_tpu.fem import assembly as fem

    t = make_buckling_model(nx=14, ny=7, N=4, sigma=1.0)
    rho = t.fltr.apply(t.x)
    rhoE = fem.element_density(rho, t.conn)
    Kr = np.asarray(t._stiffness_dense_reduced(rhoE))
    fr = np.asarray(t.f)[np.asarray(t.free)]
    ur = np.linalg.solve(Kr, fr)
    u_full = np.zeros(t.nvars)
    u_full[np.asarray(t.free)] = ur
    Gr = np.asarray(t._stress_stiffness_dense_reduced(
        jnp.asarray(rhoE), jnp.asarray(u_full)))
    mu = scipy.linalg.eigh(Gr, Kr, eigvals_only=True)
    lam1 = (-1.0 / mu[np.argsort(mu)])[0]
    return float(0.9 * lam1)


@pytest.fixture(scope="module")
def sigma0():
    return _pick_sigma()


class TestBuckling:
    def test_blf_match_dense(self, sigma0):
        import scipy.linalg

        t = make_buckling_model(nx=14, ny=7, N=4, sigma=sigma0)
        t.initialize()
        # dense oracle
        from eigd_tpu.fem import assembly as fem

        rho = t.fltr.apply(t.x)
        rhoE = fem.element_density(rho, t.conn)
        Kr = np.asarray(t._stiffness_dense_reduced(rhoE))
        L = np.linalg.cholesky(Kr)
        fr = np.asarray(t.f)[np.asarray(t.free)]
        ur = np.linalg.solve(Kr, fr)
        u_full = np.zeros(t.nvars)
        u_full[np.asarray(t.free)] = ur
        Gr = np.asarray(t._stress_stiffness_dense_reduced(
            jnp.asarray(rhoE), jnp.asarray(u_full)))
        mu = scipy.linalg.eigh(Gr, Kr, eigvals_only=True)
        lam_ref = (-1.0 / mu[np.argsort(mu)])[:4]
        np.testing.assert_allclose(np.asarray(t.BLF), lam_ref, rtol=1e-8)

    def test_compliance_derivative_fd(self, sigma0):
        t = make_buckling_model(nx=14, ny=7, N=4, sigma=sigma0)
        t.initialize()
        g = t.compliance_derivative()
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(t.x)
        pert = jnp.asarray(rng.uniform(size=x0.shape))
        h = 1e-6

        def val(x):
            t.x = x
            t.initialize()
            return float(t.compliance())

        fd = (val(x0 + h * pert) - val(x0 - h * pert)) / (2 * h)
        t.x = x0
        rel = abs(float(pert @ g) - fd) / abs(fd)
        assert rel < 1e-7, rel

    def test_ks_buckling_derivative_fd(self, sigma0):
        t = make_buckling_model(nx=14, ny=7, N=4, sigma=sigma0)
        t.initialize()
        g = t.eval_ks_buckling_derivative(ks_rho=100.0)
        rng = np.random.default_rng(1)
        x0 = jnp.asarray(t.x)
        pert = jnp.asarray(rng.uniform(size=x0.shape))
        h = 1e-6

        def val(x):
            t.x = x
            t.initialize()
            return float(t.eval_ks_buckling(ks_rho=100.0))

        fd = (val(x0 + h * pert) - val(x0 - h * pert)) / (2 * h)
        t.x = x0
        rel = abs(float(pert @ g) - fd) / abs(fd)
        assert rel < 5e-6, rel

    def test_eigenvector_aggregate_derivative_fd(self, sigma0):
        """The hardest chain: aggregate of buckling eigenvectors — exercises
        the eigenvector adjoint, the dG/du path adjoint through the static
        solve, and the filter chain together (reference :874-986)."""
        t = make_buckling_model(nx=14, ny=7, N=4, sigma=sigma0)
        t.initialize()
        node = jnp.asarray([11, 29])
        rho_agg = 1.0

        t.initialize_adjoint()
        t.add_eigenvector_aggregate_derivative(1.0, rho_agg, node)
        t.finalize_adjoint()

        rng = np.random.default_rng(2)
        x0 = jnp.asarray(t.x)
        pert = jnp.asarray(rng.uniform(size=x0.shape))
        h = 1e-6

        def val(x):
            t.x = x
            t.initialize()
            return float(t.get_eigenvector_aggregate(rho_agg, node))

        fd = (val(x0 + h * pert) - val(x0 - h * pert)) / (2 * h)
        t.x = x0
        rel = abs(float(pert @ t.xb) - fd) / abs(fd)
        assert rel < 5e-6, rel


class TestBucklingScalable:
    """The masked full-space path: stencil matvecs + BCR f32 factor with f64
    refinement — no densification anywhere (reference buckling.py:499-528 BC
    reduction and :558-562 static solve, rebuilt for scale)."""

    def test_blf_and_compliance_match_dense_path(self, sigma0):
        td = make_buckling_model(nx=14, ny=7, N=4, sigma=sigma0)
        td.initialize()
        ts = make_buckling_model(nx=14, ny=7, N=4, sigma=sigma0,
                                 factor_kind="bcr_f32")
        ts.initialize()
        np.testing.assert_allclose(np.asarray(ts.BLF), np.asarray(td.BLF),
                                   rtol=1e-8)
        assert abs(float(ts.compliance()) - float(td.compliance())) < 1e-10

    def test_aggregate_derivative_fd_scalable(self, sigma0):
        t = make_buckling_model(nx=14, ny=7, N=4, sigma=sigma0,
                                factor_kind="bcr_f32")
        t.initialize()
        node = jnp.asarray([11, 29])
        rho_agg = 1.0
        t.initialize_adjoint()
        t.add_eigenvector_aggregate_derivative(1.0, rho_agg, node)
        t.finalize_adjoint()

        rng = np.random.default_rng(2)
        x0 = jnp.asarray(t.x)
        pert = jnp.asarray(rng.uniform(size=x0.shape))
        h = 1e-6

        def val(x):
            t.x = x
            t.initialize()
            return float(t.get_eigenvector_aggregate(rho_agg, node))

        fd = (val(x0 + h * pert) - val(x0 - h * pert)) / (2 * h)
        t.x = x0
        rel = abs(float(pert @ t.xb) - fd) / abs(fd)
        assert rel < 5e-6, rel

    def test_aggregate_max_derivative_fd(self, sigma0):
        """KS-of-KS aggregate-max objective (reference buckling.py:762-819)."""
        t = make_buckling_model(nx=14, ny=7, N=4, sigma=sigma0,
                                factor_kind="bcr_f32")
        t.initialize()
        node = jnp.asarray([11, 29, 47])
        rho_agg = 20.0
        t.initialize_adjoint()
        t.add_eigenvector_aggregate_max_derivative(1.0, rho_agg, node)
        t.finalize_adjoint()

        rng = np.random.default_rng(3)
        x0 = jnp.asarray(t.x)
        pert = jnp.asarray(rng.uniform(size=x0.shape))
        h = 1e-6

        def val(x):
            t.x = x
            t.initialize()
            return float(t.get_eigenvector_aggregate_max(rho_agg, node))

        fd = (val(x0 + h * pert) - val(x0 - h * pert)) / (2 * h)
        t.x = x0
        rel = abs(float(pert @ t.xb) - fd) / abs(fd)
        assert rel < 5e-6, rel

    @pytest.mark.slow
    def test_fd_at_128x64(self):
        """Scalable-path FD parity at a grid the dense path cannot touch
        (VERDICT item 6: >= 128x64)."""
        t = make_buckling_model(nx=128, ny=64, N=4, sigma=None, m=50,
                                factor_kind="bcr_f32", lanczos_tol=1e-12)
        # estimate BLF_1 with a conservative small shift, then re-shift
        t.sigma = 1e-3
        t._build_cfg()
        t.cfg = t.cfg.__class__(**{**t.cfg.__dict__, "sigma": 1e-3})
        t.initialize()
        blf1 = float(t.BLF[0])
        t.sigma = 0.9 * blf1
        t._build_cfg()
        t.initialize()
        g = t.eval_ks_buckling_derivative(ks_rho=100.0)
        rng = np.random.default_rng(4)
        x0 = jnp.asarray(t.x)
        pert = jnp.asarray(rng.uniform(size=x0.shape))
        h = 1e-6

        def val(x):
            t.x = x
            t.initialize()
            return float(t.eval_ks_buckling(ks_rho=100.0))

        fd = (val(x0 + h * pert) - val(x0 - h * pert)) / (2 * h)
        t.x = x0
        rel = abs(float(pert @ g) - fd) / abs(fd)
        assert rel < 5e-6, rel


class TestBucklingDegenerate:
    def test_repeated_blf_correction(self):
        """Clustered-BLF degeneracy: a constructed buckling pencil with an
        exactly repeated pair; the Xi/Eta correction must keep the gradient
        of a subspace-invariant eigenvector aggregate exact (reference
        generate_adjoint_correction buckling branch, :365-383)."""
        import jax
        from eigd_tpu.ops.autodiff import EighGenConfig, eigh_gen_dense

        n, N = 40, 4
        rng = np.random.default_rng(5)
        QQ, _ = np.linalg.qr(rng.standard_normal((n, n)))
        # pencil G phi = mu K phi: build K SPD, G = K^(1/2) diag(mu) K^(1/2)
        # so the BLFs are -1/mu with BLF[1], BLF[2] numerically repeated
        # (split 1e-6 << eig_atol; an *exact* multiplicity cannot enter a
        # single-vector Krylov space — clusters are what the correction
        # handles, reference :365-383).
        mu = -1.0 / np.concatenate([
            [2.0], [3.0, 3.0 + 1e-6], [4.0], np.linspace(8.0, 60.0, n - 4)])
        w = rng.uniform(1.0, 2.0, n)
        K0 = QQ @ np.diag(w) @ QQ.T
        import scipy.linalg
        Ks = scipy.linalg.sqrtm(K0).real
        G0 = Ks @ np.diag(mu) @ Ks
        S = rng.standard_normal((n, n)) * 0.05
        S = jnp.asarray(S + S.T)  # generic symmetric direction: FD steps
        # split the repeated pair, t=0 sits exactly at the degeneracy
        v = jnp.asarray(rng.uniform(size=n))

        cfg = EighGenConfig(N=N, m=39, sigma=1.8, mode="buckling",
                            adjoint_method="sibk", adjoint_maxiter=39,
                            factor_kind="eigh", eig_atol=1e-4)

        def f(t):
            G = jnp.asarray(G0) + t * S
            lam, Phi = eigh_gen_dense(G, jnp.asarray(K0), cfg)
            # subspace-invariant over the repeated cluster (modes 1, 2)
            return jnp.sum(lam) + (v @ Phi[:, 1]) ** 2 + (v @ Phi[:, 2]) ** 2

        g = jax.grad(f)(0.0)
        h = 1e-5
        fd = (f(0.0 + h) - f(0.0 - h)) / (2 * h)
        rel = abs(float(g) - float(fd)) / abs(float(fd))
        assert rel < 1e-6, rel
