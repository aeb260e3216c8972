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
