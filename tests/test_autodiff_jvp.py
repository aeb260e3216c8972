"""Forward-mode (custom_jvp) channel tests.

The reference verifies adjoints against complex-step derivatives — an exact
forward-mode channel (eigenvector_derivatives.py:1387-1414, thermal.py:
652-661). Here the same role is played by ``eigh_gen_fwdmode`` + ``jax.jvp``:
these tests check (a) jvp-vs-vjp consistency through the natural-frequency
and thermal model chains at 1e-10 — far below what central differences can
resolve — and (b) the degenerate-pair tangent semantics against the dense
directional oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigd_tpu.fem import assembly as fem
from eigd_tpu.ops.autodiff import (EigProblem, EighGenConfig,
                                   eigh_gen, eigh_gen_fwdmode,
                                   eigh_gen_directional_oracle)


def _nf_objectives():
    """Paired reverse/forward objectives through the full NF chain."""
    from eigd_tpu.models.natural_frequency import make_model

    topo = make_model(nx=12, ny=6, Lx=2.0, Ly=1.0, N=4, rfact=2.0, m=50)

    def pre(x):
        rho = topo.fltr.apply(x)
        return fem.element_density(rho, topo.conn)

    def tail(lam, Q):
        eta = jnp.exp(-(lam - lam[0]))
        return jnp.sum(jnp.sqrt(lam)) + jnp.sum(eta[None, :] * Q[:9, :] ** 2)

    def obj_vjp(x):
        lam, Q = eigh_gen(pre(x), topo.problem, topo.cfg)
        return tail(lam, Q)

    def obj_jvp(x):
        lam, Q = eigh_gen_fwdmode(pre(x), topo.problem, topo.cfg)
        return tail(lam, Q)

    return topo, obj_vjp, obj_jvp


class TestJvpVsVjp:
    def test_nf_chain_consistency(self):
        topo, obj_vjp, obj_jvp = _nf_objectives()
        x0 = jnp.asarray(topo.x)
        pert = jnp.asarray(np.random.default_rng(3).uniform(size=x0.shape))

        g = jax.grad(obj_vjp)(x0)
        ans_vjp = float(pert @ g)
        v, ans_jvp = jax.jvp(obj_jvp, (x0,), (pert,))
        rel = abs(ans_vjp - float(ans_jvp)) / abs(ans_vjp)
        assert rel < 1e-10, (ans_vjp, float(ans_jvp), rel)
        # and the primal is identical (same solver)
        assert abs(float(v) - float(obj_vjp(x0))) < 1e-12 * abs(float(v))

    def test_thermal_chain_consistency(self):
        from eigd_tpu.models.thermal import make_model

        topo = make_model(nx=10, ny=10, Ly=1.15, N=4)
        w = jnp.sin(0.37 * jnp.arange(topo.nnodes, dtype=jnp.float64))

        def pre(x):
            rho = topo.fltr.apply(x)
            return fem.element_density(rho, topo.conn)

        def tail(lam, Q):
            f_q = w @ Q
            # mode-0 (constant mode of the pure-Neumann problem) skipped,
            # reference thermal.py:428-442
            return (jnp.sum((f_q[1:] ** 2) / lam[1:])
                    + jnp.sum(jnp.sqrt(lam[1:])))

        def obj_vjp(x):
            lam, Q = eigh_gen(pre(x), topo.problem, topo.cfg)
            return tail(lam, Q)

        def obj_jvp(x):
            lam, Q = eigh_gen_fwdmode(pre(x), topo.problem, topo.cfg)
            return tail(lam, Q)

        x0 = jnp.asarray(topo.x)
        pert = jnp.asarray(np.random.default_rng(5).uniform(size=x0.shape))
        g = jax.grad(obj_vjp)(x0)
        ans_vjp = float(pert @ g)
        _, ans_jvp = jax.jvp(obj_jvp, (x0,), (pert,))
        rel = abs(ans_vjp - float(ans_jvp)) / abs(ans_vjp)
        assert rel < 1e-10, (ans_vjp, float(ans_jvp), rel)

    def test_staged_jvp_matches_fused(self):
        """staged_jvp (two-program forward/tangent split, the 1M-DOF bench
        oracle) is bit-equivalent mathematics to jax.jvp of the fused
        objective."""
        from eigd_tpu.ops.autodiff import staged_jvp

        topo, obj_vjp, obj_jvp = _nf_objectives()

        def pre(x):
            rho = topo.fltr.apply(x)
            return fem.element_density(rho, topo.conn)

        def tail(lam, Q):
            eta = jnp.exp(-(lam - lam[0]))
            return (jnp.sum(jnp.sqrt(lam))
                    + jnp.sum(eta[None, :] * Q[:9, :] ** 2))

        x0 = jnp.asarray(topo.x)
        pert = jnp.asarray(np.random.default_rng(3).uniform(size=x0.shape))
        v_f, dv_f = jax.jvp(obj_jvp, (x0,), (pert,))
        fn = staged_jvp(pre, tail, topo.problem, topo.cfg)
        v_s, dv_s = fn(x0, pert)
        assert abs(float(v_s) - float(v_f)) <= 1e-12 * abs(float(v_f))
        assert abs(float(dv_s) - float(dv_f)) <= 1e-10 * abs(float(dv_f))

    def test_jvp_sharper_than_fd(self):
        """The jvp directional derivative agrees with central differences to
        FD truncation accuracy — i.e. it can replace the FD oracle."""
        topo, obj_vjp, obj_jvp = _nf_objectives()
        x0 = jnp.asarray(topo.x)
        pert = jnp.asarray(np.random.default_rng(7).uniform(size=x0.shape))
        _, ans_jvp = jax.jvp(obj_jvp, (x0,), (pert,))
        h = 1e-6
        fd = (float(obj_jvp(x0 + h * pert))
              - float(obj_jvp(x0 - h * pert))) / (2 * h)
        assert abs(float(ans_jvp) - fd) / abs(fd) < 1e-7


class TestBucklingForwardMode:
    """VERDICT r3 item 6: the forward-mode channel covers buckling, like the
    reference's complex-step does (buckling.py:1014-1023)."""

    def test_buckling_matches_directional_oracle(self):
        from eigd_tpu.ops.operators import DenseOperator

        rng = np.random.default_rng(17)
        n, N = 36, 3
        S = rng.standard_normal((n, n))
        K0 = S @ S.T + n * np.eye(n)
        T = rng.standard_normal((n, n)) * 0.3
        G0 = -(T @ T.T + 0.5 * np.eye(n))  # negative definite: BLFs > 0
        dK = rng.standard_normal((n, n))
        dK = 0.5 * (dK + dK.T)
        dG = rng.standard_normal((n, n)) * 0.1
        dG = 0.5 * (dG + dG.T)

        lam_o, Phi_o, dlam_o, dPhi_o = eigh_gen_directional_oracle(
            G0, K0, dG, dK, N, eig_atol=1e-5, mode="buckling")
        sigma = 0.5 * float(lam_o[0])

        problem = EigProblem(assemble=lambda t: (
            DenseOperator(jnp.asarray(G0) + t * jnp.asarray(dG)),
            DenseOperator(jnp.asarray(K0) + t * jnp.asarray(dK))))
        cfg = EighGenConfig(N=N, m=36, sigma=sigma, mode="buckling",
                            adjoint_method="sibk", adjoint_maxiter=60,
                            nrestart=3, eig_atol=1e-5)
        from eigd_tpu.ops.autodiff import eigh_gen_fwdmode as fwd

        (lam, Phi), (dlam, dPhi) = jax.jvp(
            lambda t: fwd(t, problem, cfg),
            (jnp.asarray(0.0),), (jnp.asarray(1.0),))

        np.testing.assert_allclose(np.asarray(lam), lam_o, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(dlam), dlam_o,
                                   rtol=1e-7, atol=1e-9)
        sign = np.sign(np.sum(np.asarray(Phi) * Phi_o, axis=0))
        np.testing.assert_allclose(np.asarray(dPhi) * sign[None, :], dPhi_o,
                                   atol=1e-7)

    def test_buckling_chain_jvp_vs_vjp(self):
        """jvp-vs-vjp consistency through the buckling model chain (static
        solve -> stress stiffness -> pencil eigensolve -> KS + aggregate) at
        1e-9 — replaces the central-difference floor (~1e-6)."""
        from eigd_tpu.models.buckling import (_chol_solve,
                                              make_buckling_model)
        from eigd_tpu.ops.autodiff import eigh_gen_fwdmode
        from tests.test_buckling import _pick_sigma

        t = make_buckling_model(nx=14, ny=7, N=4, sigma=_pick_sigma())

        def chain(x, eig_fn):
            rho = t.fltr.apply(x)
            rhoE = fem.element_density(rho, t.conn)
            Kr = t._stiffness_dense_reduced(rhoE)
            L = jnp.linalg.cholesky(Kr)
            fr = t.f[t.free]
            ur = _chol_solve(L, fr)
            lam, Qr = eig_fn((rhoE, ur), t.problem, t.cfg)
            eta = jnp.exp(-(lam - lam[0]))
            ks = lam[0] - jnp.log(
                jnp.sum(jnp.exp(-160.0 * (lam - lam[0])))) / 160.0
            return ks + jnp.sum(eta[None, :] * Qr[:9, :] ** 2) + fr @ ur

        x0 = jnp.asarray(t.x)
        pert = jnp.asarray(np.random.default_rng(9).uniform(size=x0.shape))
        g = jax.grad(lambda x: chain(x, eigh_gen))(x0)
        ans_vjp = float(pert @ g)
        v, ans_jvp = jax.jvp(lambda x: chain(x, eigh_gen_fwdmode),
                             (x0,), (pert,))
        rel = abs(ans_vjp - float(ans_jvp)) / abs(ans_vjp)
        assert rel < 1e-9, (ans_vjp, float(ans_jvp), rel)

    def test_solve_spd_fwdmode_matches_vjp(self):
        """Forward-mode static solve (scalable-path channel): jvp of
        solve_spd_fwdmode vs vjp of solve_spd on the buckling K-solve."""
        from eigd_tpu.models.buckling import make_buckling_model
        from eigd_tpu.ops.autodiff import solve_spd, solve_spd_fwdmode

        t = make_buckling_model(nx=10, ny=5, N=3, sigma=1.0,
                                factor_kind="bcr_f32")
        rho = t.fltr.apply(jnp.asarray(t.x))
        rhoE0 = fem.element_density(rho, t.conn)
        fm = t.f * t.free_mask
        w = jnp.cos(0.13 * jnp.arange(fm.shape[0], dtype=jnp.float64))
        drho = jnp.asarray(
            np.random.default_rng(4).uniform(size=rhoE0.shape))

        g = jax.grad(lambda r: w @ solve_spd(r, fm, t._op_K,
                                             t._K_factor))(rhoE0)
        ans_vjp = float(jnp.vdot(g, drho))
        _, du = jax.jvp(
            lambda r: solve_spd_fwdmode(r, fm, t._op_K, t._K_factor),
            (rhoE0,), (drho,))
        ans_jvp = float(w @ du)
        assert abs(ans_vjp - ans_jvp) / abs(ans_jvp) < 1e-9


class TestDegenerateTangent:
    def test_matches_directional_oracle_with_cluster(self):
        """Dense problem with an exactly repeated pair: the jvp suppresses
        the degenerate rotation and keeps the symmetric -dB/2 part, matching
        the complex-step-semantics oracle."""
        rng = np.random.default_rng(11)
        n, N = 40, 4
        Qm, _ = np.linalg.qr(rng.standard_normal((n, n)))
        w = np.concatenate([[1.0, 2.5, 2.5, 4.0],
                            np.linspace(30.0, 90.0, n - 4)])
        A0 = Qm @ np.diag(w) @ Qm.T
        S = rng.standard_normal((n, n)) * 0.02
        B0 = np.eye(n) + 0.5 * (S + S.T) + 0.1 * np.eye(n)
        dA = rng.standard_normal((n, n))
        dA = 0.5 * (dA + dA.T)
        dB = rng.standard_normal((n, n)) * 0.05
        dB = 0.5 * (dB + dB.T)

        # oracle on the generalized pencil
        lam_o, Phi_o, dlam_o, dPhi_o = eigh_gen_directional_oracle(
            A0, B0, dA, dB, N, eig_atol=1e-5)

        problem = EigProblem(assemble=lambda t: (
            jnp.asarray(A0) + t * jnp.asarray(dA),
            jnp.asarray(B0) + t * jnp.asarray(dB)))
        # import here to wrap raw arrays as operators via as_operator
        from eigd_tpu.ops.operators import DenseOperator

        problem = EigProblem(assemble=lambda t: (
            DenseOperator(jnp.asarray(A0) + t * jnp.asarray(dA)),
            DenseOperator(jnp.asarray(B0) + t * jnp.asarray(dB))))
        cfg = EighGenConfig(N=N, m=40, sigma=0.0, adjoint_method="sibk",
                            adjoint_maxiter=60, nrestart=3, eig_atol=1e-5)
        (lam, Phi), (dlam, dPhi) = jax.jvp(
            lambda t: eigh_gen_fwdmode(t, problem, cfg),
            (jnp.asarray(0.0),), (jnp.asarray(1.0),))

        np.testing.assert_allclose(np.asarray(lam), lam_o, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(dlam), dlam_o,
                                   rtol=1e-7, atol=1e-9)
        # eigenvector tangents: align signs (solver may flip columns)
        sign = np.sign(np.sum(np.asarray(Phi) * Phi_o, axis=0))
        # within the degenerate cluster the basis itself is arbitrary; check
        # the cluster-invariant quantities instead of raw columns there
        gaps = np.abs(np.diff(lam_o))
        distinct = np.ones(N, bool)
        for i in range(N - 1):
            if gaps[i] < 1e-5:
                distinct[i] = distinct[i + 1] = False
        np.testing.assert_allclose(np.asarray(dPhi)[:, distinct] * sign[
            distinct], dPhi_o[:, distinct], atol=1e-7)
        # cluster invariant: d(sum_i phi_i phi_i^T) over the cluster
        cl = ~distinct
        if np.any(cl):
            P_dot = (np.asarray(dPhi)[:, cl] @ np.asarray(Phi)[:, cl].T
                     + np.asarray(Phi)[:, cl] @ np.asarray(dPhi)[:, cl].T)
            P_dot_o = (dPhi_o[:, cl] @ Phi_o[:, cl].T
                       + Phi_o[:, cl] @ dPhi_o[:, cl].T)
            np.testing.assert_allclose(P_dot, P_dot_o, atol=1e-7)
