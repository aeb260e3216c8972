"""Buckling example driver: BLF solve + derivative verification.

Mirror of the reference's examples/buckling.py __main__ (:1412-1471).

    python examples/buckling.py [sibk|laa|pgmres]
"""

import sys

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from eigd_tpu.models.buckling import make_buckling_model

    method = "sibk"
    for cand in ("sibk", "laa", "pgmres", "pcpg"):
        if cand in sys.argv:
            method = cand

    # Pilot: locate the first BLF on a 2x-coarser mesh with a dense
    # generalized eigh (the buckling shift must sit BELOW BLF_1 — the
    # recovery map lam = f(sigma, theta) is only valid there; BLF_1 is
    # mesh-stable to ~1% here, and 0.8x adds margin). At production scale
    # the same bootstrap runs on a coarse grid instead of densifying.
    import scipy.linalg

    from eigd_tpu.fem import assembly as fem

    pilot = make_buckling_model(nx=12, ny=6, N=4, sigma=1.0)
    rho = pilot.fltr.apply(pilot.x)
    rhoE = fem.element_density(rho, pilot.conn)
    Kr = np.asarray(pilot._stiffness_dense_reduced(rhoE))
    fr = np.asarray(pilot.f)[np.asarray(pilot.free)]
    u_full = np.zeros(pilot.nvars)
    u_full[np.asarray(pilot.free)] = np.linalg.solve(Kr, fr)
    Gr = np.asarray(pilot._stress_stiffness_dense_reduced(
        jnp.asarray(rhoE), jnp.asarray(u_full)))
    mu = np.sort(scipy.linalg.eigh(Gr, Kr, eigvals_only=True))
    blf1 = float(-1.0 / mu[0])
    sigma = 0.8 * blf1
    print("coarse-mesh BLF_1 estimate:", blf1, " sigma:", sigma)

    topo = make_buckling_model(nx=24, ny=12, N=4, sigma=sigma,
                               adjoint_method=method)
    topo.initialize(store=True)
    print("BLFs:", np.asarray(topo.BLF))
    print("compliance:", float(topo.compliance()))

    # KS-of-1/BLF derivative vs FD
    g = topo.eval_ks_buckling_derivative(ks_rho=100.0)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(topo.x)
    pert = jnp.asarray(rng.uniform(size=x0.shape))
    h = 1e-6

    def val(x):
        topo.x = x
        topo.initialize()
        return float(topo.eval_ks_buckling(ks_rho=100.0))

    fd = (val(x0 + h * pert) - val(x0 - h * pert)) / (2 * h)
    topo.x = x0
    ans = float(pert @ g)
    print("%25s  %25s  %25s" % ("Answer", "FD", "FD Rel Error"))
    print("%25.15e  %25.15e  %25.15e" % (ans, fd, abs((ans - fd) / fd)))


if __name__ == "__main__":
    main()
