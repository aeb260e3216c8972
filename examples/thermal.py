"""Thermal example driver.

Mirror of the reference's examples/thermal.py __main__ (:1619-1725): the
repeated-eigenvalue epsilon sweep and the transient KS verification.

    python examples/thermal.py [sweep|transient]
"""

import sys

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from eigd_tpu.models.thermal import ThermalOpt, make_model, make_opt_model  # noqa: E402


def run_sweep():
    """Domain-asymmetry sweep: distinct -> numerically repeated eigenvalues."""
    for epsilon in (0.1, 1e-6, 1e-8):
        print(f"\n=== epsilon = {epsilon} ===")
        np.random.seed(2)
        topo = make_opt_model(nx=16, epsilon=epsilon, N=5, Ntarget=5)
        topo.initialize(store=True)
        print("eigenvalues:", np.asarray(topo.lam)[: topo.N])

        node = jnp.asarray([7, 31])
        topo.initialize_adjoint()
        topo.add_eigenvector_aggregate_derivative(1.0, 2.0, node)
        topo.finalize_adjoint()
        print("||xb|| =", float(jnp.linalg.norm(topo.xb)))


def run_transient():
    np.random.seed(0)
    factor_kind = "dense"
    for cand in ("mg", "bcr_f32"):
        if cand in sys.argv:
            factor_kind = cand
            break
    topo = make_model(nx=16, ny=16, Ly=1.1, N=6, factor_kind=factor_kind)
    heat = {"case": {"center": lambda t: 1.0 + 0.5 * jnp.sin(4.0 * t)}}
    opt = ThermalOpt(topo, heat, nsteps=100, tfinal=2.0)
    opt.test_ks_func(rho_ks=10.0)


if __name__ == "__main__":
    if "transient" in sys.argv:
        run_transient()
    else:
        run_sweep()
