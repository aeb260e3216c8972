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

    # pilot solve with a robust (eigh) factor to locate the first BLF
    pilot = make_buckling_model(nx=24, ny=12, N=4, sigma=1.0,
                                factor_kind="eigh")
    pilot.initialize()
    sigma = float(0.9 * pilot.BLF[0])
    print("first BLF estimate:", float(pilot.BLF[0]), " sigma:", sigma)

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
