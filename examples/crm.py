"""Wingbox (CRM stand-in) example driver.

Mirror of the reference's examples/crm.py __main__ (:379-407): modal solve,
modal compliance, total derivative + FD check over per-component thickness.

    python examples/crm.py
"""

import sys

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from eigd_tpu.models.crm import CRM  # noqa: E402


def main():
    # default-scale wingbox (>= 10k DOF); pass "small" for a quick run
    if "small" in sys.argv:
        model = CRM(nspan=6, nchord=3, nheight=2, N=6, m=40, nribs=2)
    else:
        model = CRM(nspan=64, nchord=10, nheight=4, N=6, m=60)
    print(f"wingbox: {model.nnodes} nodes, {6 * model.nnodes} DOF "
          f"({model.nb} stations x {model.b} padded block)")
    model.initialize(store=True)
    print("natural frequencies (Hz):",
          [f"{f:.2f}" for f in model.profile["natural frequencies (Hz)"]])
    print("modal compliance:", float(model.get_modal_compliance()))

    model.initialize_adjoint()
    model.add_modal_compliance_derivative(1.0)
    model.finalize_adjoint()
    for name, g in zip(model.component_names, np.asarray(model.xb)):
        print(f"  d(compliance)/d(t_{name}) = {g:+.6e}")

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(model.x)
    pert = jnp.asarray(rng.uniform(size=x0.shape))
    h = 1e-6 * float(x0[0])

    def val(x):
        model.x = x
        model.initialize()
        return float(model.get_modal_compliance())

    fd = (val(x0 + h * pert) - val(x0 - h * pert)) / (2 * h)
    model.x = x0
    ans = float(pert @ model.xb)
    print("%25s  %25s  %25s" % ("Answer", "FD", "FD Rel Error"))
    print("%25.15e  %25.15e  %25.15e" % (ans, fd, abs((ans - fd) / fd)))

    if "plot" in sys.argv:
        paths = model.write_modes(nmodes=3)
        print("mode shapes written:", paths)


if __name__ == "__main__":
    main()
