"""Natural-frequency example driver.

CLI mirror of the reference's examples/natural_frequency.py __main__
(:991-1049): pick the adjoint method from argv, run the KS-min-frequency
derivative verification, optionally plot.

    python examples/natural_frequency.py [sibk|laa|pcpg|pgmres] [nx ny]
                                        [mg|bcr_f32|blocktridiag|dense]
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from eigd_tpu.models.natural_frequency import MinFreqOpt, make_model  # noqa: E402


def main():
    np.random.seed(0)
    method = "sibk"
    for cand in ("sibk", "laa", "pcpg", "pgmres"):
        if cand in sys.argv:
            method = cand
    nx, ny = 32, 16
    args = [a for a in sys.argv[1:] if a.isdigit()]
    if len(args) >= 2:
        nx, ny = int(args[0]), int(args[1])
    factor_kind = "dense"
    for cand in ("mg", "bcr_f32", "bcr", "blocktridiag", "blocktridiag_f32"):
        if cand in sys.argv:
            factor_kind = cand
            break

    print(f"method = {method}, grid = {nx}x{ny}, factor = {factor_kind}")
    topo = make_model(nx=nx, ny=ny, Lx=2.0, Ly=1.0, N=6,
                      adjoint_method=method, factor_kind=factor_kind,
                      lanczos_tol=(1e-12 if factor_kind != "dense" else None))
    opt = MinFreqOpt(topo)
    data = opt.test_ks_func()

    if "plot" in sys.argv:
        from eigd_tpu.utils.plot import plot_field, plot_mode

        plot_field(topo.X, topo.conn, np.asarray(topo.rho),
                   path="natural_frequency_design.png")
        plot_mode(topo.X, topo.conn, np.asarray(topo.rho),
                  np.asarray(topo.Q[:, 0]), path="natural_frequency_mode0.png")
    return data


if __name__ == "__main__":
    main()
