"""Per-level timing of the Pallas V-cycle at the bench size: matvec at each
level, plane conversions, smoother, transfers, and the whole V-cycle — to
locate the measured ~10 ms/V-cycle (263k, p=8) before any kernel surgery."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(label, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    log(f"  {label}: {dt * 1e3:.3f} ms")
    return out, dt


def main():
    topo = bench.make_topo()
    x0 = jnp.asarray(topo.x)
    from eigd_tpu.fem import assembly as fem
    from eigd_tpu.ops.autodiff import staged_eigh_gen_vjp

    cfg = topo.cfg
    fwd_prog, _ = staged_eigh_gen_vjp(topo.problem, cfg, split_factor=True,
                                      chunk_forward=1)
    rho = topo.fltr.apply(x0)
    theta = fem.element_density(rho, topo.conn)
    A, B, factor, deflate, v0 = jax.block_until_ready(
        fwd_prog.build_prog(theta))

    from eigd_tpu.ops.pallas_stencil import (from_planes, matvec_planes,
                                             to_planes)
    from eigd_tpu.ops.multigrid import (cheb_smooth_planes, prolong_planes,
                                        restrict_planes)

    p = cfg.block
    ndof = factor.ndof
    rng = np.random.default_rng(0)
    log(f"levels: {factor.shapes}  degree={factor.degree}  p={p}")

    n0 = (factor.shapes[0][0] + 1) * (factor.shapes[0][1] + 1) * ndof
    Xv = jnp.asarray(rng.standard_normal((n0, p)).astype(np.float32))
    nx0, ny0 = factor.shapes[0]
    timeit("to_planes (L0)", jax.jit(
        lambda v: to_planes(v, nx0, ny0, ndof)), Xv)
    q0 = to_planes(Xv, nx0, ny0, ndof)
    timeit("from_planes (L0)", jax.jit(
        lambda q: from_planes(q, nx0, ny0, ndof)), q0)

    for lvl, (nx, ny) in enumerate(factor.shapes[:-1]):
        q = to_planes(jnp.asarray(rng.standard_normal(
            ((nx + 1) * (ny + 1) * ndof, p)).astype(np.float32)), nx, ny,
            ndof)
        Wp = factor.Wps[lvl]

        mv = jax.jit(lambda qq, Wp=Wp, nx=nx, ny=ny: matvec_planes(
            Wp, qq, nx, ny, ndof, interpret=False))
        timeit(f"matvec_planes L{lvl} ({nx}x{ny})", mv, q)

        dinvp = factor._dinv_planes(lvl)
        lmax = factor.lmaxs[lvl]
        sm = jax.jit(lambda qq, Wp=Wp, nx=nx, ny=ny, dinvp=dinvp,
                     lmax=lmax: cheb_smooth_planes(
                         lambda xq: matvec_planes(Wp, xq, nx, ny, ndof,
                                                  interpret=False),
                         dinvp, lmax, None, qq, degree=factor.degree))
        timeit(f"cheb pre-smooth L{lvl}", sm, q)
        if lvl + 1 < len(factor.shapes):
            timeit(f"restrict L{lvl}", jax.jit(
                lambda qq, nx=nx, ny=ny: restrict_planes(
                    qq, nx // 2, ny // 2)), q)
            qc = restrict_planes(q, nx // 2, ny // 2)
            timeit(f"prolong  L{lvl}", jax.jit(
                lambda qq, nx=nx, ny=ny: prolong_planes(
                    qq, nx // 2, ny // 2)), qc)

    # coarse dense
    nxc, nyc = factor.shapes[-1]
    nc = (nxc + 1) * (nyc + 1) * ndof
    bc = jnp.asarray(rng.standard_normal((nc, p)).astype(np.float32))
    timeit(f"coarse dense solve ({nc})", jax.jit(
        lambda v: factor.coarse_inv @ v), bc)

    timeit("FULL V-cycle (_apply_vcycle32)", jax.jit(
        factor._apply_vcycle32), Xv)
    timeit("f32 stencil matvec via _matvec32", jax.jit(factor._matvec32),
           Xv)


if __name__ == "__main__":
    main()
