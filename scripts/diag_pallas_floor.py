"""Isolate the Pallas stencil kernel's overhead: same grid/block structure,
progressively simpler bodies — pure copy (DMA floor), 1-tap multiply (no
lane shifts), 9-tap without dj shifts, full kernel. Locates the 4.7 ms
(TX=16, k=8, 1M DOF) between DMA, vector work, and lane rotations.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

os.environ.setdefault("EIGD_BENCH_NX", "1024")
os.environ.setdefault("EIGD_BENCH_NY", "512")

import eigd_tpu  # noqa: F401, E402
from eigd_tpu.ops import pallas_stencil as ps  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(label, fn, *args, n=8):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    float(jnp.sum(out[..., :1].astype(jnp.float64)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn_j(*args)
    float(jnp.sum(out[..., :1].astype(jnp.float64)))
    dt = (time.perf_counter() - t0) / n
    log(f"  {label}: {dt * 1e3:.2f} ms")
    return dt


def make_variant(body_kind, nx, ny, ndof, k, TX):
    X, Y = nx + 1, ny + 1
    XR = -(-X // TX) * TX
    C = ndof * k
    NT = 9 * ndof * ndof

    def kern(xm_ref, x0_ref, xp_ref, w_ref, o_ref):
        if body_kind == "copy":
            o_ref[...] = x0_ref[:C, :, 1:1 + Y]
        elif body_kind == "onetap":
            acc = [None] * ndof
            xr = x0_ref
            for b in range(ndof):
                xb = xr[pl.ds(b * k, k), :, 1:1 + Y]
                for a in range(ndof):
                    t = 4 * ndof * ndof + a * ndof + b
                    term = w_ref[t, :, :][None, :, :] * xb
                    acc[a] = term if acc[a] is None else acc[a] + term
            for a in range(ndof):
                o_ref[pl.ds(a * k, k), :, :] = acc[a]
        elif body_kind == "noshift9":
            # all 9 taps, but every tap reads the UNSHIFTED column window
            # (wrong math, same flop/byte count minus lane rotations)
            acc = [None] * ndof
            refs = {-1: xm_ref, 0: x0_ref, 1: xp_ref}
            for di in (-1, 0, 1):
                xr = refs[di]
                for b in range(ndof):
                    xb = xr[pl.ds(b * k, k), :, 1:1 + Y]
                    for dj in (-1, 0, 1):
                        for a in range(ndof):
                            t = ((3 * (di + 1) + (dj + 1)) * ndof * ndof
                                 + a * ndof + b)
                            term = w_ref[t, :, :][None, :, :] * xb
                            acc[a] = (term if acc[a] is None
                                      else acc[a] + term)
            for a in range(ndof):
                o_ref[pl.ds(a * k, k), :, :] = acc[a]

    imap = lambda i: (jnp.int32(0), i, jnp.int32(0))  # noqa: E731

    def run(Wpp, x_m1, x_0, x_p1):
        return pl.pallas_call(
            kern,
            grid=(XR // TX,),
            in_specs=[
                pl.BlockSpec((C, TX, Y + 2), imap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, TX, Y + 2), imap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, TX, Y + 2), imap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NT, TX, Y), imap, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((C, TX, Y), imap,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, XR, Y), jnp.float32),
        )(x_m1, x_0, x_p1, Wpp)

    return run


def main():
    nx, ny, ndof, k = 1024, 512, 2, 8
    TX = int(os.environ.get("TX", 16))
    X, Y = nx + 1, ny + 1
    XR = -(-X // TX) * TX
    C = ndof * k
    NT = 9 * ndof * ndof
    rng = np.random.default_rng(0)
    xpad = jnp.asarray(
        rng.standard_normal((C, XR + 2, Y + 2)).astype(np.float32))
    x_m1 = xpad[:, 0:XR, :]
    x_0 = xpad[:, 1:1 + XR, :]
    x_p1 = xpad[:, 2:2 + XR, :]
    Wpp = jnp.asarray(
        rng.standard_normal((NT, XR, Y)).astype(np.float32))

    log(f"TX={TX}, grid={XR // TX} programs")
    for kind in ("copy", "onetap", "noshift9"):
        fn = make_variant(kind, nx, ny, ndof, k, TX)
        try:
            timeit(kind, fn, Wpp, x_m1, x_0, x_p1)
        except Exception as e:
            log(f"  {kind}: FAILED {type(e).__name__}: {str(e)[:150]}")

    # full kernel via the library path for comparison (same operands)
    W64 = jnp.asarray(rng.standard_normal(
        (nx + 1, ny + 1, 3, 3, ndof, ndof)))
    Wp = ps.stencil_planes(W64, ndof)
    xq = jnp.asarray(
        rng.standard_normal((ndof, k, X, Y)).astype(np.float32))
    timeit(f"full matvec_planes TX={TX}",
           lambda Wp, xq: ps.matvec_planes(Wp, xq, nx, ny, ndof, TX=TX)[0],
           Wp, xq)


if __name__ == "__main__":
    main()
