"""Pallas f32 stencil-matvec tile sweep at 1M DOF.

True cost (host-read-synced harness — block_until_ready is not a barrier
through the axon tunnel): 10.15 ms per k=8 matvec at TX=8, vs ~0.9 ms of
HBM traffic. The grid is 129 tiny programs; this sweeps TX (rows per
program) and k-chunking to find where launch/DMA overheads stop
dominating.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

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


def main():
    nx, ny, ndof = int(os.environ["EIGD_BENCH_NX"]), int(
        os.environ["EIGD_BENCH_NY"]), 2
    n = (nx + 1) * (ny + 1) * ndof
    rng = np.random.default_rng(0)
    W64 = jnp.asarray(rng.standard_normal(
        (nx + 1, ny + 1, 3, 3, ndof, ndof)))
    Wp = ps.stencil_planes(W64, ndof)

    for k in (8,):
        x = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
        xq = ps.to_planes(x, nx, ny, ndof)
        log(f"-- k={k} (plane layout in/out, no vector-layout transposes)")
        for TX in (8, 16, 32, 64):
            try:
                timeit(f"TX={TX}",
                       lambda Wp, xq, TX=TX: ps.matvec_planes(
                           Wp, xq, nx, ny, ndof, TX=TX)[0],
                       Wp, xq)
            except Exception as e:
                log(f"  TX={TX}: FAILED {type(e).__name__}: {str(e)[:200]}")
        # k-split halves the slab footprint per program
        for TX in (16, 32, 64):
            def split_k(Wp, xq, TX=TX):
                h1 = ps.matvec_planes(Wp, xq[:, :4], nx, ny, ndof, TX=TX)
                h2 = ps.matvec_planes(Wp, xq[:, 4:], nx, ny, ndof, TX=TX)
                return jnp.concatenate([h1, h2], axis=1)[0]

            try:
                timeit(f"TX={TX} k-split 2x4", split_k, Wp, xq)
            except Exception as e:
                log(f"  TX={TX} split: FAILED {type(e).__name__}: "
                    f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
