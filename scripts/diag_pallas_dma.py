"""Pallas DMA structure probes at the 1M-DOF stencil shapes (TX=16):
which input stream costs the 5 ms? Variants: 1 slab only, 1 slab + W,
3 slabs + W (the real structure), and lane-tile-aligned Y (640 vs 513/515).
All bodies are trivial adds so DMA dominates.
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

import eigd_tpu  # noqa: F401, E402


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


def probe(C, XR, Yx, Yw, Yo, TX, n_slabs, with_w, NT=36):
    imap = lambda i: (jnp.int32(0), i, jnp.int32(0))  # noqa: E731

    def kern(*refs):
        xrefs = refs[:n_slabs]
        o_ref = refs[-1]
        acc = xrefs[0][:, :, :Yo]
        for r in xrefs[1:]:
            acc = acc + r[:, :, :Yo]
        if with_w:
            w_ref = refs[n_slabs]
            acc = acc + w_ref[0, :, :Yo][None, :, :]
        o_ref[...] = acc

    in_specs = [pl.BlockSpec((C, TX, Yx), imap, memory_space=pltpu.VMEM)
                for _ in range(n_slabs)]
    if with_w:
        in_specs.append(pl.BlockSpec((NT, TX, Yw), imap,
                                     memory_space=pltpu.VMEM))

    def run(*args):
        return pl.pallas_call(
            kern,
            grid=(XR // TX,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((C, TX, Yo), imap,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, XR, Yo), jnp.float32),
        )(*args)

    return run


def main():
    TX = 16
    C, XR = 16, 1040
    NT = 36
    rng = np.random.default_rng(0)

    for (Yx, Yw, Yo, tag) in ((515, 513, 513, "unaligned (real)"),
                              (640, 640, 640, "lane-aligned 640")):
        slabs = [jnp.asarray(rng.standard_normal(
            (C, XR, Yx)).astype(np.float32)) for _ in range(3)]
        W = jnp.asarray(rng.standard_normal(
            (NT, XR, Yw)).astype(np.float32))
        log(f"-- Y layout: {tag}")
        fn = probe(C, XR, Yx, Yw, Yo, TX, 1, False)
        timeit("1 slab, no W", fn, slabs[0])
        fn = probe(C, XR, Yx, Yw, Yo, TX, 1, True)
        timeit("1 slab + W", fn, slabs[0], W)
        fn = probe(C, XR, Yx, Yw, Yo, TX, 3, True)
        timeit("3 slabs + W", fn, *slabs, W)


if __name__ == "__main__":
    main()
