"""Two remaining attribution questions for the 1M step (145 ms measured,
~86 accounted: apply 56 + bqr ~25 + local/far ~5):

1. Does dynamic_update_slice on the (192, n) basis carries run in place
   inside a fori_loop (free) or copy (8.8 ms each, 4 per step)?
2. What does the hg full-basis dd_dot really cost (the linear-summary
   probes were algebraically factored by XLA down to 0.02 ms)?
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
from eigd_tpu.ops.collective import chunked_dot_f32, dd_dot  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = 1051650
    p = 8
    rows = 192
    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.standard_normal((rows, n)))
    V32 = V.astype(jnp.float32)
    w = jnp.asarray(rng.standard_normal((n, 2 * p)))

    # 1. chained in-loop dus on four carries (V, BV f64; V32, BV32 f32)
    @jax.jit
    def loop_dus(V, BV, V32, BV32, w):
        def body(t, carry):
            V, BV, V32, BV32 = carry
            lo = t * p
            blk = jax.lax.dynamic_slice_in_dim(V, lo, p, axis=0)
            nb = blk * 1.0000001 + w[:, :p].T * 1e-30
            V = jax.lax.dynamic_update_slice_in_dim(V, nb, lo + p, axis=0)
            BV = jax.lax.dynamic_update_slice_in_dim(BV, nb, lo + p, axis=0)
            V32 = jax.lax.dynamic_update_slice_in_dim(
                V32, nb.astype(jnp.float32), lo + p, axis=0)
            BV32 = jax.lax.dynamic_update_slice_in_dim(
                BV32, nb.astype(jnp.float32), lo + p, axis=0)
            return V, BV, V32, BV32

        V, BV, V32, BV32 = jax.lax.fori_loop(
            0, 22, body, (V, BV, V32, BV32))
        return jnp.sum(V[-1] * V[-1]) + jnp.sum(BV[-1] * BV[-1])

    BV = V + 1e-6
    BV32 = BV.astype(jnp.float32)
    out = loop_dus(V, BV, V32, BV32, w)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop_dus(V, BV, V32, BV32, w)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 22
    log(f"  in-loop 4x dus (+slice+cast): {dt * 1e3:.2f} ms/step")

    # 2. hg dd_dot with nonlinear summary, chained
    @jax.jit
    def loop_hg(V, w):
        def body(carry, _):
            s, acc = carry
            hg = dd_dot(V, w + s)
            v = jnp.sum(hg * hg).astype(jnp.float64)
            return (v * 1e-30, acc + v), None

        (s, acc), _ = jax.lax.scan(
            body, (jnp.float64(0.0), jnp.float64(0.0)), None, length=8)
        return acc

    out = loop_hg(V, w)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop_hg(V, w)
    jax.block_until_ready(out)
    log(f"  hg dd_dot(V(192,n), w16): {(time.perf_counter() - t0) / 8 * 1e3:.2f} ms")

    # 3. f32 far-sweep chunked dot, same harness
    @jax.jit
    def loop_cf(V32, w):
        w32 = w[:, :p].astype(jnp.float32)

        def body(carry, _):
            s, acc = carry
            h = chunked_dot_f32(V32, w32 + s)
            v = jnp.sum(h * h).astype(jnp.float64)
            return (v.astype(jnp.float32) * 1e-30, acc + v), None

        (s, acc), _ = jax.lax.scan(
            body, (jnp.float32(0.0), jnp.float64(0.0)), None, length=8)
        return acc

    out = loop_cf(V32, w)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop_cf(V32, w)
    jax.block_until_ready(out)
    log(f"  chunked_dot_f32(V32, w8): {(time.perf_counter() - t0) / 8 * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
