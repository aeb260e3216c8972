"""CPU-side validation of the TPU double-float (Dekker split) contraction
kernels against the native f64 product (ADVICE r1: the split path must be
exercised by CI even though CPU short-circuits to native f64 by default)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eigd_tpu.ops.collective import (chunked_dot_f32, dd_dot, dd_dot_rowsT,
                                     dd_mul_small, qr_tall)


@pytest.mark.parametrize("m,n,k", [(8, 5000, 3), (16, 300, 8), (1, 8192, 1)])
def test_dd_dot_split_matches_f64(m, n, k):
    rng = np.random.default_rng(0)
    # mixed magnitudes so input-rounding errors would show if mishandled
    X = jnp.asarray(rng.standard_normal((m, n)) *
                    10.0 ** rng.uniform(-6, 6, size=(m, 1)))
    w = jnp.asarray(rng.standard_normal((n, k)))
    ref = np.asarray(X) @ np.asarray(w)
    got = np.asarray(dd_dot(X, w, force_split=True))
    scale = np.linalg.norm(ref)
    assert np.linalg.norm(got - ref) / scale < 1e-12


def test_dd_dot_split_cancellation():
    # catastrophic-cancellation column: hi parts cancel, lo parts carry the
    # answer — a sign bug in the split would give O(1) relative error
    n = 4096
    rng = np.random.default_rng(1)
    a = rng.standard_normal(n)
    X = jnp.asarray(np.stack([a, -a + 1e-9 * rng.standard_normal(n)]))
    w = jnp.asarray(np.ones((n, 1)))
    ref = np.asarray(X) @ np.asarray(w)
    got = np.asarray(dd_dot(X, w, force_split=True))
    assert abs(got[0, 0] + got[1, 0] - (ref[0, 0] + ref[1, 0])) < 1e-10


@pytest.mark.parametrize("rows,n,k", [(32, 300, 8), (4, 64, 4)])
def test_dd_dot_rowsT_split_matches_f64(rows, n, k):
    rng = np.random.default_rng(2)
    R = jnp.asarray(rng.standard_normal((rows, n)) *
                    10.0 ** rng.uniform(-4, 4, size=(rows, 1)))
    h = jnp.asarray(rng.standard_normal((rows, k)))
    ref = np.asarray(R).T @ np.asarray(h)
    got = np.asarray(dd_dot_rowsT(R, h, force_split=True))
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-12


@pytest.mark.parametrize("n,p,k", [(5000, 8, 8), (300, 16, 4)])
def test_dd_mul_small_split_matches_f64(n, p, k):
    rng = np.random.default_rng(5)
    X = jnp.asarray(rng.standard_normal((n, p)) *
                    10.0 ** rng.uniform(-4, 4, size=(1, p)))
    M = jnp.asarray(rng.standard_normal((p, k)))
    ref = np.asarray(X) @ np.asarray(M)
    got = np.asarray(dd_mul_small(X, M, force_split=True))
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-12


def test_dd_dot_pair_operand_matches_f64():
    # (hi, lo) pre-split second operand == splitting the combined f64
    rng = np.random.default_rng(6)
    X = jnp.asarray(rng.standard_normal((8, 4000)))
    w = rng.standard_normal((4000, 8))
    wh = w.astype(np.float32)
    wl = (w - wh.astype(np.float64)).astype(np.float32)
    ref = np.asarray(X) @ w
    got = np.asarray(dd_dot(X, (jnp.asarray(wh), jnp.asarray(wl)),
                            force_split=True))
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-12


def test_dd_mul_small_pair_roundtrip():
    # pair in -> pair out stays f32-pair accurate vs the exact product
    rng = np.random.default_rng(7)
    X = rng.standard_normal((3000, 8))
    Xh = X.astype(np.float32)
    Xl = (X - Xh.astype(np.float64)).astype(np.float32)
    M = jnp.asarray(rng.standard_normal((8, 8)))
    ref = X @ np.asarray(M)
    s, c = dd_mul_small((jnp.asarray(Xh), jnp.asarray(Xl)), M,
                        force_split=True, out_pair=True)
    got = np.asarray(s).astype(np.float64) + np.asarray(c).astype(
        np.float64)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-12


def test_dd_dot_split_under_jit():
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.standard_normal((6, 5000)))
    w = jnp.asarray(rng.standard_normal((5000, 2)))
    f = jax.jit(lambda X, w: dd_dot(X, w, force_split=True))
    ref = np.asarray(X) @ np.asarray(w)
    got = np.asarray(f(X, w))
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-12


def test_chunked_dot_f32_accuracy():
    # f32 inputs, f64 chunk accumulation: floor ~ (chunk/128)*eps32
    rng = np.random.default_rng(4)
    n = 1 << 16
    X = jnp.asarray(rng.standard_normal((4, n)))
    w = jnp.asarray(rng.standard_normal((n, 3)))
    ref = np.asarray(X) @ np.asarray(w)
    got = np.asarray(chunked_dot_f32(X, w))
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 5e-6


def test_qr_tall_serial():
    rng = np.random.default_rng(5)
    R = jnp.asarray(rng.standard_normal((200, 5)))
    Q, r = qr_tall(R, None)
    assert np.allclose(np.asarray(Q) @ np.asarray(r), np.asarray(R),
                       atol=1e-12)
