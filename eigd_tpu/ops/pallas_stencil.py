"""Pallas TPU kernel for the 9-point block-stencil matvec.

The stencil matvec is the innermost op of the multigrid factor (smoother,
residuals, coarse transfers all reduce to it): a V-cycle runs ~10 of them
and a full factor apply ~20 V-cycles, so its speed bounds the whole
shift-invert pipeline. The XLA lowering of the shifted-multiply form runs
at ~43 ms per f32 k=8 matvec at 1M DOF — an order of magnitude above the
~2 ms of memory traffic — because the (ndof, k) minor dims waste VPU lanes
and the +-1 grid shifts defeat fusion.

This kernel controls both. Data layout:
  x  : (C, X, Y) f32 channel planes, C = ndof*k — the large grid dims own
       the (sublane, lane) tiles, so every vector op runs on full tiles
  W  : (9, ndof, ndof, X, Y) f32 stencil planes, t = 3*(di+1) + (dj+1)
Grid over row tiles of TX rows. Row (di) halos are handled by passing
three row-shifted views of the (row-padded) input — each view's blocks are
aligned and non-overlapping, so plain BlockSpecs express them. Column (dj)
shifts are lane rolls with an edge mask — single vector ops instead of
XLA's relayout copies.

Used for f32 (the V-cycle/smoother dtype). The f64 residual matvec stays
on the XLA path (measured 16 ms at 1M DOF — not the bottleneck).

STATUS (r2): LIVE on the solve path. The round-1 Mosaic failure ("failed to
legalize operation 'func.return'") was diagnosed to the index maps, not the
kernel: under jax_enable_x64 a Python-int 0 in a BlockSpec index map traces
as i64 and Mosaic cannot legalize the mixed (i64, i32, i64) return. With
i32 constants the kernel compiles and runs on the v5e AOT toolchain.
Measured at 1M DOF (k=8, f32): 1.4 ms/matvec vs 46.5 ms for the XLA
shifted-multiply lowering — 33x, within ~5x of raw HBM traffic.
``GridMGFactor`` uses the plane-layout entry points below for its V-cycle
(vcycle="pallas"); the vector-layout ``pallas_stencil_matvec`` remains for
tests and standalone use.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stencil_planes(W, ndof):
    """Old-layout stencil (X, Y, 3, 3, ndof, ndof) -> (9*ndof*ndof, X, Y)
    planes for the kernel, plane index t = (3*(di+1) + (dj+1))*ndof^2 +
    a*ndof + b (build-time, one transpose)."""
    Wp = jnp.transpose(W, (2, 3, 4, 5, 0, 1))
    s = Wp.shape
    return Wp.reshape(9 * ndof * ndof, s[4], s[5]).astype(jnp.float32)


def _kernel(xm_ref, x0_ref, xp_ref, w_ref, o_ref, *, ndof, k, Y):
    """One row tile. xm/x0/xp: (C, TX, Y+2) row-shifted input slabs with a
    zero column halo (di = -1 / 0 / +1); w: (9*ndof*ndof, TX, Y);
    o: (C, TX, Y)."""
    refs = {-1: xm_ref, 0: x0_ref, 1: xp_ref}
    acc = [None] * ndof
    for di in (-1, 0, 1):
        xr = refs[di]
        for b in range(ndof):
            xb0 = xr[pl.ds(b * k, k), :, :]  # (k, TX, Y+2)
            for dj in (-1, 0, 1):
                # static lane-offset slice selects columns j+dj of the
                # zero-padded slab
                xb = xb0[:, :, 1 + dj: 1 + dj + Y]
                for a in range(ndof):
                    t = (3 * (di + 1) + (dj + 1)) * ndof * ndof + a * ndof + b
                    term = w_ref[t, :, :][None, :, :] * xb
                    if acc[a] is None:
                        acc[a] = term
                    else:
                        acc[a] = acc[a] + term
    for a in range(ndof):
        o_ref[pl.ds(a * k, k), :, :] = acc[a]


def to_planes(x, nx, ny, ndof):
    """(n, k) vector layout -> (ndof, k, X, Y) channel planes."""
    X, Y = nx + 1, ny + 1
    k = x.shape[1]
    return x.reshape(X, Y, ndof, k).transpose(2, 3, 0, 1)


def from_planes(xq, nx, ny, ndof):
    """(ndof, k, X, Y) channel planes -> (n, k) vector layout."""
    X, Y = nx + 1, ny + 1
    k = xq.shape[1]
    return xq.transpose(2, 3, 0, 1).reshape(X * Y * ndof, k)


def matvec_planes(Wp, xq, nx, ny, ndof, TX=8, interpret=False):
    """y = A x entirely in channel-plane layout: xq and the result are
    (ndof, k, X, Y) f32. The layout GridMGFactor's pallas V-cycle keeps
    across smoother/transfer/AXPY steps, so the (X, Y, ndof, k) transposes
    happen once per V-cycle entry/exit instead of once per matvec.

    Wp are the (9*ndof*ndof, X, Y) planes from ``stencil_planes``.
    TX=8 (one f32 sublane tile) measured fastest at 1M DOF; larger TX
    values hit VMEM double-buffering limits.

    interpret=True (CPU/CI) routes through a module-level jitted
    implementation so the interpreter lowering is cached per shape instead
    of re-lowered at every call site — a full eigh_gen gradient program
    inlines ~20+ stencil sites and interpret lowering costs ~0.5 s each
    (measured: 8.8 s -> 1.6 s for 20 sites). On TPU the call stays inline
    (a nested pjit boundary would pin the pad/slice layout conversions).
    """
    if interpret:
        return _matvec_planes_jit(Wp, xq, nx, ny, ndof, TX, True)
    return _matvec_planes_impl(Wp, xq, nx, ny, ndof, TX, False)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _matvec_planes_jit(Wp, xq, nx, ny, ndof, TX, interpret):
    return _matvec_planes_impl(Wp, xq, nx, ny, ndof, TX, interpret)


def _matvec_planes_impl(Wp, xq, nx, ny, ndof, TX, interpret):
    k = xq.shape[1]
    X, Y = nx + 1, ny + 1
    XR = -(-X // TX) * TX  # rows padded up to the tile
    C = ndof * k

    # padded with one halo row AND one halo column on each side plus
    # row-tile alignment; three row-shifted views then give each program
    # its di = -1/0/+1 slabs with aligned blocks, and the column halo turns
    # the dj shifts into static in-VMEM slices.
    xpad = jnp.pad(xq.reshape(C, X, Y), ((0, 0), (1, 1 + XR - X), (1, 1)))
    x_m1 = xpad[:, 0:XR, :]
    x_0 = xpad[:, 1:1 + XR, :]
    x_p1 = xpad[:, 2:2 + XR, :]
    Wpp = jnp.pad(Wp, ((0, 0), (0, XR - X), (0, 0)))

    ntiles = XR // TX
    kern = functools.partial(_kernel, ndof=ndof, k=k, Y=Y)
    # Index-map constants must be i32: under jax_enable_x64 a Python-int 0
    # traces as i64 and Mosaic fails to legalize the mixed (i64, i32, i64)
    # func.return of the index map (measured on the v5e AOT toolchain).
    imap = lambda i: (jnp.int32(0), i, jnp.int32(0))  # noqa: E731
    y = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((C, TX, Y + 2), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, TX, Y + 2), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, TX, Y + 2), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * ndof * ndof, TX, Y), imap,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, TX, Y), imap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, XR, Y), jnp.float32),
        interpret=interpret,
    )(x_m1, x_0, x_p1, Wpp)

    return y[:, :X, :].reshape(ndof, k, X, Y)


def pallas_stencil_matvec(Wp, x, nx, ny, ndof, TX=8, interpret=False):
    """y = A x using the Pallas kernel; x is (n,) or (n, k) f32.

    Vector-layout convenience wrapper around ``matvec_planes``; Wp are the
    (9*ndof*ndof, X, Y) planes from ``stencil_planes``.
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    xq = to_planes(x, nx, ny, ndof)
    out = from_planes(matvec_planes(Wp, xq, nx, ny, ndof, TX=TX,
                                    interpret=interpret), nx, ny, ndof)
    if squeeze:
        out = out[:, 0]
    return out


# ---------------------------------------------------------------------------
# Double-float (dd) stencil matvec: f64-quality residuals at f32 VPU rate
# ---------------------------------------------------------------------------
#
# XLA:TPU emulates every f64 elementwise op in software; the f64 stencil
# matvec (the residual of GridMGFactor's outer PCG and the refinement
# operator of RefinedFactor) measures 21.9 ms at 1M DOF k=8 — the largest
# single term of a factor apply once the V-cycle runs on the f32 kernel.
# This kernel computes the same product to ~1e-13 backward error with pure
# f32 VPU arithmetic:
#
# * W64 is pre-split at build (``stencil_planes_dd``) into three f32 plane
#   sets: W1 + W2 = f32(W64) with 12-bit mantissa halves (Dekker split, so
#   products with 12-bit operands are EXACT in f32) and Wl = f32(W64 -
#   f32(W64)).
# * x is split per call into xh1 + xh2 = f32(x) (12-bit halves) and
#   xl = f32(x - f32(x)).
# * Per stencil term the kernel forms the four EXACT half products (12-bit
#   x 12-bit mantissas) plus the two small cross terms with the low parts,
#   and accumulates every product into a running compensated (s, c) f32
#   pair — one branch-free 2Sum each. The kernel returns BOTH planes; the
#   wrapper combines them in f64, so the result carries ~1e-13 relative
#   backward error (vs 6e-8 for a plain f32 product). Plain-adding the mid
#   products before the 2Sum was measured to floor at ~1e-11, which is too
#   coarse for the rtol=1e-13 factor applies the small-scale gradient
#   checks rely on.
#
# The 2Sum algebra relies on IEEE f32 add/sub without reassociation —
# XLA/Mosaic do not reassociate float ops, same contract the Dekker-split
# dd GEMMs in ops/collective.py already depend on.


def stencil_planes_dd(W64, ndof):
    """f64 stencil -> (3*9*ndof^2, X, Y) f32 split planes [W1 | W2 | Wl]."""
    Wh = W64.astype(jnp.float32)
    c = Wh * jnp.float32(4097.0)  # 2^12 + 1 Dekker split constant
    W1 = c - (c - Wh)
    W2 = Wh - W1
    Wl = (W64 - Wh.astype(jnp.float64)).astype(jnp.float32)
    return jnp.concatenate([stencil_planes(W1, ndof),
                            stencil_planes(W2, ndof),
                            stencil_planes(Wl, ndof)], axis=0)


def _dd_kernel(xm_ref, x0_ref, xp_ref, w_ref, s_ref, c_ref, *, ndof, k, Y):
    """Compensated dd stencil matvec on one row tile.

    xm/x0/xp: (3*ndof*k, TX, Y+2) row-shifted slabs stacking [xh1 | xh2 |
    xl] along the channel dim; w: (3*9*ndof^2, TX, Y) split stencil planes;
    s/c: (ndof*k, TX, Y) compensated-sum output pair.
    """
    C = ndof * k
    NT = 9 * ndof * ndof
    refs = {-1: xm_ref, 0: x0_ref, 1: xp_ref}
    acc_s = [None] * ndof
    acc_c = [None] * ndof

    def dd_add(s, c, t):
        if s is None:
            return t, jnp.zeros_like(t)
        z = s + t
        bb = z - s
        e = (s - (z - bb)) + (t - bb)
        return z, c + e

    for di in (-1, 0, 1):
        xr = refs[di]
        for b in range(ndof):
            x1_0 = xr[pl.ds(b * k, k), :, :]            # (k, TX, Y+2)
            x2_0 = xr[pl.ds(C + b * k, k), :, :]
            xl_0 = xr[pl.ds(2 * C + b * k, k), :, :]
            for dj in (-1, 0, 1):
                sl = slice(1 + dj, 1 + dj + Y)
                x1 = x1_0[:, :, sl]
                x2 = x2_0[:, :, sl]
                xl = xl_0[:, :, sl]
                xh = x1 + x2  # exact: the halves recombine without rounding
                for a in range(ndof):
                    t = (3 * (di + 1) + (dj + 1)) * ndof * ndof + a * ndof + b
                    w1 = w_ref[t, :, :][None, :, :]
                    w2 = w_ref[NT + t, :, :][None, :, :]
                    wl = w_ref[2 * NT + t, :, :][None, :, :]
                    # four exact half products (12-bit x 12-bit mantissas);
                    # the low cross terms round at ~eps32^2 of the term, so
                    # their plain add is harmless — every other product
                    # goes through its own 2Sum
                    terms = (w1 * x1, w1 * x2, w2 * x1, w2 * x2,
                             (w1 + w2) * xl + wl * xh)
                    for tm in terms:
                        acc_s[a], acc_c[a] = dd_add(acc_s[a], acc_c[a], tm)
    for a in range(ndof):
        s_ref[pl.ds(a * k, k), :, :] = acc_s[a]
        c_ref[pl.ds(a * k, k), :, :] = acc_c[a]


def dd_stencil_matvec(Wdd, x, nx, ny, ndof, TX=8, interpret=False):
    """y = A x with A's f64 stencil pre-split by ``stencil_planes_dd``;
    x is (n, k) f64, the result is f64 with ~1e-11 relative backward error.

    k is capped at 4 per kernel call (VMEM: the slabs carry 3 split
    components and the output is an (s, c) pair; k=8 measured 18.2 MB of
    scoped VMEM at 1M DOF — over the 16 MB limit); larger blocks are
    processed in column chunks.
    """
    k = x.shape[1]
    if k > 4:
        return jnp.concatenate(
            [dd_stencil_matvec(Wdd, x[:, i:i + 4], nx, ny, ndof, TX=TX,
                               interpret=interpret)
             for i in range(0, k, 4)], axis=1)
    if interpret:  # cache the interpreter lowering (see matvec_planes)
        return _dd_stencil_matvec_jit(Wdd, x, nx, ny, ndof, TX, True)
    return _dd_stencil_matvec_impl(Wdd, x, nx, ny, ndof, TX, False)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _dd_stencil_matvec_jit(Wdd, x, nx, ny, ndof, TX, interpret):
    return _dd_stencil_matvec_impl(Wdd, x, nx, ny, ndof, TX, interpret)


def _dd_stencil_matvec_impl(Wdd, x, nx, ny, ndof, TX, interpret):
    k = x.shape[1]
    X, Y = nx + 1, ny + 1
    XR = -(-X // TX) * TX
    C = ndof * k

    xh = x.astype(jnp.float32)
    cs = xh * jnp.float32(4097.0)
    x1 = cs - (cs - xh)
    x2 = xh - x1
    xl = (x - xh.astype(jnp.float64)).astype(jnp.float32)
    # stacked split slabs (3C, X, Y), then padded like the f32 kernel
    xq = jnp.concatenate(
        [to_planes(x1, nx, ny, ndof).reshape(C, X, Y),
         to_planes(x2, nx, ny, ndof).reshape(C, X, Y),
         to_planes(xl, nx, ny, ndof).reshape(C, X, Y)], axis=0)
    xpad = jnp.pad(xq, ((0, 0), (1, 1 + XR - X), (1, 1)))
    x_m1 = xpad[:, 0:XR, :]
    x_0 = xpad[:, 1:1 + XR, :]
    x_p1 = xpad[:, 2:2 + XR, :]
    Wpp = jnp.pad(Wdd, ((0, 0), (0, XR - X), (0, 0)))

    NT = 9 * ndof * ndof
    kern = functools.partial(_dd_kernel, ndof=ndof, k=k, Y=Y)
    imap = lambda i: (jnp.int32(0), i, jnp.int32(0))  # noqa: E731
    s, c = pl.pallas_call(
        kern,
        grid=(XR // TX,),
        in_specs=[
            pl.BlockSpec((3 * C, TX, Y + 2), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C, TX, Y + 2), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C, TX, Y + 2), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * NT, TX, Y), imap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C, TX, Y), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, TX, Y), imap, memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((C, XR, Y), jnp.float32),
                   jax.ShapeDtypeStruct((C, XR, Y), jnp.float32)],
        interpret=interpret,
    )(x_m1, x_0, x_p1, Wpp)

    yq = (s[:, :X, :].astype(jnp.float64)
          + c[:, :X, :].astype(jnp.float64)).reshape(ndof, k, X, Y)
    return from_planes(yq, nx, ny, ndof)
