"""Structured-grid stencil operators: gather/scatter-free FE matvecs.

On TPU, the generic ``ElementOperator`` matvec (gather -> batched GEMM ->
segment_sum) is dominated by the gather/scatter lowering (measured ~100 ms
per f64 matvec at a 512x256 grid vs ~3 ms of useful data movement). On the
regular grids of every example problem, the assembled operator is a 9-point
nodal stencil with (ndof, ndof) coupling blocks, so the matvec can be nine
shifted elementwise block-products on an (nx+1, ny+1, ndof) grid layout —
pure VPU work at memory bandwidth, no gather anywhere. This is the
TPU-native answer to the reference's CSR matvec (natural_frequency.py:
157-158), following the structured-stencil guidance of the TPU programming
guide.

The stencil is *assembled from the element matrices with 16 static
slice-adds* (one per corner pair), so the whole build is differentiable and
XLA-fusable; the element matrices are kept alongside for the factorization
path (grid_block_tridiag) and ``to_dense``.

Node layout matches fem.model.make_grid: node(i, j) = i*(ny+1) + j, element
e = i + nx*j with corners [(i,j), (i+1,j), (i+1,j+1), (i,j+1)].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# corner -> (di, dj) within the element
_CORNERS = ((0, 0), (1, 0), (1, 1), (0, 1))


def stencil_from_elements(emats, nx, ny, ndof):
    """Element matrices -> nodal stencil W (nx+1, ny+1, 3, 3, ndof, ndof).

    W[i, j, 1+di, 1+dj] is the coupling block from node (i+di, j+dj) onto
    node (i, j). emats is (nx*ny, 4*ndof, 4*ndof) in e = i + nx*j order.
    """
    d4 = 4 * ndof
    Ke = emats.reshape(ny, nx, d4, d4).transpose(1, 0, 2, 3)  # (nx, ny, ., .)
    W = jnp.zeros((nx + 1, ny + 1, 3, 3, ndof, ndof), dtype=emats.dtype)
    for a, (ai, aj) in enumerate(_CORNERS):
        for b, (bi, bj) in enumerate(_CORNERS):
            blk = Ke[:, :, ndof * a: ndof * (a + 1),
                     ndof * b: ndof * (b + 1)]
            W = W.at[ai: ai + nx, aj: aj + ny,
                     1 + bi - ai, 1 + bj - aj].add(blk)
    return W


@partial(jax.jit, static_argnums=(2, 3, 4))
def stencil_matvec(W, x, nx, ny, ndof):
    """y = A x with the 9-point block stencil; x is (n,) or (n, k).

    The (ndof, ndof) block products are unrolled into explicit broadcasted
    multiply-adds: XLA's f64-emulation of small batched einsums is
    pathologically slow on TPU (measured ~20x), while plain elementwise
    f64 ops lower well.

    jit-wrapped (inlined by XLA when called inside an enclosing jit) so the
    ~170-indexing-op body is traced once per (shape, dtype) signature
    instead of at every V-cycle trace site — the smoother unrolls mean a
    single enclosing solve traces this function dozens of times, and the
    fancy-indexing trace cost (~70 ms each) dominated suite/compile wall
    time before caching.
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    k = x.shape[1]
    xg = x.reshape(nx + 1, ny + 1, ndof, k)
    xp = jnp.pad(xg, ((1, 1), (1, 1), (0, 0), (0, 0)))
    shifts = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            shifts.append((W[:, :, 1 + di, 1 + dj],
                           xp[1 + di: 2 + di + nx, 1 + dj: 2 + dj + ny]))
    rows = []
    for a in range(ndof):
        acc = None
        for Ws, xs in shifts:
            for bdof in range(ndof):
                t = Ws[:, :, a, bdof, None] * xs[:, :, bdof, :]
                acc = t if acc is None else acc + t
        rows.append(acc)
    y = jnp.stack(rows, axis=2)
    out = y.reshape((nx + 1) * (ny + 1) * ndof, k)
    if squeeze:
        out = out[:, 0]
    return out


@jax.tree_util.register_pytree_node_class
class GridStencilOperator:
    """FE operator on a regular grid: stencil matvec + element-matrix view.

    Drop-in replacement for ElementOperator on grid problems; ``mats``/
    ``dofs`` are retained so the block-tridiagonal factor builders and
    ``to_dense`` keep working unchanged.
    """

    def __init__(self, mats, dofs, n, W, grid_shape, ndof=2, extra_diag=None,
                 Wps=None, Wdd=None, interpret=False):
        self.mats = mats  # (nelems, d, d) element matrices
        self.dofs = dofs  # (nelems, d) global DOF map
        self.n = n
        self.W = W  # (nx+1, ny+1, 3, 3, ndof, ndof), extra_diag folded in
        self.grid_shape = tuple(grid_shape)
        self.ndof = ndof
        # kept separately so factor builders working from the element
        # matrices can re-apply it (e.g. unit diagonal on Dirichlet DOFs)
        self.extra_diag = extra_diag
        # Optional Pallas split-plane forms (see with_pallas)
        self.Wps = Wps  # f32 planes for f32 matvecs
        self.Wdd = Wdd  # Dekker-split planes for dd f64 matvecs
        self.interpret = interpret

    @classmethod
    def from_element_operator(cls, op, grid_shape, ndof=2, extra_diag=None):
        nx, ny = grid_shape
        W = stencil_from_elements(op.mats, nx, ny, ndof)
        if extra_diag is not None:
            dg = extra_diag.reshape(nx + 1, ny + 1, ndof)
            for d in range(ndof):
                W = W.at[:, :, 1, 1, d, d].add(dg[:, :, d])
        return cls(op.mats, op.dofs, op.n, W, grid_shape, ndof,
                   extra_diag=extra_diag)

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return self.W.dtype

    def with_pallas(self, interpret=False):
        """Copy of the operator carrying Pallas split-plane stencil forms.

        ``mv`` then dispatches f64 inputs to the compensated double-float
        kernel (pallas_stencil.dd_stencil_matvec, ~1e-11 relative backward
        error at f32 VPU rate vs XLA's software-emulated f64 — measured
        21.9 ms -> 1.4 ms per k=8 matvec at 1M DOF) and f32 inputs to the
        f32 plane kernel. Applied at the SOLVER boundary only
        (ops/autodiff._pallas_ops): the differentiable assemble path (the
        ``bilinear`` closures in the eigh_gen VJPs) re-assembles plain
        operators, so jax.grad never traces a pallas_call.
        """
        from .pallas_stencil import stencil_planes, stencil_planes_dd

        Wps = stencil_planes(self.W, self.ndof)
        Wdd = (stencil_planes_dd(self.W, self.ndof)
               if self.W.dtype == jnp.float64 else None)
        return GridStencilOperator(self.mats, self.dofs, self.n, self.W,
                                   self.grid_shape, self.ndof,
                                   extra_diag=self.extra_diag, Wps=Wps,
                                   Wdd=Wdd, interpret=interpret)

    def mv(self, x):
        nx, ny = self.grid_shape
        if self.Wdd is not None and x.dtype == jnp.float64:
            from .pallas_stencil import dd_stencil_matvec

            xb = x[:, None] if x.ndim == 1 else x
            out = dd_stencil_matvec(self.Wdd, xb, nx, ny, self.ndof,
                                    interpret=self.interpret)
            return out[:, 0] if x.ndim == 1 else out
        if self.Wps is not None and x.dtype == jnp.float32:
            from .pallas_stencil import pallas_stencil_matvec

            return pallas_stencil_matvec(self.Wps, x, nx, ny, self.ndof,
                                         interpret=self.interpret)
        return stencil_matvec(self.W, x, nx, ny, self.ndof)

    def __call__(self, x):
        return self.mv(x)

    def to_dense(self):
        out = jnp.zeros((self.n, self.n), dtype=self.mats.dtype)
        out = out.at[self.dofs[:, :, None],
                     self.dofs[:, None, :]].add(self.mats)
        if self.extra_diag is not None:
            out = out + jnp.diag(self.extra_diag)
        return out

    def tree_flatten(self):
        return (self.mats, self.dofs, self.W, self.extra_diag, self.Wps,
                self.Wdd), (self.n, self.grid_shape, self.ndof,
                            self.interpret)

    @classmethod
    def tree_unflatten(cls, aux, children):
        mats, dofs, W, extra_diag, Wps, Wdd = children
        n, grid_shape, ndof, interpret = aux
        return cls(mats, dofs, n, W, grid_shape, ndof, extra_diag=extra_diag,
                   Wps=Wps, Wdd=Wdd, interpret=interpret)
