"""Topology-optimization density filters.

Rebuild of /root/reference/examples/node_filter.py as differentiable JAX
functions:

* **Spatial filter**: the reference builds a KDTree and a CSR weight matrix
  (:61-88). Here the neighbor lists are precomputed once on the host into a
  *padded ELL* layout (fixed ``kmax`` neighbors per node, weight-0 padding):
  the apply is then one gather + one weighted reduction — regular, static
  shapes, shardable over nodes. The transpose (``apply_gradient``, :185-217)
  falls out of JAX AD through the gather.
* **Helmholtz filter**: assembles A = C + r0^2 * ∫ B^T B and B = ∫ H H^T
  from the Q4 tables (:90-162) and applies rho = A^{-1} B x through a stored
  Cholesky factor (differentiable: triangular solves have AD rules).
* Optional tanh projection (:175-182) and design-variable maps with frozen
  (-1) entries (:166-168) both included.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.factor import CholeskyFactor
from .quad import shape_functions  # noqa: F401  (parity: same element basis)


def _spatial_weights(X, r0, kmax=None):
    """Host-side neighbor search -> padded ELL (idx, wts) arrays.

    Weight of neighbor j of node i is (r0 - dist)/sum (node_filter.py:74-83).
    Uses the native C++ grid-hash search when available (eigd_tpu.native),
    falling back to scipy's KDTree.
    """
    from .. import native

    if kmax is None and native.available():
        idx, wts = native.radius_neighbors_ell(X, r0)
        return jnp.asarray(idx), jnp.asarray(wts)

    from scipy import spatial

    tree = spatial.KDTree(X)
    neighbors = tree.query_ball_tree(tree, r0)
    if kmax is None:
        kmax = max(len(nb) for nb in neighbors)
    nnodes = X.shape[0]
    idx = np.zeros((nnodes, kmax), dtype=np.int32)
    wts = np.zeros((nnodes, kmax))
    for i, nb in enumerate(neighbors):
        nb = np.asarray(nb, dtype=np.int32)
        d = np.linalg.norm(X[i] - X[nb], axis=1)
        w = r0 - d
        w = w / np.sum(w)
        idx[i, : len(nb)] = nb
        wts[i, : len(nb)] = w
    return jnp.asarray(idx), jnp.asarray(wts)


def _helmholtz_matrices(X, conn, r0):
    """Assemble the dense Helmholtz filter matrices A (factored) and B."""
    from .quad import thermal_tables

    Xj = jnp.asarray(X)
    connj = jnp.asarray(conn)
    Be, He, detJ = thermal_tables(Xj, connj)
    nnodes = X.shape[0]
    Ce = jnp.einsum("qe,qei,qej->eij", detJ, He, He)
    Ae = Ce + r0**2 * jnp.einsum("qe,qeki,qekj->eij", detJ, Be, Be)

    def to_dense(mats):
        out = jnp.zeros((nnodes, nnodes))
        return out.at[connj[:, :, None], connj[:, None, :]].add(mats)

    return to_dense(Ae), to_dense(Ce)


class NodeFilter:
    """Density filter with the same surface as the reference NodeFilter."""

    def __init__(self, conn, X, r0=1.0, ftype="spatial", dvmap=None,
                 num_design_vars=None, beta=10.0, eta=0.5, projection=False,
                 kmax: Optional[int] = None, grid_shape=None):
        self.conn = np.asarray(conn)
        self.X = np.asarray(X)
        self.nnodes = int(self.conn.max()) + 1
        self.ftype = ftype
        self.r0 = r0
        self.beta = beta
        self.eta = eta
        self.projection = projection
        self.grid_shape = tuple(grid_shape) if grid_shape is not None else None

        if dvmap is not None and num_design_vars is not None:
            self.dvmap = jnp.asarray(np.asarray(dvmap))
            self.num_design_vars = num_design_vars
        else:
            self.dvmap = None
            self.num_design_vars = self.nnodes

        if ftype == "conv":
            # Uniform-grid spatial filter as a 2D convolution: the (r0 - d)
            # weight pattern is identical at every node, so the filter is a
            # fixed small kernel + per-node normalization (computed in-trace
            # as conv(ones), which reproduces the reference's per-node
            # normalization over in-domain neighbours, node_filter.py:74-83).
            # O(kernel^2) constants instead of O(nnodes * kmax) gather
            # tables — the form that scales to 1M+ nodes.
            if self.grid_shape is None:
                raise ValueError("ftype='conv' needs grid_shape")
            gnx, gny = self.grid_shape
            hx = (self.X[:, 0].max() - self.X[:, 0].min()) / gnx
            hy = (self.X[:, 1].max() - self.X[:, 1].min()) / gny
            rx = int(np.floor(r0 / hx))
            ry = int(np.floor(r0 / hy))
            dx = np.arange(-rx, rx + 1) * hx
            dy = np.arange(-ry, ry + 1) * hy
            d = np.sqrt(dx[:, None] ** 2 + dy[None, :] ** 2)
            ker = np.maximum(r0 - d, 0.0)
            self._kernel = jnp.asarray(ker)
            self.idx = self.wts = None
            self._chol = self._Bmat = None
        elif ftype == "spatial":
            self.idx, self.wts = _spatial_weights(self.X, r0, kmax=kmax)
            self._chol = None
            self._Bmat = None
        elif ftype == "helmholtz":
            A, Bmat = _helmholtz_matrices(self.X, self.conn, r0)
            self._chol = CholeskyFactor.from_matrix(A)
            self._Bmat = Bmat
            self.idx = self.wts = None
        else:
            raise ValueError(f"Unknown filter type {ftype!r}")

    def _conv_apply(self, xn):
        gnx, gny = self.grid_shape
        xg = xn.reshape(gnx + 1, gny + 1)
        ker = self._kernel
        kx, ky = ker.shape

        def conv(img):
            out = jax.lax.conv_general_dilated(
                img[None, None, :, :], ker[None, None, :, :],
                window_strides=(1, 1),
                padding=((kx // 2, kx // 2), (ky // 2, ky // 2)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            return out[0, 0]

        num = conv(xg)
        den = conv(jnp.ones_like(xg))
        return (num / den).reshape(-1)

    # -- pure functional core (differentiable, jittable) -------------------

    def apply(self, x):
        """x (design vars) -> rho (nodal densities)."""
        if self.dvmap is not None:
            safe = jnp.clip(self.dvmap, 0, None)
            xn = jnp.where(self.dvmap <= -1, 1.0, x[safe])
        else:
            xn = x

        if self.ftype == "spatial":
            rho = jnp.sum(self.wts * xn[self.idx], axis=1)
        elif self.ftype == "conv":
            rho = self._conv_apply(xn)
        else:
            rho = self._chol.mv(self._Bmat @ xn)

        if self.projection:
            denom = jnp.tanh(self.beta * self.eta) + jnp.tanh(
                self.beta * (1.0 - self.eta))
            rho = (jnp.tanh(self.beta * self.eta)
                   + jnp.tanh(self.beta * (rho - self.eta))) / denom
        return rho

    def apply_gradient(self, g, x=None, rho=None):
        """Chain a nodal cotangent g back to design variables — exact
        transpose of apply, obtained from JAX AD (replaces the hand-written
        reverse pass at node_filter.py:185-217)."""
        del rho
        if x is None:
            x = jnp.ones(self.num_design_vars)
        _, vjp = jax.vjp(self.apply, jnp.asarray(x))
        (gx,) = vjp(jnp.asarray(g))
        return gx
