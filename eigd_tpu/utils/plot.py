"""Plotting utilities (reference parity: density contours, mode shapes,
residual curves — natural_frequency.py:585-690, node_filter.py:219-246,
thermal.py:877-994). Matplotlib is optional; everything degrades to a no-op
if it is unavailable. Plots are not on the compute path.
"""

from __future__ import annotations

import numpy as np


def _tri(conn):
    conn = np.asarray(conn)
    nelems = conn.shape[0]
    tris = np.zeros((2 * nelems, 3), dtype=int)
    tris[:nelems] = conn[:, [0, 1, 2]]
    tris[nelems:] = conn[:, [0, 2, 3]]
    return tris


def plot_field(X, conn, field, u=None, scale=1.0, ax=None, path=None,
               **kwargs):
    """Nodal-field contour over the quad mesh (split into triangles)."""
    try:
        import matplotlib.pyplot as plt
        import matplotlib.tri as mtri
    except Exception:
        return None

    X = np.asarray(X)
    x, y = X[:, 0].copy(), X[:, 1].copy()
    if u is not None:
        u = np.asarray(u)
        x = x + scale * u[0::2]
        y = y + scale * u[1::2]
    tri_obj = mtri.Triangulation(x, y, _tri(conn))
    created = ax is None
    if created:
        fig, ax = plt.subplots()
    ax.set_aspect("equal")
    ax.tricontourf(tri_obj, np.asarray(field, dtype=float), **kwargs)
    ax.axis("off")
    if path is not None and created:
        fig.savefig(path, bbox_inches="tight", dpi=150)
        plt.close(fig)
    return ax


def plot_mode(X, conn, rho, mode_shape, k_scale=0.5, ax=None, path=None):
    """Deformed-mesh mode plot (natural_frequency.py plot_mode, :660-681)."""
    q = np.asarray(mode_shape)
    value = abs(q.max()) + abs(q.min())
    scale = k_scale / value if value > 0 else 1.0
    return plot_field(X, conn, rho, u=q, scale=scale, ax=ax, path=path,
                      levels=np.linspace(0.0, 1.0, 26), cmap="viridis",
                      extend="max")


def plot_residuals(res_list, ax=None, path=None):
    try:
        import matplotlib.pyplot as plt
    except Exception:
        return None
    created = ax is None
    if created:
        fig, ax = plt.subplots()
    ax.semilogy(np.asarray(res_list), marker="o", markersize=4)
    ax.set_xlabel("Iteration")
    ax.set_ylabel("Residual")
    if path is not None and created:
        fig.savefig(path, bbox_inches="tight", dpi=150)
        plt.close(fig)
    return ax
