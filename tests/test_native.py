"""Native host-kernel tests (C++ grid-hash neighbors, welding, RCM)."""

import numpy as np
import pytest

from eigd_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


class TestRadiusNeighbors:
    def test_matches_kdtree(self):
        from scipy import spatial

        rng = np.random.default_rng(0)
        X = rng.uniform(size=(300, 2))
        r0 = 0.15
        idx, wts = native.radius_neighbors_ell(X, r0)
        tree = spatial.KDTree(X)
        for i in range(0, 300, 17):
            ref = sorted(tree.query_ball_point(X[i], r0))
            mine = sorted(idx[i][wts[i] > 0].tolist())
            # self node has weight 0 only if exactly at distance r0; normally
            # weight (r0-0)/sum > 0, so compare sets including self
            assert mine == ref, (i, mine, ref)
        # weights normalized
        np.testing.assert_allclose(wts.sum(axis=1), 1.0, atol=1e-12)

    def test_filter_equivalence(self):
        """NodeFilter native path must agree with the KDTree path."""
        import jax.numpy as jnp

        from eigd_tpu.fem.filter import NodeFilter, _spatial_weights
        from eigd_tpu.fem.model import make_grid

        mesh = make_grid(10, 8, 1.0, 1.0)
        fltr = NodeFilter(mesh.conn, mesh.X, r0=0.2)
        # force the scipy path with kmax hint
        idx2, wts2 = _spatial_weights(mesh.X, 0.2, kmax=fltr.idx.shape[1])
        x = jnp.asarray(np.random.default_rng(1).uniform(
            size=fltr.num_design_vars))
        rho1 = np.asarray(fltr.apply(x))
        rho2 = np.asarray(jnp.sum(wts2 * x[idx2], axis=1))
        np.testing.assert_allclose(rho1, rho2, atol=1e-12)


class TestWeld:
    def test_weld_duplicates(self):
        rng = np.random.default_rng(2)
        base = rng.uniform(size=(50, 3))
        X = np.concatenate([base, base[:20] + 1e-12], axis=0)
        labels, nunique = native.weld_nodes(X, tol=1e-9)
        assert nunique == 50
        np.testing.assert_array_equal(labels[50:], labels[:20])


class TestRCM:
    def test_band_reduction_on_shuffled_grid(self):
        from eigd_tpu.fem.model import make_grid
        from scipy import sparse

        mesh = make_grid(20, 20, 1.0, 1.0)
        n = mesh.nnodes
        # adjacency from element connectivity
        conn = mesh.conn
        rows, cols = [], []
        for e in range(conn.shape[0]):
            for a in conn[e]:
                for b in conn[e]:
                    if a != b:
                        rows.append(a)
                        cols.append(b)
        A = sparse.coo_matrix((np.ones(len(rows)), (rows, cols)),
                              shape=(n, n)).tocsr()
        # shuffle to destroy the natural banded ordering
        rng = np.random.default_rng(3)
        p = rng.permutation(n)
        Ashuf = A[p][:, p].tocsr()

        def bandwidth(M):
            coo = M.tocoo()
            return int(np.abs(coo.row - coo.col).max())

        perm = native.rcm_ordering(Ashuf.indptr, Ashuf.indices)
        Aperm = Ashuf[perm][:, perm].tocsr()
        assert bandwidth(Aperm) < bandwidth(Ashuf) / 3
