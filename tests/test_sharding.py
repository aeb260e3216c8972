"""Multi-device tests on the virtual 8-device CPU mesh (the TPU analog of
multi-node testing, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eigd_tpu.parallel import make_mesh
from eigd_tpu.parallel.sharded import (
    pad_elements,
    sharded_dense_assembler,
    sharded_element_matvec,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, jax.devices()
    return make_mesh(8, axis="elems")


def _toy_operator(seed=0, nelems=20, n=30, d=4):
    rng = np.random.default_rng(seed)
    mats = rng.standard_normal((nelems, d, d))
    mats = mats + mats.transpose(0, 2, 1)
    dofs = rng.integers(0, n, size=(nelems, d)).astype(np.int32)
    return jnp.asarray(mats), jnp.asarray(dofs), n


class TestShardedOps:
    def test_sharded_matvec_matches_serial(self, mesh):
        mats, dofs, n = _toy_operator()
        mats_p, dofs_p = pad_elements([mats, dofs], 8)
        mv = sharded_element_matvec(mesh, "elems", mats_p, dofs_p, n)
        x = jnp.asarray(np.random.default_rng(1).standard_normal(n))

        from eigd_tpu.ops.operators import ElementOperator

        ref = ElementOperator(mats, dofs, n).mv(x)
        np.testing.assert_allclose(np.asarray(mv(x)), np.asarray(ref),
                                   atol=1e-12)

    def test_sharded_assembler_matches_dense(self, mesh):
        mats, dofs, n = _toy_operator(seed=2)
        mats_p, dofs_p = pad_elements([mats, dofs], 8)
        assemble = sharded_dense_assembler(mesh, "elems", n)
        out = assemble(mats_p, dofs_p)

        from eigd_tpu.ops.operators import ElementOperator

        ref = ElementOperator(mats, dofs, n).to_dense()
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-12)

    def test_gradient_through_shard_map(self, mesh):
        """VJP flows through the sharded assembly (needed by eigh_gen bwd)."""
        mats, dofs, n = _toy_operator(seed=3)
        mats_p, dofs_p = pad_elements([mats, dofs], 8)
        assemble = sharded_dense_assembler(mesh, "elems", n)

        def f(scale):
            out = assemble(mats_p * scale, dofs_p)
            return jnp.sum(out**2)

        g = jax.grad(f)(1.0)
        h = 1e-6
        fd = (f(1.0 + h) - f(1.0 - h)) / (2 * h)
        assert abs(float(g) - float(fd)) / abs(float(fd)) < 1e-7


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        lam, Q = jax.jit(fn)(*args)
        assert np.all(np.isfinite(np.asarray(lam)))
