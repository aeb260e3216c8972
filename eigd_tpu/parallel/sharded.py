"""shard_map building blocks: element-sharded assembly and matvec.

Domain decomposition over the element batch: each device owns a contiguous
shard of elements (tables, densities, DOF maps); global results are produced
with psum — the TPU-native replacement for the MPI domain decomposition that
the reference reaches only through TACS (SURVEY.md §2.3, crm.py:11,71).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map


def pad_elements(arrays, n_shards, axis=0):
    """Pad the element axis to a multiple of n_shards (zero padding; padded
    elements have zero matrices so they contribute nothing)."""
    out = []
    for a in arrays:
        n = a.shape[axis]
        pad = (-n) % n_shards
        if pad:
            widths = [(0, 0)] * a.ndim
            widths[axis] = (0, pad)
            a = jnp.pad(a, widths)
        out.append(a)
    return out


def sharded_element_matvec(mesh, axis, mats, dofs, nvars):
    """Element-sharded matvec closure: x (replicated) -> A x (replicated).

    mats (nelems, d, d) and dofs (nelems, d) are sharded over `axis`; the
    local scatter-adds are reduced with a psum over the mesh.
    """

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P()),
             out_specs=P())
    def mv(mats_l, dofs_l, x):
        xe = x[dofs_l]
        ye = jnp.einsum("eij,ej->ei", mats_l, xe)
        y = jax.ops.segment_sum(ye.reshape(-1), dofs_l.reshape(-1),
                                num_segments=nvars)
        return jax.lax.psum(y, axis)

    return lambda x: mv(mats, dofs, x)


def sharded_dense_assembler(mesh, axis, nvars):
    """Returns assemble(mats, dofs) -> dense (nvars, nvars) with the
    element-sharded scatter + psum."""

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis)),
             out_specs=P())
    def assemble(mats_l, dofs_l):
        out = jnp.zeros((nvars, nvars), dtype=mats_l.dtype)
        out = out.at[dofs_l[:, :, None], dofs_l[:, None, :]].add(mats_l)
        return jax.lax.psum(out, axis)

    return assemble
