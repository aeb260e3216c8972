"""Device-mesh helpers.

The workload's parallel dimensions (SURVEY.md §2.4, §5.7-5.8): the element
batch (embarrassingly parallel assembly/contraction — the analog of data
parallelism) and the DOF dimension of the Lanczos basis (the analog of
sequence/tensor parallelism; B-inner products become psum-reduced tall-skinny
matmuls). Collectives ride ICI within a slice.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices=None, axis="elems"):
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))
