"""Mesh construction and the two shardings this framework needs.

The model is 0.8M parameters — fully replicated everywhere — and all
parallelism is over the batch/patch axis (the "sequence axis" of this
workload, SURVEY.md §5.7). A 1-D mesh over ICI is therefore the right
topology at any slice size; the same `NamedSharding` API extends to DCN
axes without code changes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch/patch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, optimizer state, scalars)."""
    return NamedSharding(mesh, P())
