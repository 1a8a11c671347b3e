"""Device mesh + sharding helpers (the reference's only parallelism is DDP
data-parallel over NCCL, fruit_pipeline.py:115-118; here it becomes a
data-parallel mesh: ray batches sharded over the ``data`` axis, parameters
replicated, gradient psum emitted by the compiler from sharding annotations —
collectives ride ICI within a slice and DCN across slices)."""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray/batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


