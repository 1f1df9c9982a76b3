"""Device mesh construction for the count engine.

One logical axis — ``data`` — carries both roles: reads are data-parallel
across it during counting, and the k-mer key space is range-partitioned
across it during the merge (parallel.shuffle).  On a multi-host TPU slice
the same mesh spans all processes (jax.distributed), so the merge
all_to_all rides ICI within a host/slice and DCN across, chosen by XLA.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D ``data`` mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    import numpy as np

    return Mesh(np.array(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Rows sharded across the data axis (reads or table slots)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
