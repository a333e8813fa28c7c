"""Multi-host (multi-process) SPMD support.

No reference counterpart (strictly single-GPU, SURVEY.md §2). For pod slices:
every host calls ``initialize_multihost`` once, builds the same global mesh
over jax.devices() (all chips in the slice), loads only its shard of each
global batch (``host_shard_indices``), and assembles a globally-sharded batch
with ``make_global_batch`` — XLA's collectives ride ICI within the slice and
DCN across slices.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with TPU auto-detection (args optional on
    Cloud TPU where the runtime provides them)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def host_shard_indices(global_indices: np.ndarray) -> np.ndarray:
    """This process's contiguous slice of a global batch-index array."""
    n = len(global_indices)
    per = n // jax.process_count()
    start = jax.process_index() * per
    return global_indices[start : start + per]


def make_global_batch(
    mesh: Mesh,
    local_batch: Dict[str, np.ndarray],
    axis: str = "data",
    batch_dim: int = 0,
) -> Dict[str, jax.Array]:
    """Assemble a global jax.Array from per-host local shards
    (jax.make_array_from_process_local_data)."""
    out = {}
    for k, v in local_batch.items():
        spec = [None] * (batch_dim + 1)
        spec[batch_dim] = axis
        sharding = NamedSharding(mesh, P(*spec))
        out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out
