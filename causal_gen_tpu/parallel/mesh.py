"""Device mesh + sharding utilities.

No reference counterpart: the reference is strictly single-process single-GPU
(SURVEY.md §2 parallelism inventory). This module provides the TPU-native
scaling substrate: a (data, model) mesh, batch sharding over the 'data' axis
(per-sample independence holds everywhere in the ELBO, reference
vae.py:439-458), and parameter sharding rules that put the widest HVAE conv
channel dims on the 'model' axis. XLA inserts the psum/all-gather collectives
over ICI from the sharding annotations.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axes: Tuple[str, ...] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    assert int(np.prod(shape)) == len(devices), (shape, len(devices))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh, batch_dim: int = 0, axis: str = "data") -> NamedSharding:
    spec = [None] * (batch_dim + 1)
    spec[batch_dim] = axis
    return NamedSharding(mesh, P(*spec))


def shard_batch(
    mesh: Mesh, batch: Dict[str, Any], batch_dim: int = 0, axis: str = "data"
) -> Dict[str, Any]:
    sh = batch_sharding(mesh, batch_dim, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def param_partition_spec(path: Tuple, leaf, min_size_for_tp: int = 256) -> P:
    """Heuristic tensor-parallel spec: shard conv/dense kernels' output-channel
    dim over 'model' when wide enough to split evenly; replicate the rest.

    The HVAE's widest stages reach 1024 channels (reference hps.py:54); those
    matmul-heavy 1x1 convs are the only tensors worth sharding (SURVEY.md §2
    TP row).
    """
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if name == "kernel" and leaf.ndim >= 2 and leaf.shape[-1] >= min_size_for_tp:
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def shard_params_tp(params: Any, mesh: Mesh, min_size_for_tp: int = 256) -> Any:
    """Apply tensor-parallel parameter placement on a mesh with a 'model' axis."""
    if "model" not in mesh.axis_names:
        return replicate(params, mesh)
    n_model = mesh.shape["model"]

    def place(path, leaf):
        spec = param_partition_spec(path, leaf, min_size_for_tp)
        if spec != P() and leaf.shape[-1] % n_model != 0:
            spec = P()  # uneven split: replicate
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
