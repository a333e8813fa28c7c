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


def spatial_sharding(
    mesh: Mesh,
    batch_axis: str = "data",
    space_axis: str = "space",
) -> NamedSharding:
    """NHWC sharding with batch over `data` and image height over `space`.

    The reference has no sequence/context parallelism to port (no attention,
    SURVEY.md §2); its long-context analog is image resolution (§5). This is
    the TPU-native equivalent: shard conv activations spatially across the
    mesh and let GSPMD insert the halo exchanges the 3x3 convs need at shard
    boundaries. Useful from 192²+ inputs and for 3-D volumes, where a single
    chip's HBM can't hold the encoder activations; the deep low-resolution
    decoder stages (res < mesh size) are automatically gathered by XLA, which
    is the right trade — all FLOPs live in the high-res stages.
    """
    return NamedSharding(mesh, P(batch_axis, space_axis))


def shard_batch_spatial(
    mesh: Mesh,
    batch: Dict[str, Any],
    batch_dim: int = 0,
    batch_axis: str = "data",
    space_axis: str = "space",
) -> Dict[str, Any]:
    """Shard a {'x': (..., B, H, W, C), 'pa': (..., B, ctx)} batch with x
    split over (data, space) and parent vectors over data only."""
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= batch_dim + 3:  # has spatial dims
            spec = [None] * batch_dim + [batch_axis, space_axis]
            out[k] = jax.device_put(v, NamedSharding(mesh, P(*spec)))
        else:
            out[k] = jax.device_put(v, batch_sharding(mesh, batch_dim, batch_axis))
    return out


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
