"""Device-mesh utilities: the TPU-native replacement for DDP + Ray fan-out.

The reference has two distributed systems (SURVEY §2.10/§5.8): Lightning DDP
for gradient data-parallelism (NCCL) and Ray for scene-level eval/caching
fan-out. On TPU both collapse into one mechanism — shard the batch dimension
of a single jitted program over a `jax.sharding.Mesh` and let the SPMD
partitioner insert all-reduces over ICI:

- training: batch sharded over the `data` axis, params/opt-state replicated;
  gradients all-reduce automatically in the backward pass;
- evaluation: scenes are just a bigger batch — the planner forward and the
  batched PDM simulator/scorer shard the scene dimension the same way.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices: Optional[Sequence[jax.Device]] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Device-put a pytree with its leading dim sharded over the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(array: np.ndarray, multiple: int, axis: int = 0):
    """Pad `axis` up to a multiple (for sharding uneven scene counts);
    returns (padded, original_length)."""
    length = array.shape[axis]
    remainder = (-length) % multiple
    if remainder == 0:
        return array, length
    pad_width = [(0, 0)] * array.ndim
    pad_width[axis] = (0, remainder)
    return np.pad(array, pad_width, mode="edge"), length
