"""Device mesh + sharding helpers.

The reference has no distributed support at all (hardcoded cuda:0,
train_lora.py:26; SURVEY.md section 2.4). The TPU-native replacement is a
1-D data-parallel mesh: frozen UNet + LoRA params replicated, the CFG batch
sharded over 'dp', gradients all-reduced by XLA (GSPMD inserts the psum over
ICI when the replicated-param loss is differentiated against a sharded
batch). No NCCL analog is written — XLA collectives are the backend.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def get_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DP_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DP_AXIS))


def dp_size(mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return 1
    return mesh.shape.get(DP_AXIS, mesh.devices.size)


def shardable_batch(batch_size: int, mesh: Optional[Mesh]) -> bool:
    """Shard only when the batch divides the dp axis; otherwise replicate
    (LECO batch sizes are 1-3, so single-host training often replicates —
    the dp win comes from scaling batch_size with the slice)."""
    if mesh is None:
        return False
    return batch_size % dp_size(mesh) == 0


def constrain_batch(x, mesh: Optional[Mesh], enable: bool):
    """with_sharding_constraint along the leading (batch) axis."""
    if mesh is None or not enable:
        return x
    spec = P(DP_AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
