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
SP_AXIS = "sp"


def get_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DP_AXIS,))


def get_mesh_dp_sp(devices=None, sp: int = 1) -> Mesh:
    """(dp, sp) mesh: dp shards batch dims, sp shards the spatial H dim of
    the UNet activations (GSPMD inserts the conv halo exchanges and the
    GroupNorm/attention reductions over ICI). This is what lets a v5e-8
    accelerate the reference's default batch-1 recipe: the internal CFG/ref
    batches are 2B/3B and the latent H is 64 at 512px, so an (2, 4) mesh
    splits the inner denoise 8 ways with no change to training semantics."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) % sp == 0, (len(devices), sp)
    grid = np.asarray(devices).reshape(len(devices) // sp, sp)
    return Mesh(grid, (DP_AXIS, SP_AXIS))


def axis_size(mesh: Optional[Mesh], name: str) -> int:
    if mesh is None:
        return 1
    return mesh.shape.get(name, 1)


def constrain_internal(x, mesh: Optional[Mesh], enable: bool = True):
    """Sharding constraint for an internal activation of the train step:
    leading (batch) dim over dp when divisible, H (dim 1 of NHWC) over sp
    when divisible. Dims that do not divide stay unsharded — e.g. the 3B
    reference batch on dp=2 still gets its H split over sp."""
    if mesh is None or not enable:
        return x
    spec = [None] * x.ndim
    dp = axis_size(mesh, DP_AXIS)
    sp = axis_size(mesh, SP_AXIS)
    if dp > 1 and x.shape[0] % dp == 0:
        spec[0] = DP_AXIS
    if sp > 1 and x.ndim == 4 and x.shape[1] % sp == 0:
        spec[1] = SP_AXIS
    if all(s is None for s in spec):
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


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
