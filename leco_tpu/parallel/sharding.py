"""Tensor-parallel sharding rules for the UNet over a 2-D (dp, tp) mesh.

Megatron-style column/row parallelism applied to the transformer blocks:

  column-parallel (kernel sharded on the OUTPUT dim, bias sharded):
    attn to_q / to_k / to_v          -> attention heads split across tp
    ff GEGLU `proj`                  -> ff hidden split across tp
  row-parallel (kernel sharded on the INPUT dim, bias replicated):
    attn to_out_0, ff net_2          -> partial sums reduced by GSPMD

Convs, norms, time embeddings and all LoRA leaves stay replicated (GroupNorm
needs full-channel statistics; LoRA trees are tiny). No collectives are
written by hand: the params carry NamedShardings and XLA GSPMD inserts the
all-reduces over ICI.

The reference has no parallelism of any kind (SURVEY.md section 2.4); data
parallelism is leco_tpu.parallel.mesh; this module adds the tp dimension
for SDXL-scale models and larger meshes.
"""

from __future__ import annotations

import jax
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"

_COLUMN_PARALLEL = {"to_q", "to_k", "to_v", "proj"}  # kernel (in, OUT)
_ROW_PARALLEL = {"to_out_0", "net_2"}  # kernel (IN, out)


def make_mesh_2d(devices=None, tp: int = 1) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) % tp == 0, (len(devices), tp)
    grid = np.asarray(devices).reshape(len(devices) // tp, tp)
    return Mesh(grid, (DP_AXIS, TP_AXIS))


def _in_transformer(path: tuple[str, ...]) -> bool:
    return any(p.startswith("attentions_") for p in path)


def unet_param_spec(path: tuple[str, ...]) -> P:
    """PartitionSpec for one UNet param leaf (base params only; pass LoRA
    leaves through `P()` — they are tiny and stay replicated)."""
    if len(path) < 2 or not _in_transformer(path):
        return P()
    layer, leaf = path[-2], path[-1]
    if leaf.startswith("lora_"):
        return P()
    if layer in _COLUMN_PARALLEL:
        if leaf == "kernel":
            return P(None, TP_AXIS)
        if leaf == "bias":
            return P(TP_AXIS)
    if layer in _ROW_PARALLEL and leaf == "kernel":
        return P(TP_AXIS, None)
    return P()


def shard_unet_params(params, mesh: Mesh):
    """device_put the base param tree with the TP rules (replicated over dp)."""
    flat = flatten_dict(params)
    out = {}
    for k, v in flat.items():
        spec = unet_param_spec(k)
        # guard: only shard when the dim divides the axis size
        tp = mesh.shape.get(TP_AXIS, 1)
        ok = True
        for dim, axis in enumerate(spec):
            if axis == TP_AXIS and v.shape[dim] % tp != 0:
                ok = False
        if not ok:
            spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return unflatten_dict(out)


def replicate_params(params, mesh: Mesh):
    return jax.device_put(
        params, NamedSharding(mesh, P())
    )
