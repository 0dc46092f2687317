"""Multi-head dot-product attention with pluggable backends.

This is the TPU-native replacement for the reference's xformers
memory-efficient attention (`unet.enable_xformers_memory_efficient_attention()`
at train_lora.py:68 / gated at train_lora_xl.py:79-80):

  * backend="xla": plain einsum attention; XLA fuses the softmax chain. With
    optional fp32 softmax upcast (SD2.1's `upcast_attention`).
  * backend="flash": blockwise Pallas flash-attention kernel
    (leco_tpu.ops.flash_attention), tiled for the MXU, fp32 accumulation.

Self-attention runs over spatial tokens ((h/8·w/8) down to 64), cross
attention over the 77 text tokens.
"""

from __future__ import annotations

import functools
import os

import jax.numpy as jnp
from einops import rearrange

def _xla_attention(q, k, v, scale: float, upcast: bool):
    """q: (B, Nq, H, D); k, v: (B, Nk, H, D) -> (B, Nq, H, D)."""
    dtype = q.dtype
    if upcast:
        q = q.astype(jnp.float32)
        k = k.astype(jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    probs = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    probs = probs.astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    upcast: bool = False,
    backend: str = "xla",
) -> jnp.ndarray:
    """Attention over flattened token sequences.

    Args:
      q: (B, Nq, C) queries (C = num_heads * head_dim).
      k, v: (B, Nk, C) keys/values (Nk = Nq for self-attn, 77 for cross).
      num_heads: head count; scale = head_dim ** -0.5.
      upcast: compute the softmax in float32 (SD2.1 `upcast_attention`).
      backend: "xla", "flash", or "flash_sharded" (the Pallas kernel wrapped
        in custom_partitioning so GSPMD sequence/head sharding keeps it —
        used by the sp/tp multi-chip paths instead of downgrading to XLA).

    Returns:
      (B, Nq, C)
    """
    head_dim = q.shape[-1] // num_heads
    scale = head_dim**-0.5

    if backend in ("flash", "flash_sharded"):
        from leco_tpu.ops import flash_attention as fa

        # the packed-layout kernel (flash_attention_packed) avoids the HBM
        # head transposes but loses 2.7x on chip: its in-kernel 40-lane head
        # slices force Mosaic relayout copies that dwarf the transpose cost.
        # Measured in the fwd trace (docs/DESIGN.md); opt-in for study only.
        if os.environ.get("LECO_FLASH_PACKED") == "1" and fa.supports_packed(
            q.shape[1], k.shape[1], q.shape[-1], num_heads, q.dtype.itemsize
        ):
            return fa.flash_attention_packed(q, k, v, num_heads, scale)
        if fa.supports(q.shape[1], k.shape[1]):
            qh = rearrange(q, "b n (h d) -> b n h d", h=num_heads)
            kh = rearrange(k, "b n (h d) -> b n h d", h=num_heads)
            vh = rearrange(v, "b n (h d) -> b n h d", h=num_heads)
            out = fa.flash_attention(
                qh, kh, vh, scale=scale, sharded=(backend == "flash_sharded")
            )
            return rearrange(out, "b n h d -> b n (h d)")

    qh = rearrange(q, "b n (h d) -> b n h d", h=num_heads)
    kh = rearrange(k, "b n (h d) -> b n h d", h=num_heads)
    vh = rearrange(v, "b n (h d) -> b n h d", h=num_heads)
    out = _xla_attention(qh, kh, vh, scale, upcast)
    return rearrange(out, "b n h d -> b n (h d)")


@functools.cache
def default_backend() -> str:
    """Pick flash attention on TPU, XLA elsewhere (CPU tests)."""
    import jax

    platform = jax.devices()[0].platform
    return "flash" if platform == "tpu" else "xla"
