"""Flax CLIP text encoders for SD 1.x / 2.x / SDXL.

Replaces the HF `CLIPTextModel` / `CLIPTextModelWithProjection` the reference
loads in model_util.py:44-66, 154-167 (p1atdev/LECO). Three variants:

  * SD1.x:  12 layers, 768 wide, 12 heads, quick_gelu  (openai/clip-vit-large)
  * SD2.x:  23-of-24 layers, 1024 wide, 16 heads, gelu — the reference's
    "clip skip" arithmetic (`num_hidden_layers=24-(clip_skip-1)`,
    model_util.py:48) is expressed here as `num_hidden_layers` on the config:
    run that many layers, then apply the final LayerNorm, matching
    `text_encoder(tokens)[0]` on a truncated-stack HF model
    (train_util.py:73-74).
  * SDXL TE2: OpenCLIP bigG — 32 layers, 1280 wide, 20 heads, gelu, with a
    `text_projection` head; SDXL uses the *penultimate* hidden state
    (pre-final-LN) as the sequence embedding and the projected EOS pooled
    state (train_util.py:89-104).

All variants share one module. `__call__` returns (last_hidden_state,
pooled_output, hidden_states) where hidden_states[i] is the pre-LN output of
layer i (hidden_states[-2] is SDXL's penultimate state).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"  # "quick_gelu" (SD1) or "gelu" (SD2/XL)
    projection_dim: Optional[int] = None  # set for SDXL text_encoder_2
    # token id whose position is pooled. OpenAI CLIP pools argmax(ids) (the
    # eot token has the highest id); HF >=4.25 pools the first eos_token_id.
    eos_token_id: int = 49407


def sd1_text_config(num_hidden_layers: int = 12) -> CLIPTextConfig:
    return CLIPTextConfig(num_hidden_layers=num_hidden_layers)


def sd2_text_config(num_hidden_layers: int = 23) -> CLIPTextConfig:
    """SD2.x: penultimate layer by default (clip skip 2 semantics,
    model_util.py:48)."""
    return CLIPTextConfig(
        hidden_size=1024,
        intermediate_size=4096,
        num_hidden_layers=num_hidden_layers,
        num_attention_heads=16,
        hidden_act="gelu",
    )


def sdxl_text2_config() -> CLIPTextConfig:
    """OpenCLIP ViT-bigG text tower (SDXL text_encoder_2)."""
    return CLIPTextConfig(
        hidden_size=1280,
        intermediate_size=5120,
        num_hidden_layers=32,
        num_attention_heads=20,
        hidden_act="gelu",
        projection_dim=1280,
        eos_token_id=49407,
    )


def tiny_text_config(hidden_size: int = 32, projection_dim=None) -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=1000,
        hidden_size=hidden_size,
        intermediate_size=hidden_size * 4,
        num_hidden_layers=2,
        num_attention_heads=2,
        projection_dim=projection_dim,
        eos_token_id=999,
    )


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(name)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = cfg.num_attention_heads
        d = cfg.hidden_size // h
        b, n, _ = x.shape
        q = nn.Dense(cfg.hidden_size, name="q_proj", **kw)(x)
        k = nn.Dense(cfg.hidden_size, name="k_proj", **kw)(x)
        v = nn.Dense(cfg.hidden_size, name="v_proj", **kw)(x)
        q = q.reshape(b, n, h, d)
        k = k.reshape(b, n, h, d)
        v = v.reshape(b, n, h, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * (d**-0.5), k).astype(
            jnp.float32
        )
        if causal_mask is not None:
            logits = jnp.where(causal_mask, logits, jnp.finfo(jnp.float32).min)
        probs = nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, -1)
        return nn.Dense(cfg.hidden_size, name="out_proj", **kw)(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)
        h = ln("layer_norm1")(x).astype(self.dtype)
        x = x + CLIPAttention(cfg, name="self_attn", **kw)(h, causal_mask)
        h = ln("layer_norm2")(x).astype(self.dtype)
        h = nn.Dense(cfg.intermediate_size, name="mlp_fc1", **kw)(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, name="mlp_fc2", **kw)(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns (last_hidden_state [after final LN], pooled, hidden_states).

    hidden_states[0] is the embedding output; hidden_states[i] the output of
    layer i (pre-final-LN) — matching HF `output_hidden_states=True`.
    If `config.projection_dim` is set, `pooled` is the projected EOS state
    (CLIPTextModelWithProjection.text_embeds).
    """

    config: CLIPTextConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, input_ids: jnp.ndarray, input_embeds: Optional[jnp.ndarray] = None
    ):
        """`input_embeds` (B, N, hidden) optionally REPLACES the token-
        embedding lookup (textual inversion trains vectors in that space);
        `input_ids` is still required for the EOS pooling position."""
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, n = input_ids.shape

        tok = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, name="token_embedding", **kw
        )(input_ids)
        if input_embeds is not None:
            tok = input_embeds.astype(tok.dtype)
        pos = nn.Embed(
            cfg.max_position_embeddings,
            cfg.hidden_size,
            name="position_embedding",
            **kw,
        )(jnp.arange(n)[None, :])
        x = tok + pos

        causal_mask = jnp.tril(jnp.ones((n, n), bool))[None, None]
        hidden_states = [x]
        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg, name=f"layers_{i}", **kw)(x, causal_mask)
            hidden_states.append(x)

        last = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, name="final_layer_norm"
        )(x).astype(self.dtype)

        # pool the EOS position: first occurrence of eos_token_id
        eos_pos = jnp.argmax(
            (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1
        )
        pooled = last[jnp.arange(b), eos_pos]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(
                cfg.projection_dim, use_bias=False, name="text_projection", **kw
            )(pooled)

        return last, pooled, hidden_states
