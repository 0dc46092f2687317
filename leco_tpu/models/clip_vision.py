"""Flax CLIP vision tower + the full CLIP dual-encoder scorer.

Used by the evaluation harness (leco_tpu/eval.py) to measure the
erased-concept CLIP-score delta — the quality half of the north-star metric
(BASELINE.md). The reference has no quantitative eval at all (its acceptance
test is the notebook's visual A/B, SURVEY.md section 6); this adds one.

Architecture: standard CLIP ViT (e.g. ViT-L/14: 24 layers, 1024 wide,
16 heads, patch 14, image 224, projection 768). Weights load offline from a
local `openai/clip-vit-large-patch14`-style directory via
`leco_tpu.models.convert.torch_clip_vision_to_flax`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from leco_tpu.models.clip import CLIPEncoderLayer, CLIPTextConfig


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"

    def as_text_config(self) -> CLIPTextConfig:
        """Reuse the text encoder layer stack (same block structure)."""
        return CLIPTextConfig(
            hidden_size=self.hidden_size,
            intermediate_size=self.intermediate_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            hidden_act=self.hidden_act,
        )


def tiny_vision_config() -> CLIPVisionConfig:
    return CLIPVisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        image_size=32,
        patch_size=8,
        projection_dim=16,
    )


class CLIPVisionModel(nn.Module):
    """images (B, H, W, 3), normalized with CLIP mean/std -> projected image
    embeddings (B, projection_dim)."""

    config: CLIPVisionConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b = pixel_values.shape[0]

        patches = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            name="patch_embedding",
            **kw,
        )(pixel_values.astype(self.dtype))
        patches = patches.reshape(b, -1, cfg.hidden_size)

        class_embedding = self.param(
            "class_embedding",
            nn.initializers.normal(0.02),
            (cfg.hidden_size,),
            self.param_dtype,
        )
        cls = jnp.broadcast_to(
            class_embedding.astype(self.dtype), (b, 1, cfg.hidden_size)
        )
        x = jnp.concatenate([cls, patches], axis=1)

        n = x.shape[1]
        pos = nn.Embed(
            n, cfg.hidden_size, name="position_embedding", **kw
        )(jnp.arange(n)[None, :])
        x = x + pos

        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pre_layrnorm")(
            x
        ).astype(self.dtype)

        layer_cfg = cfg.as_text_config()
        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(layer_cfg, name=f"layers_{i}", **kw)(
                x, causal_mask=None
            )

        pooled = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, name="post_layernorm"
        )(x[:, 0]).astype(self.dtype)
        return nn.Dense(
            cfg.projection_dim, use_bias=False, name="visual_projection", **kw
        )(pooled)


CLIP_IMAGE_MEAN = jnp.array([0.48145466, 0.4578275, 0.40821073])
CLIP_IMAGE_STD = jnp.array([0.26862954, 0.26130258, 0.27577711])


def preprocess_images(images: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """uint8/float (B, H, W, 3) -> CLIP-normalized (B, S, S, 3).
    Resize is bilinear (matching the eval protocol, not byte-exact PIL)."""
    import jax

    images = jnp.asarray(images, jnp.float32)
    if images.max() > 1.5:
        images = images / 255.0
    images = jax.image.resize(
        images,
        (images.shape[0], image_size, image_size, 3),
        method="bilinear",
    )
    return (images - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


def clip_score(image_embeds: jnp.ndarray, text_embeds: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity per (image, text) pair, scaled by 100 (the standard
    CLIPScore convention, clipped at 0)."""
    ie = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
    te = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
    return jnp.clip(jnp.sum(ie * te, axis=-1), 0.0, None) * 100.0
