"""Flax VAE decoder (AutoencoderKL decoder half) for the inference harness.

The reference uses the VAE only to decode latents in test/infer_xl.py:136-153
(training never touches it — "VAE はいらない", model_util.py:35,122), so only
the decoder half is implemented. Architecture matches diffusers AutoencoderKL
for SD1/2/XL: post_quant_conv, conv_in, mid block (resnet - single-head
attention - resnet), 4 up blocks of (layers_per_block+1) time-embedding-free
resnets with nearest-x2 upsamplers, GroupNorm + silu + conv_out. NHWC.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from leco_tpu.models.unet import Upsample2D, _group_norm


@dataclasses.dataclass(frozen=True)
class VAEDecoderConfig:
    latent_channels: int = 4
    out_channels: int = 3
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215  # SD1/2; SDXL uses 0.13025


def sdxl_vae_config() -> VAEDecoderConfig:
    return VAEDecoderConfig(scaling_factor=0.13025)


class VAEResnetBlock(nn.Module):
    """ResnetBlock2D without time embedding (the VAE variant)."""

    out_channels: int
    num_groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        in_channels = x.shape[-1]
        h = _group_norm(self.num_groups, 1e-6, "norm1")(x).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv1", **kw
        )(h)
        h = _group_norm(self.num_groups, 1e-6, "norm2")(h).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv2", **kw
        )(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut", **kw)(x)
        return x + h


class VAEAttentionBlock(nn.Module):
    """Single-head spatial self-attention (diffusers Attention in the VAE
    mid block: group_norm + to_q/k/v + to_out.0)."""

    channels: int
    num_groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, h, w, c = x.shape
        residual = x
        y = _group_norm(self.num_groups, 1e-6, "group_norm")(x).astype(self.dtype)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q", **kw)(y)
        k = nn.Dense(c, name="to_k", **kw)(y)
        v = nn.Dense(c, name="to_v", **kw)(y)
        logits = jnp.einsum("bqc,bkc->bqk", q * (c**-0.5), k).astype(jnp.float32)
        probs = nn.softmax(logits, axis=-1).astype(self.dtype)
        y = jnp.einsum("bqk,bkc->bqc", probs, v)
        y = nn.Dense(c, name="to_out_0", **kw)(y)
        return residual + y.reshape(b, h, w, c)


class VAEDecoder(nn.Module):
    """latents (B, h, w, 4) -> images (B, 8h, 8w, 3) in [-1, 1].

    Callers divide latents by `config.scaling_factor` first (the diffusers
    `1 / scaling_factor` step in test/infer_xl.py's decode path)."""

    config: VAEDecoderConfig = VAEDecoderConfig()
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        z = z.astype(self.dtype)
        z = nn.Conv(cfg.latent_channels, (1, 1), name="post_quant_conv", **kw)(z)

        ch = list(reversed(cfg.block_out_channels))  # (512, 512, 256, 128)
        x = nn.Conv(
            ch[0], (3, 3), padding=((1, 1), (1, 1)), name="conv_in", **kw
        )(z)

        # mid
        x = VAEResnetBlock(
            ch[0], cfg.norm_num_groups, name="mid_block_resnets_0", **kw
        )(x)
        x = VAEAttentionBlock(
            ch[0], cfg.norm_num_groups, name="mid_block_attentions_0", **kw
        )(x)
        x = VAEResnetBlock(
            ch[0], cfg.norm_num_groups, name="mid_block_resnets_1", **kw
        )(x)

        # up
        n = len(ch)
        for i, out_ch in enumerate(ch):
            for j in range(cfg.layers_per_block + 1):
                x = VAEResnetBlock(
                    out_ch,
                    cfg.norm_num_groups,
                    name=f"up_blocks_{i}_resnets_{j}",
                    **kw,
                )(x)
            if i != n - 1:
                x = Upsample2D(out_ch, name=f"up_blocks_{i}_upsamplers_0", **kw)(x)

        x = _group_norm(cfg.norm_num_groups, 1e-6, "conv_norm_out")(x).astype(
            self.dtype
        )
        x = nn.silu(x)
        return nn.Conv(
            cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv_out", **kw
        )(x)
