"""Flax UNet2DCondition for SD 1.x / 2.x / SDXL — TPU-native reimplementation.

Replaces the diffusers `UNet2DConditionModel` the reference loads in
model_util.py:67-72 / 169-174 (p1atdev/LECO). Architecture parity targets the
stock SD configs (see the `sd15_config` / `sd21_config` / `sdxl_config`
presets); behavior parity targets `unet(sample, t, encoder_hidden_states,
added_cond_kwargs).sample` as used in train_util.py:142-257.

TPU-first design decisions:
  * NHWC activation layout (XLA:TPU's native conv layout); latents are
    (B, H/8, W/8, 4) throughout the framework.
  * `dtype` (compute) / `param_dtype` split; GroupNorm/LayerNorm statistics
    always in float32; timestep sinusoids in float32.
  * Attention via `leco_tpu.ops.attention` — XLA einsum or a Pallas flash
    kernel (the xformers replacement).
  * Optional `nn.remat` over the down/mid/up blocks to trade FLOPs for HBM
    in the differentiated pass.
  * Module paths mirror diffusers names ("down_blocks_0/attentions_0/
    transformer_blocks_0/attn1/to_q") so that LoRA export keys
    (`lora_unet_*`, lora.py:24,191-192 in the reference) and torch-checkpoint
    conversion are a pure path join.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from leco_tpu.lora import LoRAConv, LoRADense, LoRASpec
from leco_tpu.ops.group_norm import FusedGroupNorm
from leco_tpu.ops.attention import multi_head_attention


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: tuple = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: tuple = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    block_out_channels: tuple = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    transformer_layers_per_block: Union[int, tuple] = 1
    cross_attention_dim: int = 768
    # diffusers-legacy semantics: this is the *head count* per block
    attention_head_dim: Union[int, tuple] = 8
    use_linear_projection: bool = False
    upcast_attention: bool = False
    addition_embed_type: Optional[str] = None  # "text_time" for SDXL
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816
    norm_num_groups: int = 32

    def per_block(self, value) -> tuple:
        n = len(self.block_out_channels)
        if isinstance(value, (tuple, list)):
            assert len(value) == n
            return tuple(value)
        return (value,) * n

    @property
    def heads_per_block(self) -> tuple:
        return self.per_block(self.attention_head_dim)

    @property
    def tlayers_per_block(self) -> tuple:
        return self.per_block(self.transformer_layers_per_block)


def sd15_config() -> UNetConfig:
    """Stable Diffusion v1.x (SD1.4/1.5/WD1.3): 0.86B params."""
    return UNetConfig(cross_attention_dim=768, attention_head_dim=8)


def sd21_config() -> UNetConfig:
    """Stable Diffusion v2.x (768-v etc.): penultimate CLIP, 64-dim heads."""
    return UNetConfig(
        cross_attention_dim=1024,
        attention_head_dim=(5, 10, 20, 20),
        use_linear_projection=True,
        upcast_attention=True,
    )


def sdxl_config() -> UNetConfig:
    """SDXL base: 2.6B params, 3 levels, deep level-3 transformer stack."""
    return UNetConfig(
        sample_size=128,
        down_block_types=(
            "DownBlock2D",
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
        ),
        up_block_types=(
            "CrossAttnUpBlock2D",
            "CrossAttnUpBlock2D",
            "UpBlock2D",
        ),
        block_out_channels=(320, 640, 1280),
        transformer_layers_per_block=(1, 2, 10),
        cross_attention_dim=2048,
        attention_head_dim=(5, 10, 20),
        use_linear_projection=True,
        addition_embed_type="text_time",
    )


def tiny_unet_config(cross_attention_dim: int = 32) -> UNetConfig:
    """2-level, 8-channel UNet for CPU tests (SURVEY.md section 4 plan)."""
    return UNetConfig(
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(8, 16),
        layers_per_block=1,
        cross_attention_dim=cross_attention_dim,
        attention_head_dim=2,
        norm_num_groups=4,
    )


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------


def get_timestep_embedding(
    timesteps: jnp.ndarray, embedding_dim: int
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, flip_sin_to_cos=True, freq_shift=0
    (the SD configuration). Always computed in float32."""
    timesteps = jnp.atleast_1d(timesteps).astype(jnp.float32)
    half = embedding_dim // 2
    exponent = -jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    emb = timesteps[:, None] * jnp.exp(exponent)[None, :]
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


class TimestepEmbedding(nn.Module):
    """linear_1 -> silu -> linear_2 MLP over the sinusoid."""

    embed_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Dense(self.embed_dim, name="linear_1", **kw)(x.astype(self.dtype))
        x = nn.silu(x)
        return nn.Dense(self.embed_dim, name="linear_2", **kw)(x)


def _group_norm(num_groups, eps, name):
    # statistics in fp32 regardless of the compute dtype
    return nn.GroupNorm(
        num_groups=num_groups, epsilon=eps, dtype=jnp.float32, name=name
    )


class ResnetBlock2D(nn.Module):
    """norm1-silu-conv1 + time_emb, norm2-silu-conv2, skip (+1x1 shortcut).
    Matches diffusers ResnetBlock2D with SD defaults (groups=32, eps=1e-5,
    output_scale_factor=1, time_embedding_norm='default')."""

    out_channels: int
    num_groups: int = 32
    lora_spec: Optional[LoRASpec] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        from leco_tpu.ops import gn_conv

        kw = dict(
            lora_spec=self.lora_spec,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        in_channels = x.shape[-1]
        norm1 = FusedGroupNorm(self.num_groups, 1e-5, with_silu=True, name="norm1")
        conv1 = LoRAConv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv1", **kw
        )
        time_proj = LoRADense(self.out_channels, name="time_emb_proj", **kw)
        norm2 = FusedGroupNorm(self.num_groups, 1e-5, with_silu=True, name="norm2")
        conv2 = LoRAConv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv2", **kw
        )

        x = x.astype(self.dtype)
        temb_p = time_proj(nn.silu(temb.astype(self.dtype)))

        def fuses(shape, conv_name):
            # Per-conv decision: the affine decomposition is used ONLY
            # where the Pallas kernel will actually take the conv (the
            # tuned-table winners, gn_conv._TUNED — low-res levels).
            # Everything else keeps the default sum-GN composition, whose
            # XLA fusion graph the round-2 campaign already optimized —
            # routing those shapes through an affine+silu fallback pass
            # measured slower end-to-end (docs/DESIGN.md round 3).
            spec = self.lora_spec
            lora = spec is not None and spec.matches(self.path + (conv_name,))
            return not lora and gn_conv.supports(
                shape, self.out_channels, self.dtype
            )

        if gn_conv.enabled() and fuses(x.shape, "conv1"):
            # fused "padded-domain resnet" (ops/gn_conv.py): the GroupNorm
            # collapses to a per-(batch, channel) affine and the conv
            # applies the silu epilogue inside the Pallas kernel
            a1, s1 = norm1(x, affine_only=True)
            h = conv1(x, affine=(a1, s1))
        else:
            h = conv1(norm1(x))
        if gn_conv.enabled() and fuses(h.shape, "conv2"):
            # the time-emb add folds into norm2's affine analytically (the
            # final h carries the temb contribution through conv2's affine)
            a2, s2 = norm2(h, affine_only=True, temb=temb_p)
            h = conv2(h, affine=(a2, s2))
        else:
            h = h + temb_p[:, None, None, :]
            h = norm2(h)
            h = conv2(h)
        if in_channels != self.out_channels:
            x = LoRAConv(self.out_channels, (1, 1), name="conv_shortcut", **kw)(x)
        return x + h


class Attention(nn.Module):
    """to_q/to_k/to_v (no bias) -> multi-head attention -> to_out_0."""

    query_dim: int
    heads: int
    upcast: bool = False
    backend: str = "xla"
    lora_spec: Optional[LoRASpec] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        kw = dict(
            lora_spec=self.lora_spec,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        ctx = x if context is None else context
        q = LoRADense(self.query_dim, use_bias=False, name="to_q", **kw)(x)
        k = LoRADense(self.query_dim, use_bias=False, name="to_k", **kw)(ctx)
        v = LoRADense(self.query_dim, use_bias=False, name="to_v", **kw)(ctx)
        out = multi_head_attention(
            q, k, v, num_heads=self.heads, upcast=self.upcast, backend=self.backend
        )
        return LoRADense(self.query_dim, name="to_out_0", **kw)(out)


class GEGLU(nn.Module):
    inner_dim: int
    lora_spec: Optional[LoRASpec] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # value * gelu_exact(gate) fused into the projection's epilogue on
        # TPU (leco_tpu/ops/geglu.py); LoRA still composes pre-activation
        return LoRADense(
            self.inner_dim * 2,
            name="proj",
            geglu=True,
            lora_spec=self.lora_spec,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class FeedForward(nn.Module):
    """GEGLU (net_0) -> Dense (net_2); names match diffusers' ff.net.{0,2}."""

    dim: int
    lora_spec: Optional[LoRASpec] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.net_0 = GEGLU(
            self.dim * 4,
            lora_spec=self.lora_spec,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.net_2 = LoRADense(
            self.dim,
            lora_spec=self.lora_spec,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def __call__(self, x):
        return self.net_2(self.net_0(x))


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    upcast: bool = False
    backend: str = "xla"
    lora_spec: Optional[LoRASpec] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        def ln(name):
            return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)

        attn_kw = dict(
            query_dim=self.dim,
            heads=self.heads,
            upcast=self.upcast,
            backend=self.backend,
            lora_spec=self.lora_spec,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        x = x + Attention(name="attn1", **attn_kw)(
            ln("norm1")(x).astype(self.dtype)
        )
        x = x + Attention(name="attn2", **attn_kw)(
            ln("norm2")(x).astype(self.dtype), context
        )
        x = x + FeedForward(
            self.dim,
            lora_spec=self.lora_spec,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="ff",
        )(ln("norm3")(x).astype(self.dtype))
        return x


class Transformer2DModel(nn.Module):
    """GroupNorm -> proj_in -> transformer blocks -> proj_out + residual.
    `use_linear_projection` selects Linear (SD2/XL) vs 1x1 Conv (SD1)."""

    channels: int
    heads: int
    num_layers: int = 1
    use_linear_projection: bool = False
    upcast: bool = False
    backend: str = "xla"
    num_groups: int = 32
    lora_spec: Optional[LoRASpec] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        kw = dict(
            lora_spec=self.lora_spec,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        b, h, w, c = x.shape
        residual = x
        x = FusedGroupNorm(self.num_groups, 1e-6, with_silu=False, name="norm")(
            x.astype(self.dtype)
        )
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = LoRADense(self.channels, name="proj_in", **kw)(x)
        else:
            x = LoRAConv(self.channels, (1, 1), name="proj_in", **kw)(x)
            x = x.reshape(b, h * w, c)

        for i in range(self.num_layers):
            x = BasicTransformerBlock(
                dim=self.channels,
                heads=self.heads,
                upcast=self.upcast,
                backend=self.backend,
                name=f"transformer_blocks_{i}",
                **kw,
            )(x, context)

        if self.use_linear_projection:
            x = LoRADense(self.channels, name="proj_out", **kw)(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, c)
            x = LoRAConv(self.channels, (1, 1), name="proj_out", **kw)(x)
        return x + residual


class Downsample2D(nn.Module):
    channels: int
    lora_spec: Optional[LoRASpec] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return LoRAConv(
            self.channels,
            (3, 3),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            name="conv",
            lora_spec=self.lora_spec,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class Upsample2D(nn.Module):
    channels: int
    lora_spec: Optional[LoRASpec] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # the nearest-2x upsample is folded into the conv (phase-conv form
        # when no LoRA targets it — see LoRAConv.pre_upsample)
        return LoRAConv(
            self.channels,
            (3, 3),
            padding=((1, 1), (1, 1)),
            pre_upsample=True,
            name="conv",
            lora_spec=self.lora_spec,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


# ---------------------------------------------------------------------------
# UNet blocks
# ---------------------------------------------------------------------------


class CrossAttnDownBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    transformer_layers: int
    heads: int
    use_linear_projection: bool
    upcast: bool
    backend: str
    num_groups: int
    add_downsample: bool
    lora_spec: Optional[LoRASpec] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        kw = dict(
            lora_spec=self.lora_spec,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        outputs = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                self.out_channels,
                num_groups=self.num_groups,
                name=f"resnets_{i}",
                **kw,
            )(x, temb)
            x = Transformer2DModel(
                channels=self.out_channels,
                heads=self.heads,
                num_layers=self.transformer_layers,
                use_linear_projection=self.use_linear_projection,
                upcast=self.upcast,
                backend=self.backend,
                num_groups=self.num_groups,
                name=f"attentions_{i}",
                **kw,
            )(x, context)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, name="downsamplers_0", **kw)(x)
            outputs.append(x)
        return x, outputs


class DownBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    num_groups: int
    add_downsample: bool
    lora_spec: Optional[LoRASpec] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context=None):
        kw = dict(
            lora_spec=self.lora_spec,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        outputs = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                self.out_channels,
                num_groups=self.num_groups,
                name=f"resnets_{i}",
                **kw,
            )(x, temb)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, name="downsamplers_0", **kw)(x)
            outputs.append(x)
        return x, outputs


class UNetMidBlock2DCrossAttn(nn.Module):
    channels: int
    transformer_layers: int
    heads: int
    use_linear_projection: bool
    upcast: bool
    backend: str
    num_groups: int
    lora_spec: Optional[LoRASpec] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        kw = dict(
            lora_spec=self.lora_spec,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        x = ResnetBlock2D(
            self.channels, num_groups=self.num_groups, name="resnets_0", **kw
        )(x, temb)
        x = Transformer2DModel(
            channels=self.channels,
            heads=self.heads,
            num_layers=self.transformer_layers,
            use_linear_projection=self.use_linear_projection,
            upcast=self.upcast,
            backend=self.backend,
            num_groups=self.num_groups,
            name="attentions_0",
            **kw,
        )(x, context)
        x = ResnetBlock2D(
            self.channels, num_groups=self.num_groups, name="resnets_1", **kw
        )(x, temb)
        return x


class CrossAttnUpBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    transformer_layers: int
    heads: int
    use_linear_projection: bool
    upcast: bool
    backend: str
    num_groups: int
    add_upsample: bool
    lora_spec: Optional[LoRASpec] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, res_states: Sequence[jnp.ndarray], temb, context):
        kw = dict(
            lora_spec=self.lora_spec,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        for i in range(self.num_layers):
            x = jnp.concatenate([x, res_states[-(i + 1)]], axis=-1)
            x = ResnetBlock2D(
                self.out_channels,
                num_groups=self.num_groups,
                name=f"resnets_{i}",
                **kw,
            )(x, temb)
            x = Transformer2DModel(
                channels=self.out_channels,
                heads=self.heads,
                num_layers=self.transformer_layers,
                use_linear_projection=self.use_linear_projection,
                upcast=self.upcast,
                backend=self.backend,
                num_groups=self.num_groups,
                name=f"attentions_{i}",
                **kw,
            )(x, context)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, name="upsamplers_0", **kw)(x)
        return x


class UpBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    num_groups: int
    add_upsample: bool
    lora_spec: Optional[LoRASpec] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, res_states: Sequence[jnp.ndarray], temb, context=None):
        kw = dict(
            lora_spec=self.lora_spec,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        for i in range(self.num_layers):
            x = jnp.concatenate([x, res_states[-(i + 1)]], axis=-1)
            x = ResnetBlock2D(
                self.out_channels,
                num_groups=self.num_groups,
                name=f"resnets_{i}",
                **kw,
            )(x, temb)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, name="upsamplers_0", **kw)(x)
        return x


# ---------------------------------------------------------------------------
# The UNet
# ---------------------------------------------------------------------------


class UNet2DConditionModel(nn.Module):
    """The SD denoising UNet. Call signature mirrors the reference's
    `unet(latents, timestep, encoder_hidden_states, added_cond_kwargs)`
    (train_util.py:156-160, 239-244) with NHWC latents.

    Args to __call__:
      sample: (B, H, W, 4) noisy latents.
      timesteps: scalar or (B,) diffusion timestep(s).
      encoder_hidden_states: (B, 77, cross_attention_dim) text context.
      added_cond_kwargs: SDXL only — {"text_embeds": (B, 1280),
        "time_ids": (B, 6)}.
    """

    config: UNetConfig
    lora_spec: Optional[LoRASpec] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    attn_backend: str = "xla"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        added_cond_kwargs: Optional[dict] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bkw = dict(
            lora_spec=self.lora_spec,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        ch = cfg.block_out_channels
        heads = cfg.heads_per_block
        tlayers = cfg.tlayers_per_block
        time_embed_dim = ch[0] * 4
        n_blocks = len(ch)

        if self.remat:
            ca_down = nn.remat(CrossAttnDownBlock2D)
            down = nn.remat(DownBlock2D)
            mid = nn.remat(UNetMidBlock2DCrossAttn)
            ca_up = nn.remat(CrossAttnUpBlock2D)
            up = nn.remat(UpBlock2D)
        else:
            ca_down, down, mid, ca_up, up = (
                CrossAttnDownBlock2D,
                DownBlock2D,
                UNetMidBlock2DCrossAttn,
                CrossAttnUpBlock2D,
                UpBlock2D,
            )

        sample = sample.astype(self.dtype)
        encoder_hidden_states = encoder_hidden_states.astype(self.dtype)
        batch = sample.shape[0]

        # --- time (+ SDXL micro-conditioning) embedding
        timesteps = jnp.broadcast_to(jnp.atleast_1d(timesteps), (batch,))
        t_emb = get_timestep_embedding(timesteps, ch[0])
        emb = TimestepEmbedding(time_embed_dim, name="time_embedding", **kw)(t_emb)

        if cfg.addition_embed_type == "text_time":
            assert added_cond_kwargs is not None, (
                "SDXL UNet requires added_cond_kwargs={'text_embeds', 'time_ids'}"
            )
            text_embeds = added_cond_kwargs["text_embeds"]
            time_ids = added_cond_kwargs["time_ids"]
            time_embeds = get_timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim
            ).reshape(batch, -1)
            add_embeds = jnp.concatenate(
                [text_embeds.astype(jnp.float32), time_embeds], axis=-1
            )
            assert add_embeds.shape[-1] == cfg.projection_class_embeddings_input_dim
            emb = emb + TimestepEmbedding(
                time_embed_dim, name="add_embedding", **kw
            )(add_embeds)

        # --- down
        sample = nn.Conv(
            ch[0], (3, 3), padding=((1, 1), (1, 1)), name="conv_in", **kw
        )(sample)
        res_stack = [sample]
        for i, block_type in enumerate(cfg.down_block_types):
            is_final = i == n_blocks - 1
            if block_type == "CrossAttnDownBlock2D":
                sample, res = ca_down(
                    out_channels=ch[i],
                    num_layers=cfg.layers_per_block,
                    transformer_layers=tlayers[i],
                    heads=heads[i],
                    use_linear_projection=cfg.use_linear_projection,
                    upcast=cfg.upcast_attention,
                    backend=self.attn_backend,
                    num_groups=cfg.norm_num_groups,
                    add_downsample=not is_final,
                    name=f"down_blocks_{i}",
                    **bkw,
                )(sample, emb, encoder_hidden_states)
            elif block_type == "DownBlock2D":
                sample, res = down(
                    out_channels=ch[i],
                    num_layers=cfg.layers_per_block,
                    num_groups=cfg.norm_num_groups,
                    add_downsample=not is_final,
                    name=f"down_blocks_{i}",
                    **bkw,
                )(sample, emb)
            else:
                raise ValueError(f"unknown down block: {block_type}")
            res_stack.extend(res)

        # --- mid
        sample = mid(
            channels=ch[-1],
            transformer_layers=tlayers[-1],
            heads=heads[-1],
            use_linear_projection=cfg.use_linear_projection,
            upcast=cfg.upcast_attention,
            backend=self.attn_backend,
            num_groups=cfg.norm_num_groups,
            name="mid_block",
            **bkw,
        )(sample, emb, encoder_hidden_states)

        # --- up
        reversed_ch = list(reversed(ch))
        for i, block_type in enumerate(cfg.up_block_types):
            is_final = i == n_blocks - 1
            num_layers = cfg.layers_per_block + 1
            res = res_stack[-num_layers:]
            res_stack = res_stack[:-num_layers]
            rev_heads = list(reversed(heads))[i]
            rev_tlayers = list(reversed(tlayers))[i]
            if block_type == "CrossAttnUpBlock2D":
                sample = ca_up(
                    out_channels=reversed_ch[i],
                    num_layers=num_layers,
                    transformer_layers=rev_tlayers,
                    heads=rev_heads,
                    use_linear_projection=cfg.use_linear_projection,
                    upcast=cfg.upcast_attention,
                    backend=self.attn_backend,
                    num_groups=cfg.norm_num_groups,
                    add_upsample=not is_final,
                    name=f"up_blocks_{i}",
                    **bkw,
                )(sample, res, emb, encoder_hidden_states)
            elif block_type == "UpBlock2D":
                sample = up(
                    out_channels=reversed_ch[i],
                    num_layers=num_layers,
                    num_groups=cfg.norm_num_groups,
                    add_upsample=not is_final,
                    name=f"up_blocks_{i}",
                    **bkw,
                )(sample, res, emb)
            else:
                raise ValueError(f"unknown up block: {block_type}")

        # --- out
        sample = FusedGroupNorm(
            cfg.norm_num_groups, 1e-5, with_silu=True, name="conv_norm_out"
        )(sample)
        return nn.Conv(
            cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv_out", **kw
        )(sample)
