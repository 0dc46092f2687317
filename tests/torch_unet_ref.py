"""Independent full-graph torch UNet2DConditionModel reimplementation.

Written from the published diffusers architecture (the ground truth the
reference loads at /root/reference/model_util.py:67-72) — NOT copied from
diffusers (which is not installed here): pre-norm resnets with the time
embedding added between convs, Transformer2DModel with GN(eps 1e-6) +
conv-or-linear projections, pre-LN transformer blocks (attn1 -> attn2 ->
GEGLU FF), skip-connection stack popped in reverse, nearest-2x upsample
before the up conv, [cos, sin] timestep sinusoid with freq_shift 0, and the
SDXL text_time added-embedding path.

The module tree uses diffusers' exact state_dict naming so its state_dict()
feeds straight into the REAL `leco_tpu.models.convert.torch_unet_to_flax`
path — the same converter real checkpoints go through. The full-graph
parity test (test_torch_unet_fullgraph.py) composes the block wiring the
per-block tests (test_torch_blocks.py) cannot check: skip-stack order,
res-stack pop arithmetic, time-emb broadcast, per-level transformer depth,
add-embed concatenation order.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t: torch.Tensor, dim: int) -> torch.Tensor:
    """Sinusoid with flip_sin_to_cos=True, freq_shift=0 (SD config):
    [cos | sin], exponent over dim//2."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    emb = t.float()[:, None] * torch.exp(exponent)[None, :]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim, embed_dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, embed_dim)
        self.linear_2 = nn.Linear(embed_dim, embed_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=1e-5)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=1e-5)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (
            nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        skip = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return skip + h


class Attention(nn.Module):
    def __init__(self, dim, heads, ctx_dim=None):
        super().__init__()
        self.heads = heads
        ctx_dim = ctx_dim or dim
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        q, k, v = self.to_q(x), self.to_k(ctx), self.to_v(ctx)
        b, n, c = q.shape
        d = c // self.heads

        def split(t):
            return t.reshape(b, -1, self.heads, d).permute(0, 2, 1, 3)

        o = F.scaled_dot_product_attention(split(q), split(k), split(v))
        o = o.permute(0, 2, 1, 3).reshape(b, n, c)
        return self.to_out[0](o)


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        value, gate = self.proj(x).chunk(2, dim=-1)
        return value * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.net = nn.ModuleList(
            [GEGLU(dim, dim * 4), nn.Identity(), nn.Linear(dim * 4, dim)]
        )

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, ctx_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = Attention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.attn2 = Attention(dim, heads, ctx_dim)
        self.norm3 = nn.LayerNorm(dim, eps=1e-5)
        self.ff = FeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class Transformer2DModel(nn.Module):
    def __init__(self, ch, heads, depth, ctx_dim, groups, use_linear):
        super().__init__()
        self.use_linear = use_linear
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        if use_linear:
            self.proj_in = nn.Linear(ch, ch)
            self.proj_out = nn.Linear(ch, ch)
        else:
            self.proj_in = nn.Conv2d(ch, ch, 1)
            self.proj_out = nn.Conv2d(ch, ch, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(ch, heads, ctx_dim) for _ in range(depth)]
        )

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        residual = x
        x = self.norm(x)
        if self.use_linear:
            x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
            x = self.proj_in(x)
        else:
            x = self.proj_in(x)
            x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for block in self.transformer_blocks:
            x = block(x, ctx)
        if self.use_linear:
            x = self.proj_out(x)
            x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        else:
            x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
            x = self.proj_out(x)
        return x + residual


class Downsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class CrossAttnDownBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim, layers, depth, heads,
                 ctx_dim, groups, use_linear, add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if i == 0 else out_ch, out_ch, temb_dim,
                           groups) for i in range(layers)]
        )
        self.attentions = nn.ModuleList(
            [Transformer2DModel(out_ch, heads, depth, ctx_dim, groups,
                                use_linear) for _ in range(layers)]
        )
        self.downsamplers = (
            nn.ModuleList([Downsample2D(out_ch)]) if add_downsample else None
        )

    def forward(self, x, temb, ctx):
        outputs = []
        for resnet, attn in zip(self.resnets, self.attentions):
            x = attn(resnet(x, temb), ctx)
            outputs.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            outputs.append(x)
        return x, outputs


class DownBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim, layers, groups,
                 add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if i == 0 else out_ch, out_ch, temb_dim,
                           groups) for i in range(layers)]
        )
        self.downsamplers = (
            nn.ModuleList([Downsample2D(out_ch)]) if add_downsample else None
        )

    def forward(self, x, temb, ctx=None):
        outputs = []
        for resnet in self.resnets:
            x = resnet(x, temb)
            outputs.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            outputs.append(x)
        return x, outputs


class UNetMidBlock2DCrossAttn(nn.Module):
    def __init__(self, ch, temb_dim, depth, heads, ctx_dim, groups,
                 use_linear):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, temb_dim, groups),
             ResnetBlock2D(ch, ch, temb_dim, groups)]
        )
        self.attentions = nn.ModuleList(
            [Transformer2DModel(ch, heads, depth, ctx_dim, groups, use_linear)]
        )

    def forward(self, x, temb, ctx):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, ctx)
        return self.resnets[1](x, temb)


class CrossAttnUpBlock2D(nn.Module):
    def __init__(self, in_chs, out_ch, temb_dim, depth, heads, ctx_dim,
                 groups, use_linear, add_upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(c, out_ch, temb_dim, groups) for c in in_chs]
        )
        self.attentions = nn.ModuleList(
            [Transformer2DModel(out_ch, heads, depth, ctx_dim, groups,
                                use_linear) for _ in in_chs]
        )
        self.upsamplers = (
            nn.ModuleList([Upsample2D(out_ch)]) if add_upsample else None
        )

    def forward(self, x, res_states, temb, ctx):
        for resnet, attn in zip(self.resnets, self.attentions):
            x = torch.cat([x, res_states.pop()], dim=1)
            x = attn(resnet(x, temb), ctx)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class UpBlock2D(nn.Module):
    def __init__(self, in_chs, out_ch, temb_dim, groups, add_upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(c, out_ch, temb_dim, groups) for c in in_chs]
        )
        self.upsamplers = (
            nn.ModuleList([Upsample2D(out_ch)]) if add_upsample else None
        )

    def forward(self, x, res_states, temb, ctx=None):
        for resnet in self.resnets:
            x = torch.cat([x, res_states.pop()], dim=1)
            x = resnet(x, temb)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class TorchUNet2DConditionModel(nn.Module):
    """Full-graph torch UNet taking the same `UNetConfig` dataclass as the
    flax model (leco_tpu.models.unet.UNetConfig) so both sides are built
    from one source of truth."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        ch = cfg.block_out_channels
        heads = cfg.heads_per_block
        tlayers = cfg.tlayers_per_block
        temb_dim = ch[0] * 4
        n = len(ch)
        groups = cfg.norm_num_groups

        self.conv_in = nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(ch[0], temb_dim)
        if cfg.addition_embed_type == "text_time":
            self.add_embedding = TimestepEmbedding(
                cfg.projection_class_embeddings_input_dim, temb_dim
            )

        # --- down: track skip channels exactly as the stack accumulates
        self.down_blocks = nn.ModuleList()
        skip_chs = [ch[0]]
        in_ch = ch[0]
        for i, kind in enumerate(cfg.down_block_types):
            is_final = i == n - 1
            if kind == "CrossAttnDownBlock2D":
                block = CrossAttnDownBlock2D(
                    in_ch, ch[i], temb_dim, cfg.layers_per_block, tlayers[i],
                    heads[i], cfg.cross_attention_dim, groups,
                    cfg.use_linear_projection, not is_final,
                )
            elif kind == "DownBlock2D":
                block = DownBlock2D(
                    in_ch, ch[i], temb_dim, cfg.layers_per_block, groups,
                    not is_final,
                )
            else:
                raise ValueError(kind)
            self.down_blocks.append(block)
            skip_chs.extend([ch[i]] * cfg.layers_per_block)
            if not is_final:
                skip_chs.append(ch[i])
            in_ch = ch[i]

        self.mid_block = UNetMidBlock2DCrossAttn(
            ch[-1], temb_dim, tlayers[-1], heads[-1],
            cfg.cross_attention_dim, groups, cfg.use_linear_projection,
        )

        # --- up: resnet i input = current + popped skip channels
        self.up_blocks = nn.ModuleList()
        rev_ch = list(reversed(ch))
        rev_heads = list(reversed(heads))
        rev_tlayers = list(reversed(tlayers))
        cur = ch[-1]
        for i, kind in enumerate(cfg.up_block_types):
            is_final = i == n - 1
            layers = cfg.layers_per_block + 1
            in_chs = []
            for _ in range(layers):
                in_chs.append(cur + skip_chs.pop())
                cur = rev_ch[i]
            if kind == "CrossAttnUpBlock2D":
                block = CrossAttnUpBlock2D(
                    in_chs, rev_ch[i], temb_dim, rev_tlayers[i], rev_heads[i],
                    cfg.cross_attention_dim, groups,
                    cfg.use_linear_projection, not is_final,
                )
            elif kind == "UpBlock2D":
                block = UpBlock2D(in_chs, rev_ch[i], temb_dim, groups,
                                  not is_final)
            else:
                raise ValueError(kind)
            self.up_blocks.append(block)

        self.conv_norm_out = nn.GroupNorm(groups, ch[0], eps=1e-5)
        self.conv_out = nn.Conv2d(ch[0], cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, encoder_hidden_states,
                added_cond_kwargs=None):
        cfg = self.cfg
        b = sample.shape[0]
        t = torch.broadcast_to(torch.atleast_1d(timesteps), (b,))
        emb = self.time_embedding(
            timestep_embedding(t, cfg.block_out_channels[0])
        )
        if cfg.addition_embed_type == "text_time":
            time_ids = added_cond_kwargs["time_ids"]
            time_embeds = timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim
            ).reshape(b, -1)
            add_embeds = torch.cat(
                [added_cond_kwargs["text_embeds"].float(), time_embeds], dim=-1
            )
            emb = emb + self.add_embedding(add_embeds)

        sample = self.conv_in(sample)
        stack = [sample]
        for block in self.down_blocks:
            sample, res = block(sample, emb, encoder_hidden_states)
            stack.extend(res)
        sample = self.mid_block(sample, emb, encoder_hidden_states)
        for block in self.up_blocks:
            n_pop = self.cfg.layers_per_block + 1
            res, stack = stack[-n_pop:], stack[:-n_pop]
            sample = block(sample, res, emb, encoder_hidden_states)
        return self.conv_out(F.silu(self.conv_norm_out(sample)))
