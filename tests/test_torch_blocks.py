"""Block-level wiring cross-validation: independent torch implementations of
the SD building blocks (written from the published diffusers architecture:
pre-norm resnet with time-emb add between convs, pre-LN transformer block
with attn1 -> attn2 -> GEGLU-FF, value/gate split order), driven by weights
converted FROM the flax init. Catches wiring mistakes the per-op parity
tests cannot."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from leco_tpu.models.unet import BasicTransformerBlock, ResnetBlock2D


def torch_resnet_forward(p, x_nchw, temb):
    """diffusers ResnetBlock2D: GN-SiLU-conv1, +time_emb_proj(SiLU(temb)),
    GN-SiLU-conv2, residual (+1x1 shortcut when channels change)."""

    def gn(name, h):
        return F.group_norm(h, 4, p[f"{name}.weight"], p[f"{name}.bias"], 1e-5)

    h = F.silu(gn("norm1", x_nchw))
    h = F.conv2d(h, p["conv1.weight"], p["conv1.bias"], padding=1)
    t = F.linear(F.silu(temb), p["time_emb_proj.weight"], p["time_emb_proj.bias"])
    h = h + t[:, :, None, None]
    h = F.silu(gn("norm2", h))
    h = F.conv2d(h, p["conv2.weight"], p["conv2.bias"], padding=1)
    skip = x_nchw
    if "conv_shortcut.weight" in p:
        skip = F.conv2d(skip, p["conv_shortcut.weight"], p["conv_shortcut.bias"])
    return skip + h


def torch_attention(p, prefix, x, ctx):
    q = F.linear(x, p[f"{prefix}.to_q.weight"])
    k = F.linear(ctx, p[f"{prefix}.to_k.weight"])
    v = F.linear(ctx, p[f"{prefix}.to_v.weight"])
    b, n, c = q.shape
    heads = 2
    d = c // heads
    q = q.reshape(b, n, heads, d).permute(0, 2, 1, 3)
    k = k.reshape(b, -1, heads, d).permute(0, 2, 1, 3)
    v = v.reshape(b, -1, heads, d).permute(0, 2, 1, 3)
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.permute(0, 2, 1, 3).reshape(b, n, c)
    return F.linear(o, p[f"{prefix}.to_out.0.weight"], p[f"{prefix}.to_out.0.bias"])


def torch_transformer_block(p, x, ctx):
    """diffusers BasicTransformerBlock: x += attn1(LN1(x));
    x += attn2(LN2(x), ctx); x += ff(LN3(x)) with GEGLU (value, gate)."""

    def ln(name, h):
        return F.layer_norm(h, (h.shape[-1],), p[f"{name}.weight"], p[f"{name}.bias"], 1e-5)

    x = x + torch_attention(p, "attn1", ln("norm1", x), ln("norm1", x))
    x = x + torch_attention(p, "attn2", ln("norm2", x), ctx)
    h = F.linear(ln("norm3", x), p["ff.net.0.proj.weight"], p["ff.net.0.proj.bias"])
    value, gate = h.chunk(2, dim=-1)
    h = value * F.gelu(gate)
    x = x + F.linear(h, p["ff.net.2.weight"], p["ff.net.2.bias"])
    return x


def _flax_to_torch_params(params, prefix=()):
    """flax tree -> {dotted torch name: tensor} via the standard layout rules."""
    from flax.traverse_util import flatten_dict

    out = {}
    for path, v in flatten_dict(params).items():
        v = np.asarray(v)
        name = ".".join(
            ("to_out.0" if c == "to_out_0" else c.replace("net_", "net."))
            for c in path[:-1]
        )
        leaf = path[-1]
        if leaf == "kernel":
            v = v.transpose(3, 2, 0, 1) if v.ndim == 4 else v.T
            out[f"{name}.weight"] = torch.from_numpy(np.ascontiguousarray(v))
        elif leaf == "scale":
            out[f"{name}.weight"] = torch.from_numpy(v.copy())
        else:
            out[f"{name}.bias"] = torch.from_numpy(v.copy())
    return out


class TestResnetWiring:
    def test_matches_torch_rederivation(self):
        rng = np.random.RandomState(0)
        x = rng.randn(2, 8, 8, 8).astype(np.float32)  # NHWC
        temb = rng.randn(2, 16).astype(np.float32)
        block = ResnetBlock2D(out_channels=12, num_groups=4)
        params = block.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(temb))[
            "params"
        ]
        out_flax = np.asarray(block.apply({"params": params}, jnp.asarray(x), jnp.asarray(temb)))

        p = _flax_to_torch_params(params)
        out_torch = (
            torch_resnet_forward(
                p, torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(temb)
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(out_flax, out_torch, atol=1e-4)


class TestTransformerBlockWiring:
    def test_matches_torch_rederivation(self):
        rng = np.random.RandomState(1)
        x = rng.randn(2, 16, 8).astype(np.float32)
        ctx = rng.randn(2, 77, 8).astype(np.float32)
        block = BasicTransformerBlock(dim=8, heads=2)
        params = block.init(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ctx)
        )["params"]
        # randomize the zero-init biases/kernels so wiring errors can't hide
        params = jax.tree.map(
            lambda v: v
            + jnp.asarray(
                np.random.RandomState(2).randn(*v.shape).astype(np.float32) * 0.05
            ),
            params,
        )
        out_flax = np.asarray(
            block.apply({"params": params}, jnp.asarray(x), jnp.asarray(ctx))
        )
        p = _flax_to_torch_params(params)
        with torch.no_grad():
            out_torch = torch_transformer_block(
                p, torch.from_numpy(x), torch.from_numpy(ctx)
            ).numpy()
        np.testing.assert_allclose(out_flax, out_torch, atol=1e-4)
