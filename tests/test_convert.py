"""Weight-conversion tests: the torch->flax mapping is validated by
inverting it — build a torch-layout state dict from a flax init tree, run
the converter, and require exact tree equality. Covers path folding
(ff.net.0.proj, to_out.0, ModuleList indices) and all layout transposes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from leco_tpu.models import convert
from leco_tpu.models.clip import CLIPTextModel, tiny_text_config
from leco_tpu.models.unet import UNet2DConditionModel, tiny_unet_config


def flax_unet_to_torch_dict(params) -> dict:
    """Inverse of convert.torch_unet_to_flax (test-only)."""
    out = {}
    for path, v in flatten_dict(params).items():
        v = np.asarray(v)
        # re-expand folded names: down_blocks_0 -> down_blocks.0
        parts = []
        for comp in path[:-1]:
            pieces = comp.rsplit("_", 1)
            if len(pieces) == 2 and pieces[1].isdigit() and pieces[0] in (
                "down_blocks", "up_blocks", "attentions", "resnets",
                "downsamplers", "upsamplers", "transformer_blocks", "net",
                "to_out", "layers",
            ):
                parts.extend([pieces[0], pieces[1]])
            else:
                parts.append(comp)
        name = ".".join(parts)
        leaf = path[-1]
        if leaf == "kernel":
            if v.ndim == 4:
                out[f"{name}.weight"] = v.transpose(3, 2, 0, 1)
            else:
                out[f"{name}.weight"] = v.T
        elif leaf == "scale":
            out[f"{name}.weight"] = v
        else:
            out[f"{name}.bias"] = v
    return out


class TestUNetConversion:
    def test_roundtrip_tiny(self):
        cfg = tiny_unet_config()
        model = UNet2DConditionModel(config=cfg)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 16, 16, 4)),
            0,
            jnp.zeros((1, 77, cfg.cross_attention_dim)),
        )["params"]
        torch_sd = flax_unet_to_torch_dict(params)
        # sanity: torch-style names present
        assert any("down_blocks.0.attentions.0.proj_in.weight" == k for k in torch_sd)
        assert any(".transformer_blocks.0.attn1.to_q.weight" in k for k in torch_sd)
        assert any(".ff.net.0.proj.weight" in k for k in torch_sd)
        assert any(".to_out.0.weight" in k for k in torch_sd)

        back = convert.torch_unet_to_flax(torch_sd)
        f1 = flatten_dict(params)
        f2 = flatten_dict(back)
        assert set(f1) == set(f2)
        for k in f1:
            np.testing.assert_allclose(
                np.asarray(f1[k]), np.asarray(f2[k]), err_msg=str(k)
            )

    def test_conversion_forward_equivalence(self):
        """Converted params must drive the model identically."""
        cfg = tiny_unet_config()
        model = UNet2DConditionModel(config=cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
        ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, cfg.cross_attention_dim))
        params = model.init(jax.random.PRNGKey(0), x, 0, ctx)["params"]
        back = convert.torch_unet_to_flax(flax_unet_to_torch_dict(params))
        o1 = model.apply({"params": params}, x, 500, ctx)
        o2 = model.apply({"params": back}, x, 500, ctx)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def flax_clip_to_hf_dict(params, with_projection=False) -> dict:
    out = {}
    for path, v in flatten_dict(params).items():
        v = np.asarray(v)
        if path[0] == "text_projection":
            out["text_projection.weight"] = v.T
            continue
        if path[0] in ("token_embedding", "position_embedding"):
            out[f"text_model.embeddings.{path[0]}.weight"] = v
            continue
        if path[0] == "final_layer_norm":
            leaf = "weight" if path[1] == "scale" else "bias"
            out[f"text_model.final_layer_norm.{leaf}"] = v
            continue
        layer = path[0].replace("layers_", "")
        rest = path[1:]
        if rest[0] == "self_attn":
            leaf = "weight" if rest[2] == "kernel" else "bias"
            val = v.T if rest[2] == "kernel" else v
            out[
                f"text_model.encoder.layers.{layer}.self_attn.{rest[1]}.{leaf}"
            ] = val
        elif rest[0].startswith("mlp_"):
            fc = rest[0][len("mlp_") :]
            leaf = "weight" if rest[1] == "kernel" else "bias"
            val = v.T if rest[1] == "kernel" else v
            out[f"text_model.encoder.layers.{layer}.mlp.{fc}.{leaf}"] = val
        else:  # layer norms
            leaf = "weight" if rest[1] == "scale" else "bias"
            out[f"text_model.encoder.layers.{layer}.{rest[0]}.{leaf}"] = v
    return out


class TestCLIPConversion:
    def test_roundtrip(self):
        cfg = tiny_text_config(projection_dim=16)
        model = CLIPTextModel(config=cfg)
        ids = jnp.full((1, 77), 3, jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)["params"]
        hf_sd = flax_clip_to_hf_dict(params, with_projection=True)
        assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in hf_sd
        assert "text_model.embeddings.token_embedding.weight" in hf_sd
        back = convert.torch_clip_to_flax(hf_sd, cfg.num_hidden_layers)
        f1, f2 = flatten_dict(params), flatten_dict(back)
        assert set(f1) == set(f2)
        for k in f1:
            np.testing.assert_allclose(
                np.asarray(f1[k]), np.asarray(f2[k]), err_msg=str(k)
            )

    def test_layer_truncation(self):
        """clip-skip: layers >= num_hidden_layers are dropped."""
        cfg = tiny_text_config()
        model = CLIPTextModel(config=cfg)
        ids = jnp.full((1, 77), 3, jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)["params"]
        hf_sd = flax_clip_to_hf_dict(params)
        back = convert.torch_clip_to_flax(hf_sd, num_hidden_layers=1)
        assert "layers_0" in back
        assert "layers_1" not in back


class TestOpenCLIPConversion:
    def test_in_proj_split(self):
        h = 8
        sd = {
            "cond_stage_model.model.token_embedding.weight": np.zeros((10, h)),
            "cond_stage_model.model.positional_embedding": np.zeros((77, h)),
            "cond_stage_model.model.ln_final.weight": np.ones(h),
            "cond_stage_model.model.ln_final.bias": np.zeros(h),
            "cond_stage_model.model.transformer.resblocks.0.ln_1.weight": np.ones(h),
            "cond_stage_model.model.transformer.resblocks.0.ln_1.bias": np.zeros(h),
            "cond_stage_model.model.transformer.resblocks.0.ln_2.weight": np.ones(h),
            "cond_stage_model.model.transformer.resblocks.0.ln_2.bias": np.zeros(h),
            "cond_stage_model.model.transformer.resblocks.0.attn.in_proj_weight": np.arange(
                3 * h * h, dtype=np.float32
            ).reshape(3 * h, h),
            "cond_stage_model.model.transformer.resblocks.0.attn.in_proj_bias": np.arange(
                3 * h, dtype=np.float32
            ),
            "cond_stage_model.model.transformer.resblocks.0.attn.out_proj.weight": np.zeros((h, h)),
            "cond_stage_model.model.transformer.resblocks.0.attn.out_proj.bias": np.zeros(h),
            "cond_stage_model.model.transformer.resblocks.0.mlp.c_fc.weight": np.zeros((4 * h, h)),
            "cond_stage_model.model.transformer.resblocks.0.mlp.c_fc.bias": np.zeros(4 * h),
            "cond_stage_model.model.transformer.resblocks.0.mlp.c_proj.weight": np.zeros((h, 4 * h)),
            "cond_stage_model.model.transformer.resblocks.0.mlp.c_proj.bias": np.zeros(h),
        }
        out = convert.ldm_openclip_to_hf(sd, hidden_size=h)
        q = out["text_model.encoder.layers.0.self_attn.q_proj.weight"]
        k = out["text_model.encoder.layers.0.self_attn.k_proj.weight"]
        v = out["text_model.encoder.layers.0.self_attn.v_proj.weight"]
        full = np.arange(3 * h * h, dtype=np.float32).reshape(3 * h, h)
        np.testing.assert_array_equal(q, full[:h])
        np.testing.assert_array_equal(k, full[h : 2 * h])
        np.testing.assert_array_equal(v, full[2 * h :])
        assert "text_model.embeddings.position_embedding.weight" in out
