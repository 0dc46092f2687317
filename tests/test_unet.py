"""UNet architecture tests: shapes, naming parity with diffusers paths,
jit-ability, SDXL micro-conditioning path, remat equivalence."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # whole-UNet forwards incl. remat/backends

from leco_tpu.models.unet import (
    UNet2DConditionModel,
    sd15_config,
    sd21_config,
    sdxl_config,
    tiny_unet_config,
)


def _init(config, key=0, **kw):
    model = UNet2DConditionModel(config=config, **kw)
    sample = jnp.zeros((1, 16, 16, config.in_channels))
    ctx = jnp.zeros((1, 77, config.cross_attention_dim))
    added = None
    if config.addition_embed_type == "text_time":
        added = {
            "text_embeds": jnp.zeros((1, 1280)),
            "time_ids": jnp.zeros((1, 6)),
        }
    params = model.init(jax.random.PRNGKey(key), sample, 0, ctx, added)["params"]
    return model, params, sample, ctx, added


class TestTinyUNet:
    def test_forward_shape(self):
        cfg = tiny_unet_config()
        model, params, sample, ctx, _ = _init(cfg)
        out = model.apply({"params": params}, sample, 10, ctx)
        assert out.shape == sample.shape

    def test_jit_and_traced_timestep(self):
        cfg = tiny_unet_config()
        model, params, sample, ctx, _ = _init(cfg)

        @jax.jit
        def f(p, x, t, c):
            return model.apply({"params": p}, x, t, c)

        out = f(params, sample, jnp.float32(999.0), ctx)
        assert out.shape == sample.shape

    def test_batch_timesteps(self):
        cfg = tiny_unet_config()
        model, params, _, _, _ = _init(cfg)
        x = jnp.zeros((3, 16, 16, 4))
        ctx = jnp.zeros((3, 77, cfg.cross_attention_dim))
        t = jnp.array([1.0, 500.0, 999.0])
        out = model.apply({"params": params}, x, t, ctx)
        assert out.shape == x.shape
        # different timesteps must give different outputs
        assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))

    def test_remat_matches(self):
        cfg = tiny_unet_config()
        model, params, sample, ctx, _ = _init(cfg)
        model_r = UNet2DConditionModel(config=cfg, remat=True)
        out = model.apply({"params": params}, sample, 10, ctx)
        out_r = model_r.apply({"params": params}, sample, 10, ctx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-5)

    def test_context_changes_output(self):
        cfg = tiny_unet_config()
        model, params, sample, ctx, _ = _init(cfg)
        ctx2 = ctx + 1.0
        o1 = model.apply({"params": params}, sample, 10, ctx)
        o2 = model.apply({"params": params}, sample, 10, ctx2)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))


class TestNamingParity:
    """Module paths must join with '_' into diffusers/kohya LoRA names
    (reference lora.py:24,191-192)."""

    def test_expected_paths_tiny(self):
        cfg = tiny_unet_config()
        _, params, _, _, _ = _init(cfg)
        flat = flax.traverse_util.flatten_dict(params)
        names = {"_".join(k[:-1]) for k in flat}
        expected = {
            "conv_in",
            "conv_out",
            "time_embedding_linear_1",
            "time_embedding_linear_2",
            "down_blocks_0_resnets_0_conv1",
            "down_blocks_0_resnets_0_time_emb_proj",
            "down_blocks_0_attentions_0_proj_in",
            "down_blocks_0_attentions_0_proj_out",
            "down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q",
            "down_blocks_0_attentions_0_transformer_blocks_0_attn2_to_k",
            "down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_out_0",
            "down_blocks_0_attentions_0_transformer_blocks_0_ff_net_0_proj",
            "down_blocks_0_attentions_0_transformer_blocks_0_ff_net_2",
            "down_blocks_0_downsamplers_0_conv",
            "mid_block_resnets_0_conv1",
            "mid_block_resnets_1_conv2",
            "mid_block_attentions_0_transformer_blocks_0_attn2_to_v",
            "up_blocks_0_resnets_0_conv_shortcut",
            "up_blocks_1_attentions_0_transformer_blocks_0_attn1_to_q",
            "up_blocks_0_upsamplers_0_conv",
        }
        missing = expected - names
        assert not missing, f"missing paths: {sorted(missing)}"

    def test_sd15_param_count(self):
        cfg = sd15_config()
        model = UNet2DConditionModel(config=cfg)
        sample = jax.ShapeDtypeStruct((1, 64, 64, 4), jnp.float32)
        ctx = jax.ShapeDtypeStruct((1, 77, 768), jnp.float32)
        t = jax.ShapeDtypeStruct((), jnp.float32)
        variables = jax.eval_shape(
            lambda s, tt, c: model.init(jax.random.PRNGKey(0), s, tt, c),
            sample, t, ctx,
        )
        n = sum(
            np.prod(x.shape) for x in jax.tree.leaves(variables["params"])
        )
        # diffusers SD1.5 UNet: 859_520_964 params
        assert n == 859_520_964, f"got {n:,}"

    def test_sd21_param_count(self):
        cfg = sd21_config()
        model = UNet2DConditionModel(config=cfg)
        sample = jax.ShapeDtypeStruct((1, 96, 96, 4), jnp.float32)
        ctx = jax.ShapeDtypeStruct((1, 77, 1024), jnp.float32)
        t = jax.ShapeDtypeStruct((), jnp.float32)
        variables = jax.eval_shape(
            lambda s, tt, c: model.init(jax.random.PRNGKey(0), s, tt, c),
            sample, t, ctx,
        )
        n = sum(np.prod(x.shape) for x in jax.tree.leaves(variables["params"]))
        # diffusers SD2.1 UNet: 865_910_724 params
        assert n == 865_910_724, f"got {n:,}"

    def test_sdxl_param_count(self):
        cfg = sdxl_config()
        model = UNet2DConditionModel(config=cfg)
        sample = jax.ShapeDtypeStruct((1, 128, 128, 4), jnp.float32)
        ctx = jax.ShapeDtypeStruct((1, 77, 2048), jnp.float32)
        t = jax.ShapeDtypeStruct((), jnp.float32)
        added = {
            "text_embeds": jax.ShapeDtypeStruct((1, 1280), jnp.float32),
            "time_ids": jax.ShapeDtypeStruct((1, 6), jnp.float32),
        }
        variables = jax.eval_shape(
            lambda s, tt, c, a: model.init(jax.random.PRNGKey(0), s, tt, c, a),
            sample, t, ctx, added,
        )
        n = sum(np.prod(x.shape) for x in jax.tree.leaves(variables["params"]))
        # diffusers SDXL-base UNet: 2_567_463_684 params
        assert n == 2_567_463_684, f"got {n:,}"


class TestSDXLPath:
    def test_tiny_xl_forward(self):
        cfg = tiny_unet_config()
        cfg = type(cfg)(
            **{
                **cfg.__dict__,
                "addition_embed_type": "text_time",
                "addition_time_embed_dim": 4,
                "projection_class_embeddings_input_dim": 4 * 6 + 8,
            }
        )
        model = UNet2DConditionModel(config=cfg)
        sample = jnp.zeros((2, 16, 16, 4))
        ctx = jnp.zeros((2, 77, cfg.cross_attention_dim))
        added = {
            "text_embeds": jnp.ones((2, 8)),
            "time_ids": jnp.tile(
                jnp.array([[512, 512, 0, 0, 512, 512]], jnp.float32), (2, 1)
            ),
        }
        params = model.init(jax.random.PRNGKey(0), sample, 0, ctx, added)["params"]
        flat = flax.traverse_util.flatten_dict(params)
        names = {"_".join(k[:-1]) for k in flat}
        assert "add_embedding_linear_1" in names
        out = model.apply({"params": params}, sample, 10, ctx, added)
        assert out.shape == sample.shape

    def test_missing_added_cond_raises(self):
        cfg = tiny_unet_config()
        cfg = type(cfg)(**{**cfg.__dict__, "addition_embed_type": "text_time"})
        model = UNet2DConditionModel(config=cfg)
        with pytest.raises(AssertionError):
            model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 16, 16, 4)),
                0,
                jnp.zeros((1, 77, cfg.cross_attention_dim)),
            )


class TestDtypes:
    def test_bf16_compute(self):
        cfg = tiny_unet_config()
        model = UNet2DConditionModel(config=cfg, dtype=jnp.bfloat16)
        sample = jnp.zeros((1, 16, 16, 4), jnp.bfloat16)
        ctx = jnp.zeros((1, 77, cfg.cross_attention_dim), jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(0), sample, 0, ctx)["params"]
        out = model.apply({"params": params}, sample, 10, ctx)
        assert out.dtype == jnp.bfloat16


class TestSD2StyleConfig:
    """SD2.x-specific paths: linear proj_in/proj_out, fp32-upcast attention,
    per-level head counts."""

    def _cfg(self):
        import dataclasses

        return dataclasses.replace(
            tiny_unet_config(),
            use_linear_projection=True,
            upcast_attention=True,
            attention_head_dim=(2, 4),
        )

    def test_forward_and_lora_targets(self):
        from flax.traverse_util import flatten_dict

        from leco_tpu.lora import LoRASpec, split_lora_params

        cfg = self._cfg()
        model = UNet2DConditionModel(config=cfg, lora_spec=LoRASpec(rank=2))
        x = jnp.zeros((1, 16, 16, 4))
        ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
        params = model.init(jax.random.PRNGKey(0), x, 0, ctx)["params"]
        # proj_in is a Dense now: kernel must be 2-D
        flat = flatten_dict(params)
        k = ("down_blocks_0", "attentions_0", "proj_in", "kernel")
        assert flat[k].ndim == 2
        # and it still gets a (dense) LoRA
        assert ("down_blocks_0", "attentions_0", "proj_in", "lora_down") in flat
        out = model.apply({"params": params}, x, 10, ctx)
        assert out.shape == x.shape
        base, lora = split_lora_params(params)
        assert len(flatten_dict(lora)) > 0

    def test_train_step_runs(self, tmp_path):
        from leco_tpu.testing import make_random_bundle
        from tests.test_trainer import tiny_config, tiny_prompts
        from leco_tpu.train.trainer import train

        bundle = make_random_bundle(config=self._cfg())
        result = train(tiny_config(tmp_path, iterations=2), tiny_prompts(), bundle)
        assert all(np.isfinite(l) for l in result["losses"])
