"""SDXL loader integration over a synthetic tiny XL diffusers checkpoint:
dual tokenizers/encoders, pooled embeds, XL generate path."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # XL loader + dual-encoder end-to-end
from safetensors.numpy import save_file

from leco_tpu.models.clip import CLIPTextModel, CLIPTextConfig
from leco_tpu.models.tokenizer import make_tiny_tokenizer
from leco_tpu.models.unet import UNet2DConditionModel, tiny_unet_config
from tests.test_convert import flax_clip_to_hf_dict, flax_unet_to_torch_dict


def tiny_xl_unet_config():
    cfg = tiny_unet_config()
    return dataclasses.replace(
        cfg,
        addition_embed_type="text_time",
        addition_time_embed_dim=4,
        # pooled dim 8 (projection of text encoder 2)
        projection_class_embeddings_input_dim=4 * 6 + 8,
    )


@pytest.fixture(scope="module")
def fake_xl_checkpoint(tmp_path_factory):
    root = tmp_path_factory.mktemp("xl_ckpt")
    tok = make_tiny_tokenizer(["van", "gogh", "lemonade"])

    for sub in ("tokenizer", "tokenizer_2"):
        d = root / sub
        d.mkdir()
        (d / "vocab.json").write_text(json.dumps(tok.vocab))
        merges = [
            " ".join(m) for m in sorted(tok.bpe_ranks, key=tok.bpe_ranks.get)
        ]
        (d / "merges.txt").write_text("#version\n" + "\n".join(merges))

    # text encoders: te1 plain, te2 with projection (pooled dim 8)
    for sub, proj in (("text_encoder", None), ("text_encoder_2", 8)):
        cfg = CLIPTextConfig(
            vocab_size=len(tok.vocab),
            hidden_size=16,
            intermediate_size=32,
            num_hidden_layers=2,
            num_attention_heads=2,
            hidden_act="gelu",
            projection_dim=proj,
            eos_token_id=tok.eos_token_id,
        )
        te = CLIPTextModel(config=cfg)
        params = te.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
        )["params"]
        d = root / sub
        d.mkdir()
        arch = (
            "CLIPTextModelWithProjection" if proj else "CLIPTextModel"
        )
        d.joinpath("config.json").write_text(
            json.dumps(
                {
                    "architectures": [arch],
                    "vocab_size": cfg.vocab_size,
                    "hidden_size": 16,
                    "intermediate_size": 32,
                    "num_hidden_layers": 2,
                    "num_attention_heads": 2,
                    "hidden_act": "gelu",
                    "projection_dim": proj or 512,
                    "eos_token_id": tok.eos_token_id,
                }
            )
        )
        sd = flax_clip_to_hf_dict(params, with_projection=bool(proj))
        save_file(
            {k: np.ascontiguousarray(v) for k, v in sd.items()},
            str(d / "model.safetensors"),
        )

    ucfg = tiny_xl_unet_config()
    # XL context dim = te1 + te2 hidden = 32 == tiny cross dim
    unet = UNet2DConditionModel(config=ucfg)
    added = {
        "text_embeds": jnp.zeros((1, 8)),
        "time_ids": jnp.zeros((1, 6)),
    }
    uparams = unet.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 16, 16, 4)),
        0,
        jnp.zeros((1, 77, 32)),
        added,
    )["params"]
    d = root / "unet"
    d.mkdir()
    d.joinpath("config.json").write_text(
        json.dumps(
            {
                "down_block_types": list(ucfg.down_block_types),
                "up_block_types": list(ucfg.up_block_types),
                "block_out_channels": list(ucfg.block_out_channels),
                "layers_per_block": ucfg.layers_per_block,
                "cross_attention_dim": ucfg.cross_attention_dim,
                "attention_head_dim": ucfg.attention_head_dim,
                "use_linear_projection": ucfg.use_linear_projection,
                "norm_num_groups": ucfg.norm_num_groups,
                "addition_embed_type": "text_time",
                "addition_time_embed_dim": 4,
                "projection_class_embeddings_input_dim": 32,
            }
        )
    )
    torch_sd = flax_unet_to_torch_dict(uparams)
    save_file(
        {k: np.ascontiguousarray(v) for k, v in torch_sd.items()},
        str(d / "diffusion_pytorch_model.safetensors"),
    )
    return root


class TestXLLoader:
    def test_load_and_generate(self, fake_xl_checkpoint):
        from leco_tpu.infer import GenerationConfig, generate_latents
        from leco_tpu.lora import LoRASpec
        from leco_tpu.models.loader import load_models_xl

        models = load_models_xl(
            str(fake_xl_checkpoint),
            "ddim",
            lora_spec=LoRASpec(rank=2),
            remat=False,
        )
        assert models.is_xl
        assert models.tokenizer_2.pad_token_id == 0  # model_util.py:150
        assert models.text_encoder_2.config.projection_dim == 8

        gen = GenerationConfig(height=64, width=64, num_inference_steps=2, seed=1)
        latents = generate_latents(models, "lemonade", "", gen)
        assert latents.shape == (1, 8, 8, 4)
        assert np.isfinite(np.asarray(latents)).all()

    def test_cli_xl_end_to_end(self, fake_xl_checkpoint, tmp_path):
        prompts_file = tmp_path / "prompts.yaml"
        prompts_file.write_text(
            "- target: 'van gogh'\n  resolution: 64\n  batch_size: 1\n"
        )
        config_file = tmp_path / "config.yaml"
        config_file.write_text(
            f"""
prompts_file: "{prompts_file}"
pretrained_model:
  name_or_path: "{fake_xl_checkpoint}"
network:
  rank: 2
train:
  precision: "float32"
  iterations: 2
  max_denoising_steps: 3
  seed: 0
  data_parallel: false
  checkpoint_unet: false
save:
  name: "xl_cli"
  path: "{tmp_path / 'out'}"
"""
        )
        import train_lora_xl

        cfg_path = str(config_file)

        class Args:
            pass

        Args.config_file = cfg_path
        train_lora_xl.main(Args())
        assert (tmp_path / "out" / "xl_cli_last.safetensors").exists()
