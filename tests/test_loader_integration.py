"""Full-stack integration: synthetic tiny diffusers checkpoint on disk ->
load_models -> converted Flax params -> CLI train() -> safetensors export.
This is the offline equivalent of the reference's only end-to-end check
(the notebook run, SURVEY.md section 4)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # CLI end-to-end over an on-disk checkpoint
from safetensors.numpy import save_file

from leco_tpu.models.clip import CLIPTextModel, CLIPTextConfig
from leco_tpu.models.tokenizer import make_tiny_tokenizer
from leco_tpu.models.unet import UNet2DConditionModel, tiny_unet_config
from tests.test_convert import flax_clip_to_hf_dict, flax_unet_to_torch_dict


@pytest.fixture(scope="module")
def fake_checkpoint(tmp_path_factory):
    """Write a tiny diffusers-layout checkpoint directory."""
    root = tmp_path_factory.mktemp("ckpt")

    # --- tokenizer
    tok = make_tiny_tokenizer(["van", "gogh", "cat"])
    tdir = root / "tokenizer"
    tdir.mkdir()
    (tdir / "vocab.json").write_text(json.dumps(tok.vocab))
    merges = [" ".join(m) for m in sorted(tok.bpe_ranks, key=tok.bpe_ranks.get)]
    (tdir / "merges.txt").write_text("#version\n" + "\n".join(merges))

    # --- text encoder (vocab must cover the tokenizer ids)
    te_cfg = CLIPTextConfig(
        vocab_size=len(tok.vocab),
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        hidden_act="quick_gelu",
        eos_token_id=tok.eos_token_id,
    )
    te = CLIPTextModel(config=te_cfg)
    te_params = te.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
    )["params"]
    tedir = root / "text_encoder"
    tedir.mkdir()
    (tedir / "config.json").write_text(
        json.dumps(
            {
                "architectures": ["CLIPTextModel"],
                "vocab_size": te_cfg.vocab_size,
                "hidden_size": 32,
                "intermediate_size": 64,
                "num_hidden_layers": 2,
                "num_attention_heads": 2,
                "max_position_embeddings": 77,
                "hidden_act": "quick_gelu",
                "eos_token_id": tok.eos_token_id,
            }
        )
    )
    hf_sd = flax_clip_to_hf_dict(te_params)
    save_file(
        {k: np.ascontiguousarray(v) for k, v in hf_sd.items()},
        str(tedir / "model.safetensors"),
    )

    # --- unet (tiny, cross dim 32)
    ucfg = tiny_unet_config()
    unet = UNet2DConditionModel(config=ucfg)
    uparams = unet.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 16, 16, 4)),
        0,
        jnp.zeros((1, 77, 32)),
    )["params"]
    udir = root / "unet"
    udir.mkdir()
    (udir / "config.json").write_text(
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
            }
        )
    )
    torch_sd = flax_unet_to_torch_dict(uparams)
    save_file(
        {k: np.ascontiguousarray(v) for k, v in torch_sd.items()},
        str(udir / "diffusion_pytorch_model.safetensors"),
    )
    return root, uparams


class TestLoader:
    def test_load_models(self, fake_checkpoint):
        from leco_tpu.lora import LoRASpec
        from leco_tpu.models.loader import load_models

        root, uparams = fake_checkpoint
        models = load_models(
            str(root), "ddim", lora_spec=LoRASpec(rank=2), remat=False
        )
        # converted base params match the originals exactly
        from flax.traverse_util import flatten_dict

        f1 = flatten_dict(uparams)
        f2 = flatten_dict(models.unet_base_params)
        assert set(f1) == set(f2)
        for k in f1:
            np.testing.assert_allclose(
                np.asarray(f1[k]), np.asarray(f2[k]), atol=1e-6
            )
        # lora initialized for the targeted layers
        from leco_tpu.lora import count_lora_modules

        assert count_lora_modules(models.unet_lora_params) > 0
        # tokenizer round-trips through the on-disk files
        ids = models.tokenizer(["van gogh"])
        assert ids.shape == (1, 77)

    def test_missing_path_raises(self):
        from leco_tpu.models.loader import load_models

        with pytest.raises(FileNotFoundError):
            load_models("/nonexistent/model", "ddim")

    def test_cli_end_to_end(self, fake_checkpoint, tmp_path, monkeypatch):
        """python train_lora.py --config_file ... over the fake checkpoint."""
        root, _ = fake_checkpoint
        prompts_file = tmp_path / "prompts.yaml"
        prompts_file.write_text(
            "- target: 'van gogh'\n  resolution: 64\n  batch_size: 1\n"
        )
        config_file = tmp_path / "config.yaml"
        config_file.write_text(
            f"""
prompts_file: "{prompts_file}"
pretrained_model:
  name_or_path: "{root}"
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
  name: "cli_test"
  path: "{tmp_path / 'out'}"
"""
        )
        import train_lora

        cfg_path = str(config_file)

        class Args:
            pass

        Args.config_file = cfg_path
        train_lora.main(Args())
        out = tmp_path / "out" / "cli_test_last.safetensors"
        assert out.exists()
        from safetensors.numpy import load_file

        state = load_file(str(out))
        assert any(k.startswith("lora_unet_") for k in state)
