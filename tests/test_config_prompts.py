"""Config + prompt layer: YAML surface parity with the reference
(config_util.py, prompt_util.py), including quirk-compatible acceptance of
unknown fields and the validator default-fills."""

import jax.numpy as jnp
import numpy as np
import pytest

from leco_tpu.config import load_config_from_yaml, parse_precision
from leco_tpu.prompts import (
    PromptEmbedsCache,
    PromptSettings,
    esd_loss,
    load_prompts_from_yaml,
)

CONFIG_YAML = """
prompts_file: "{prompts}"
pretrained_model:
  name_or_path: "some/model"
  v2: true
  v_pred: true
network:
  type: "lierla"
  rank: 16
  alpha: 1.0
train:
  precision: "bfloat16"
  noise_scheduler: "ddim"
  iterations: 2000
  batch_size: 2   # unknown field, pydantic-v1 silently dropped it
  lr: 1e-4
  optimizer: "AdamW"
  lr_scheduler: "constant"
save:
  name: "cat_ears"
  path: "./output/cat_ears_2"
  per_steps: 200
  precision: "bfloat16"
logging:
  use_wandb: true
  verbose: true
other:
  use_xformers: true
"""

PROMPTS_YAML = """
- target: "1girl"
  positive: "1girl, cat ears"
  unconditional: ""
  neutral: ""
  action: "enhance"
  guidance_scale: 1.0
  resolution: 512
  batch_size: 2
- target: "van gogh"
"""


@pytest.fixture
def config_files(tmp_path):
    prompts = tmp_path / "prompts.yaml"
    prompts.write_text(PROMPTS_YAML)
    cfg = tmp_path / "config.yaml"
    cfg.write_text(CONFIG_YAML.format(prompts=prompts))
    return cfg, prompts


class TestConfig:
    def test_load_full(self, config_files):
        cfg, _ = config_files
        root = load_config_from_yaml(str(cfg))
        assert root.network.rank == 16
        assert root.train.iterations == 2000
        assert root.train.optimizer == "AdamW"
        assert root.save.per_steps == 200
        assert root.other.use_xformers is True
        assert root.pretrained_model.v_pred is True

    def test_unknown_field_ignored(self, config_files):
        cfg, _ = config_files
        root = load_config_from_yaml(str(cfg))
        assert not hasattr(root.train, "batch_size")

    def test_missing_sections_defaulted(self, tmp_path):
        cfg = tmp_path / "c.yaml"
        cfg.write_text(
            'prompts_file: "p.yaml"\npretrained_model:\n  name_or_path: "m"\n'
            "network:\n  rank: 4\n"
        )
        root = load_config_from_yaml(str(cfg))
        assert root.train.iterations == 500
        assert root.train.lr == 1e-4
        assert root.save.name == "untitled"
        assert root.logging.use_wandb is False
        assert root.other.use_xformers is False

    def test_parse_precision(self):
        assert parse_precision("bf16") == jnp.bfloat16
        assert parse_precision("bfloat16") == jnp.bfloat16
        assert parse_precision("fp32") == jnp.float32
        assert parse_precision("float16") == jnp.float16
        with pytest.raises(ValueError):
            parse_precision("int8")


class TestPrompts:
    def test_fill_defaults(self, config_files):
        _, prompts_file = config_files
        prompts = load_prompts_from_yaml(str(prompts_file))
        assert len(prompts) == 2
        p = prompts[1]
        assert p.positive == "van gogh"  # filled from target
        assert p.unconditional == ""
        assert p.neutral == ""  # filled from unconditional
        assert p.action == "erase"
        assert p.guidance_scale == 1.0
        assert p.resolution == 512
        assert p.batch_size == 1

    def test_neutral_follows_unconditional(self):
        p = PromptSettings(target="x", unconditional="low quality")
        assert p.neutral == "low quality"

    def test_missing_target_raises(self):
        with pytest.raises(Exception):
            PromptSettings(positive="y")

    def test_empty_file_raises(self, tmp_path):
        f = tmp_path / "empty.yaml"
        f.write_text("[]")
        with pytest.raises(ValueError):
            load_prompts_from_yaml(str(f))

    def test_cache(self):
        cache = PromptEmbedsCache()
        assert cache["missing"] is None
        cache["a"] = jnp.ones((1, 77, 768))
        assert cache["a"].shape == (1, 77, 768)


class TestESDLoss:
    def test_erase_zero_when_on_target(self):
        t = jnp.full((1, 4, 4, 4), 0.5)
        pos = jnp.full((1, 4, 4, 4), 1.0)
        unc = jnp.full((1, 4, 4, 4), 0.25)
        neu = t + 1.0 * (pos - unc)  # so neutral - g*(pos-unc) == t
        loss = esd_loss(t, pos, unc, neu, guidance_scale=1.0, erase_sign=1.0)
        assert float(loss) == pytest.approx(0.0, abs=1e-6)

    def test_enhance_is_mirrored(self):
        k = np.random.RandomState(0)
        t, pos, unc, neu = [
            jnp.asarray(k.randn(1, 4, 4, 4), jnp.float32) for _ in range(4)
        ]
        g = 2.0
        erase = esd_loss(t, pos, unc, neu, g, erase_sign=1.0)
        enhance = esd_loss(t, pos, unc, neu, g, erase_sign=-1.0)
        # manual
        goal_e = neu - g * (pos - unc)
        goal_h = neu + g * (pos - unc)
        np.testing.assert_allclose(
            float(erase), float(jnp.mean((t - goal_e) ** 2)), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(enhance), float(jnp.mean((t - goal_h) ** 2)), rtol=1e-6
        )

    def test_fp32_upcast(self):
        t = jnp.zeros((2, 2, 2, 4), jnp.bfloat16)
        loss = esd_loss(t, t, t, t, 1.0, 1.0)
        assert loss.dtype == jnp.float32
