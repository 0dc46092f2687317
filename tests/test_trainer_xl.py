"""SDXL train path on a tiny UNet: added-cond plumbing end to end."""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # runs real train() loops (XL)

from leco_tpu.config import (
    LoggingConfig,
    NetworkConfig,
    OtherConfig,
    PretrainedModelConfig,
    RootConfig,
    SaveConfig,
    TrainConfig,
)
from leco_tpu.models.unet import tiny_unet_config
from leco_tpu.prompts import PromptSettings
from leco_tpu.testing import make_random_bundle
from leco_tpu.train.diffusion import get_add_time_ids
from leco_tpu.train.trainer import build_pack, encode_prompt_pairs, train


def tiny_xl_config_obj():
    cfg = tiny_unet_config()
    return dataclasses.replace(
        cfg,
        addition_embed_type="text_time",
        addition_time_embed_dim=4,
        projection_class_embeddings_input_dim=4 * 6 + 8,
    )


def make_xl_bundle():
    return make_random_bundle(config=tiny_xl_config_obj())


class TestXLTrainer:
    def test_end_to_end(self, tmp_path):
        bundle = make_xl_bundle()
        assert bundle.is_xl
        config = RootConfig(
            prompts_file="unused.yaml",
            pretrained_model=PretrainedModelConfig(name_or_path="random://xl"),
            network=NetworkConfig(rank=4),
            train=TrainConfig(
                iterations=2, max_denoising_steps=3, seed=0, precision="float32"
            ),
            save=SaveConfig(name="xl", path=str(tmp_path)),
            logging=LoggingConfig(),
            other=OtherConfig(),
        )
        prompts = [PromptSettings(target="van gogh", resolution=64, batch_size=1)]
        result = train(config, prompts, bundle)
        assert all(np.isfinite(l) for l in result["losses"])
        assert (tmp_path / "xl_last.safetensors").exists()

    def test_dynamic_crops(self, tmp_path):
        bundle = make_xl_bundle()
        config = RootConfig(
            prompts_file="u.yaml",
            pretrained_model=PretrainedModelConfig(name_or_path="random://xl"),
            network=NetworkConfig(rank=4),
            train=TrainConfig(
                iterations=2, max_denoising_steps=3, seed=0, precision="float32"
            ),
            save=SaveConfig(name="xlc", path=str(tmp_path)),
        )
        prompts = [
            PromptSettings(
                target="v", resolution=64, batch_size=1, dynamic_crops=True
            )
        ]
        result = train(config, prompts, bundle)
        assert all(np.isfinite(l) for l in result["losses"])

    def test_pack_added_conds(self):
        bundle = make_xl_bundle()
        pairs = encode_prompt_pairs(
            [PromptSettings(target="t", batch_size=2)],
            bundle.encode_fn,
            is_xl=True,
        )
        pack = build_pack(pairs[0], is_xl=True, height=64, width=64)
        assert pack["inner_added"]["time_ids"].shape == (4, 6)
        assert pack["ref_added"]["time_ids"].shape == (6, 6)
        assert pack["target_added"]["time_ids"].shape == (2, 6)
        assert pack["inner_added"]["text_embeds"].shape == (4, 8)


class TestAddTimeIds:
    def test_static(self):
        ids = get_add_time_ids(1024, 768)
        np.testing.assert_array_equal(
            ids, np.array([[1024, 768, 0, 0, 1024, 768]], np.float32)
        )

    def test_dynamic_crops(self):
        rng = np.random.default_rng(0)
        ids = get_add_time_ids(512, 512, dynamic_crops=True, rng=rng)[0]
        orig_h, orig_w, top, left, th, tw = ids
        assert 512 <= orig_h <= 3 * 512 and 512 <= orig_w <= 3 * 512
        assert 0 <= top <= orig_h - 512 and 0 <= left <= orig_w - 512
        assert (th, tw) == (512, 512)

    def test_dim_guard(self):
        """the 2816 assert (train_util.py:324-327) fires for wrong dims."""
        from leco_tpu.train import diffusion as diff

        orig = diff.TEXT_ENCODER_2_PROJECTION_DIM
        try:
            diff.TEXT_ENCODER_2_PROJECTION_DIM = 999
            with pytest.raises(ValueError):
                get_add_time_ids(512, 512)
        finally:
            diff.TEXT_ENCODER_2_PROJECTION_DIM = orig
