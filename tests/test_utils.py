"""Utility coverage: NaN guard, StepTimer, debug summaries, native fallback."""

import numpy as np
import pytest


class TestNaNGuard:
    def test_raises_on_nonfinite(self, tmp_path):
        from leco_tpu.config import (
            NetworkConfig,
            PretrainedModelConfig,
            RootConfig,
            SaveConfig,
            TrainConfig,
        )
        from leco_tpu.prompts import PromptSettings
        from leco_tpu.testing import make_random_bundle
        from leco_tpu.train.trainer import train

        bundle = make_random_bundle()
        # poison the base params -> loss becomes NaN
        import jax
        import jax.numpy as jnp

        bundle.base_params = jax.tree.map(
            lambda x: x * jnp.nan, bundle.base_params
        )
        config = RootConfig(
            prompts_file="u.yaml",
            pretrained_model=PretrainedModelConfig(name_or_path="r://t"),
            # rank 4 matches test_checkpoint's resume recipe so both share
            # one persistent-cache step entry (the iteration count and the
            # denoise bound are host-side / traced and don't change the
            # compiled program)
            network=NetworkConfig(rank=4),
            train=TrainConfig(
                iterations=2, max_denoising_steps=2, seed=0, precision="float32"
            ),
            save=SaveConfig(name="nan", path=str(tmp_path)),
        )
        with pytest.raises(FloatingPointError):
            train(config, [PromptSettings(target="x", resolution=64)], bundle)


class TestStepTimer:
    def test_summary(self):
        import time

        from leco_tpu.utils.profiling import StepTimer

        t = StepTimer(warmup=1)
        for i in range(4):
            t(i, 0.0)
            time.sleep(0.01)
        s = t.summary()
        assert s["n"] == 2  # 3 intervals - 1 warmup
        assert s["its_per_sec"] > 0
        assert s["min_s"] <= s["mean_s"] <= s["max_s"]

    def test_empty(self):
        from leco_tpu.utils.profiling import StepTimer

        assert StepTimer().summary() == {"its_per_sec": 0.0}


class TestDebugChecks:
    def test_summaries(self):
        import jax.numpy as jnp

        from leco_tpu.utils.debug import check_frozen_params, check_trainable_params

        lora = {"a": {"lora_down": jnp.zeros((4, 2)), "lora_up": jnp.zeros((2, 4))}}
        s = check_trainable_params(lora)
        assert s["trainable params"] == 16
        assert s["lora layers"] == 1
        base = {"a": {"kernel": jnp.zeros((4, 4))}}
        s2 = check_frozen_params(base)
        assert s2["frozen params"] == 16


class TestNativeFallback:
    def test_python_fallback_when_disabled(self, monkeypatch):
        """LECO_TPU_NATIVE=0 must yield identical tokenization via Python."""
        import importlib

        import leco_tpu.native as native_mod

        monkeypatch.setenv("LECO_TPU_NATIVE", "0")
        importlib.reload(native_mod)
        assert native_mod.load_bpe_library() is None
        from leco_tpu.models.tokenizer import make_tiny_tokenizer

        tok = make_tiny_tokenizer(["van", "gogh"])
        assert tok._native is None
        ids = tok(["van gogh"])
        assert ids.shape == (1, 77)
        monkeypatch.delenv("LECO_TPU_NATIVE")
        importlib.reload(native_mod)


class TestMultihostSeed:
    def test_single_process_passthrough(self):
        from leco_tpu.train.trainer import _multihost_shared_seed

        assert _multihost_shared_seed(5) == 5
        assert _multihost_shared_seed(None) is None
