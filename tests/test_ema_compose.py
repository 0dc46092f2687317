"""EMA of LoRA weights (train.ema_decay) and multi-LoRA composition
(compose_lora_params / generate_latents list form) — leco-tpu extensions
beyond the reference (SURVEY.md section 5.4 names resume/EMA as natural
extensions; the A1111 consumer the exports target composes multiple
AddNet LoRAs the same way)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # train loops with EMA

from leco_tpu.config import (
    NetworkConfig,
    PretrainedModelConfig,
    RootConfig,
    SaveConfig,
    TrainConfig,
)
from leco_tpu.lora import LoRASpec, compose_lora_params, fold_lora_params
from leco_tpu.prompts import PromptSettings
from leco_tpu.testing import make_random_bundle
from leco_tpu.train import checkpoint as ckpt
from leco_tpu.train.trainer import train


def _cfg(tmp_path, **train_kwargs):
    kwargs = dict(
        iterations=4,
        max_denoising_steps=3,
        seed=0,
        precision="float32",
    )
    kwargs.update(train_kwargs)
    return RootConfig(
        prompts_file="u.yaml",
        pretrained_model=PretrainedModelConfig(name_or_path="r://t"),
        network=NetworkConfig(rank=4),
        train=TrainConfig(**kwargs),
        save=SaveConfig(name="t", path=str(tmp_path), per_steps=2),
    )


PROMPTS = [PromptSettings(target="x", resolution=64)]


class TestComposeLoRA:
    def _tree(self, seed, d_in=6, d_out=6, r=2):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        return {
            "dense": {
                "lora_down": jax.random.normal(k1, (d_in, r), jnp.float32),
                "lora_up": jax.random.normal(k2, (r, d_out), jnp.float32),
            }
        }

    def test_two_loras_additive(self):
        spec = LoRASpec(rank=2, alpha=1.0)
        base = {"dense": {"kernel": jnp.eye(6, dtype=jnp.float32)}}
        a, b = self._tree(0), self._tree(1)
        out = compose_lora_params(base, [(a, 0.7), (b, -0.3)], spec)
        scale = spec.stored_alpha / 2
        expect = (
            np.eye(6)
            + 0.7 * np.asarray(a["dense"]["lora_down"] @ a["dense"]["lora_up"]) * scale
            - 0.3 * np.asarray(b["dense"]["lora_down"] @ b["dense"]["lora_up"]) * scale
        )
        np.testing.assert_allclose(
            np.asarray(out["dense"]["kernel"]), expect, atol=1e-5
        )

    def test_zero_multiplier_is_identity(self):
        spec = LoRASpec(rank=2, alpha=1.0)
        base = {"dense": {"kernel": jnp.eye(6, dtype=jnp.float32)}}
        out = compose_lora_params(base, [(self._tree(0), 0.0)], spec)
        np.testing.assert_array_equal(
            np.asarray(out["dense"]["kernel"]), np.eye(6)
        )

    def test_order_independent(self):
        spec = LoRASpec(rank=2, alpha=1.0)
        base = {"dense": {"kernel": jnp.eye(6, dtype=jnp.float32)}}
        a, b = self._tree(0), self._tree(1)
        ab = compose_lora_params(base, [(a, 1.0), (b, 1.0)], spec)
        ba = compose_lora_params(base, [(b, 1.0), (a, 1.0)], spec)
        np.testing.assert_allclose(
            np.asarray(ab["dense"]["kernel"]),
            np.asarray(ba["dense"]["kernel"]),
            atol=1e-6,
        )

    def test_split_equals_single(self):
        """[(t, 0.5), (t, 0.5)] == fold(t, 1.0): deltas are additive."""
        spec = LoRASpec(rank=2, alpha=1.0)
        base = {"dense": {"kernel": jnp.eye(6, dtype=jnp.float32)}}
        t = self._tree(3)
        halves = compose_lora_params(base, [(t, 0.5), (t, 0.5)], spec)
        whole = fold_lora_params(base, t, spec)
        np.testing.assert_allclose(
            np.asarray(halves["dense"]["kernel"]),
            np.asarray(whole["dense"]["kernel"]),
            atol=1e-5,
        )


class TestEMATraining:
    def test_decay_near_zero_tracks_weights(self, tmp_path):
        """d -> 0: ema_t = d*ema + (1-d)*w ~= w after every update."""
        bundle = make_random_bundle()
        r = train(_cfg(tmp_path, ema_decay=1e-6), PROMPTS, bundle)
        assert r["ema"] is not None
        for e, w in zip(jax.tree.leaves(r["ema"]), jax.tree.leaves(r["lora"])):
            np.testing.assert_allclose(
                np.asarray(e), np.asarray(w), rtol=1e-4, atol=1e-6
            )

    def test_decay_near_one_stays_at_init(self, tmp_path):
        bundle = make_random_bundle()
        init = jax.tree.map(np.asarray, bundle.lora_params)
        r = train(_cfg(tmp_path, ema_decay=0.999999), PROMPTS, bundle)
        for e, w0 in zip(jax.tree.leaves(r["ema"]), jax.tree.leaves(init)):
            np.testing.assert_allclose(np.asarray(e), w0, rtol=1e-4, atol=1e-6)

    def test_ema_does_not_change_training(self, tmp_path):
        ra = train(_cfg(tmp_path / "a"), PROMPTS, make_random_bundle())
        rb = train(
            _cfg(tmp_path / "b", ema_decay=0.9), PROMPTS, make_random_bundle()
        )
        np.testing.assert_allclose(ra["losses"], rb["losses"], rtol=1e-6)
        assert ra["ema"] is None

    def test_ema_files_written(self, tmp_path):
        train(_cfg(tmp_path, ema_decay=0.9), PROMPTS, make_random_bundle())
        assert (tmp_path / "t_2steps_ema.safetensors").exists()
        assert (tmp_path / "t_last_ema.safetensors").exists()

    def test_invalid_decay_raises(self, tmp_path):
        with pytest.raises(ValueError, match="ema_decay"):
            train(_cfg(tmp_path, ema_decay=1.5), PROMPTS, make_random_bundle())


class TestEMACheckpoint:
    def test_roundtrip_with_ema(self, tmp_path):
        lora = {"l": {"lora_down": jnp.ones((4, 2)), "lora_up": jnp.zeros((2, 4))}}
        ema = jax.tree.map(lambda x: x * 0.5, lora)
        d = tmp_path / "state"
        ckpt.save_train_state(
            d,
            lora=lora,
            opt_state={"mu": {"l": jnp.zeros((4, 2))}},
            iteration=3,
            key=jax.random.PRNGKey(0),
            rng=np.random.default_rng(0),
            ema=ema,
        )
        restored = ckpt.restore_train_state(
            d, like={"lora": lora, "opt_state": {"mu": {"l": jnp.zeros((4, 2))}}}
        )
        np.testing.assert_allclose(
            np.asarray(restored["ema"]["l"]["lora_down"]), 0.5 * np.ones((4, 2))
        )

    def test_old_snapshot_without_ema(self, tmp_path):
        lora = {"l": {"lora_down": jnp.ones((4, 2)), "lora_up": jnp.zeros((2, 4))}}
        d = tmp_path / "state"
        ckpt.save_train_state(
            d,
            lora=lora,
            opt_state={},
            iteration=1,
            key=jax.random.PRNGKey(0),
            rng=np.random.default_rng(0),
        )
        restored = ckpt.restore_train_state(d)
        assert restored is not None
        assert "ema" not in restored

    def test_resume_continues_ema(self, tmp_path):
        """Train with snapshots + EMA, resume — the restored EMA continues
        (ema at the end of the resumed run must differ from a fresh init
        unless decay pins it, and the run must not crash)."""
        r1 = train(
            _cfg(tmp_path, ema_decay=0.5, save_state=True),
            PROMPTS,
            make_random_bundle(),
        )
        assert ckpt.latest_step(tmp_path / "state") == 2
        r2 = train(
            _cfg(tmp_path, ema_decay=0.5, save_state=True, resume=True),
            PROMPTS,
            make_random_bundle(),
        )
        assert len(r2["losses"]) == 1
        assert r2["ema"] is not None


from tests.test_loader_integration import fake_checkpoint  # noqa: F401  fixture


@pytest.fixture(scope="module")
def loaded(fake_checkpoint):  # noqa: F811
    from leco_tpu.models.loader import load_models

    root, _ = fake_checkpoint
    return load_models(str(root), "ddim", lora_spec=LoRASpec(rank=2), remat=False)


class TestMultiLoRAInference:
    def test_list_form_equals_scaled_merge(self, loaded):
        """generate_latents with [(t, 0.5), (t, 0.5)] ~= single t at 1.0
        (fold vs branch form agree to consumer-semantics tolerance)."""
        from tests.test_infer_pipeline import GEN  # reuse tiny gen config
        from leco_tpu.infer import generate_latents

        spec = LoRASpec(rank=2)
        lora = jax.tree.map(
            lambda x: jnp.ones_like(x) * 0.02, loaded.unet_lora_params
        )
        single = generate_latents(loaded, "van gogh", "", GEN, lora=lora,
                                  multiplier=1.0)
        multi = generate_latents(
            loaded, "van gogh", "", GEN, lora=[(lora, 0.5), (lora, 0.5)],
            spec=spec,
        )
        np.testing.assert_allclose(
            np.asarray(single), np.asarray(multi), atol=2e-3
        )

    def test_list_requires_spec(self, loaded):
        from leco_tpu.infer import generate_latents

        with pytest.raises(ValueError, match="spec"):
            generate_latents(
                loaded, "x", "", lora=[(loaded.unet_lora_params, 1.0)]
            )
