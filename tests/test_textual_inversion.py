"""Textual-inversion erasure (leco-tpu extension): trainable token
embeddings under the ESD objective, exported as an A1111 embedding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # runs TI training loops

from leco_tpu.config import (
    NetworkConfig,
    PretrainedModelConfig,
    RootConfig,
    SaveConfig,
    TrainConfig,
)
from leco_tpu.lora import LoRASpec
from leco_tpu.prompts import PromptSettings
from leco_tpu.train.textual_inversion import (
    TextEncoderHandle,
    init_prompt_embedding,
    load_embedding,
    prompt_slots,
    save_embedding,
    train_textual_inversion,
)
from tests.test_loader_integration import fake_checkpoint  # noqa: F401


@pytest.fixture(scope="module")
def setup(fake_checkpoint):  # noqa: F811
    from leco_tpu.models.loader import load_models
    from leco_tpu.train.trainer import ModelBundle

    root, _ = fake_checkpoint
    models = load_models(str(root), "ddim", lora_spec=LoRASpec(rank=2),
                         remat=False)
    te = models.text_encoder

    def encode_fn(prompt: str):
        tokens = jnp.asarray(models.tokenizer([prompt]))
        last, _, _ = te.model.apply({"params": te.params}, tokens)
        return last

    bundle = ModelBundle(
        unet=models.unet,
        base_params=models.unet_base_params,
        lora_params=models.unet_lora_params,
        scheduler=models.scheduler,
        spec=LoRASpec(rank=2),
        encode_fn=encode_fn,
        is_xl=False,
    )
    handle = TextEncoderHandle(
        model=te.model, params=te.params, tokenizer=models.tokenizer
    )
    return bundle, handle


def _cfg(tmp_path, iterations=3):
    return RootConfig(
        prompts_file="u.yaml",
        pretrained_model=PretrainedModelConfig(name_or_path="r://t"),
        network=NetworkConfig(rank=2),
        train=TrainConfig(
            iterations=iterations,
            max_denoising_steps=3,
            seed=0,
            precision="float32",
        ),
        save=SaveConfig(name="ti", path=str(tmp_path), per_steps=2),
    )


class TestSlots:
    def test_real_token_positions(self):
        # BOS, tok, tok, EOS, pad... -> slots [1, 2]
        ids = np.array([[49406, 5, 9, 49407, 49407, 49407]])
        np.testing.assert_array_equal(prompt_slots(ids), [1, 2])

    def test_empty_prompt_raises(self):
        ids = np.array([[49406, 49407, 49407]])
        with pytest.raises(ValueError, match="zero trainable"):
            prompt_slots(ids)


class TestInit:
    def test_rows_match_table(self, setup):
        bundle, handle = setup
        token_ids, slots, emb0 = init_prompt_embedding(handle, "van gogh")
        table = np.asarray(handle.params["token_embedding"]["embedding"])
        ids = np.asarray(token_ids)[0]
        np.testing.assert_allclose(
            np.asarray(emb0), table[ids[slots]].astype(np.float32), rtol=1e-6
        )
        assert emb0.shape[1] == table.shape[1]


class TestTraining:
    def test_end_to_end(self, setup, tmp_path):
        bundle, handle = setup
        token_ids, slots, emb0 = init_prompt_embedding(handle, "van gogh")
        r = train_textual_inversion(
            _cfg(tmp_path),
            [PromptSettings(target="van gogh", resolution=64)],
            bundle,
            handle,
        )
        assert len(r["losses"]) == 3
        assert all(np.isfinite(r["losses"]))
        # the embedding moved
        assert not np.allclose(np.asarray(r["embedding"]), np.asarray(emb0))
        # export exists and roundtrips
        f = tmp_path / "ti_ti.safetensors"
        assert f.exists()
        loaded = load_embedding(f)
        np.testing.assert_allclose(
            np.asarray(loaded), np.asarray(r["embedding"]), rtol=1e-6
        )

    def test_multi_prompt_rejected(self, setup, tmp_path):
        bundle, handle = setup
        two = [
            PromptSettings(target="van gogh", resolution=64),
            PromptSettings(target="cat", resolution=64),
        ]
        with pytest.raises(ValueError, match="one concept"):
            train_textual_inversion(_cfg(tmp_path), two, bundle, handle)


class TestSplicedEncode:
    def test_identity_splice_matches_plain_encode(self, setup):
        """Splicing the UNCHANGED rows back in must reproduce the plain
        token-id path bit-for-bit (also proves the input_embeds hook in
        CLIPTextModel is equivalent to the embedding lookup)."""
        from leco_tpu.train.textual_inversion import encode_spliced

        bundle, handle = setup
        token_ids, slots, emb0 = init_prompt_embedding(handle, "van gogh")
        spliced = encode_spliced(handle, token_ids, slots, emb0)
        plain, _, _ = handle.model.apply({"params": handle.params}, token_ids)
        np.testing.assert_allclose(
            np.asarray(spliced), np.asarray(plain), atol=1e-6
        )

    def test_positive_embeds_override(self, setup, fake_checkpoint, tmp_path):  # noqa: F811
        from leco_tpu.infer import GenerationConfig, generate_latents
        from leco_tpu.models.loader import load_models
        from leco_tpu.train.textual_inversion import encode_spliced

        bundle, handle = setup
        root, _ = fake_checkpoint
        models = load_models(str(root), "ddim", lora_spec=LoRASpec(rank=2),
                             remat=False)
        gen = GenerationConfig(height=64, width=64, num_inference_steps=2,
                               seed=5)
        token_ids, slots, emb0 = init_prompt_embedding(handle, "van gogh")
        base = generate_latents(models, "van gogh", "", gen)
        same = generate_latents(
            models, "van gogh", "", gen,
            positive_embeds=encode_spliced(handle, token_ids, slots, emb0),
        )
        # identity embedding -> identical generation
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(same), atol=1e-5
        )
        # perturbed embedding -> different generation
        moved = generate_latents(
            models, "van gogh", "", gen,
            positive_embeds=encode_spliced(
                handle, token_ids, slots, emb0 + 0.5
            ),
        )
        assert not np.allclose(np.asarray(base), np.asarray(moved))


class TestExportFormat:
    def test_a1111_key_layout(self, tmp_path):
        emb = jnp.ones((2, 8), jnp.float32) * 0.5
        f = tmp_path / "e.safetensors"
        save_embedding(f, emb, "concept")
        from safetensors.numpy import load_file
        import safetensors

        state = load_file(str(f))
        assert list(state) == ["emb_params"]
        assert state["emb_params"].shape == (2, 8)
        with safetensors.safe_open(str(f), framework="np") as sf:
            assert sf.metadata()["name"] == "concept"
