"""text2img inference + LoRA A/B pipeline over the synthetic checkpoint
(CPU): load_models -> generate_latents -> multiplier A/B semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # jitted multi-step denoise loops

from leco_tpu.infer import GenerationConfig, ab_compare, generate_latents
from leco_tpu.lora import LoRASpec
from tests.test_loader_integration import fake_checkpoint  # fixture reuse


@pytest.fixture(scope="module")
def loaded(fake_checkpoint):
    from leco_tpu.models.loader import load_models

    root, _ = fake_checkpoint
    return load_models(str(root), "ddim", lora_spec=LoRASpec(rank=2), remat=False)


GEN = GenerationConfig(height=64, width=64, num_inference_steps=3, seed=7)


class TestGenerate:
    def test_latents_shape(self, loaded):
        latents = generate_latents(loaded, "van gogh", "", GEN)
        assert latents.shape == (1, 8, 8, 4)
        assert np.isfinite(np.asarray(latents)).all()

    def test_seed_determinism(self, loaded):
        a = generate_latents(loaded, "van gogh", "", GEN)
        b = generate_latents(loaded, "van gogh", "", GEN)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_prompt_changes_output(self, loaded):
        a = generate_latents(loaded, "van gogh", "", GEN)
        b = generate_latents(loaded, "cat", "", GEN)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_ab_multiplier_semantics(self, loaded):
        """multiplier 0 == base; nonzero multiplier changes the output; -1
        and +1 differ (the AddNet weight grid protocol)."""
        lora = jax.tree.map(
            lambda x: jnp.ones_like(x) * 0.02, loaded.unet_lora_params
        )
        grids = ab_compare(
            loaded, lora, "van gogh", multipliers=(-1.0, 0.0, 1.0), gen=GEN
        )
        base = generate_latents(loaded, "van gogh", "", GEN)
        np.testing.assert_allclose(
            np.asarray(grids[0.0]), np.asarray(base), atol=1e-5
        )
        assert not np.allclose(np.asarray(grids[1.0]), np.asarray(base))
        assert not np.allclose(np.asarray(grids[-1.0]), np.asarray(grids[1.0]))

    def test_noise_offset(self, loaded):
        gen2 = GenerationConfig(
            height=64, width=64, num_inference_steps=3, seed=7, noise_offset=0.5
        )
        a = generate_latents(loaded, "van gogh", "", GEN)
        b = generate_latents(loaded, "van gogh", "", gen2)
        assert not np.allclose(np.asarray(a), np.asarray(b))
