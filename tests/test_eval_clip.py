"""CLIP vision tower + CLIP-score eval harness (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from leco_tpu.models.clip_vision import (
    CLIPVisionModel,
    clip_score,
    preprocess_images,
    tiny_vision_config,
)


class TestVisionModel:
    def _init(self):
        cfg = tiny_vision_config()
        model = CLIPVisionModel(config=cfg)
        x = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        return cfg, model, params, x

    def test_output_shape(self):
        cfg, model, params, x = self._init()
        out = model.apply({"params": params}, x)
        assert out.shape == (2, cfg.projection_dim)

    def test_vit_l_param_count(self):
        """openai/clip-vit-large-patch14 vision tower (+projection): 304M."""
        from leco_tpu.models.clip_vision import CLIPVisionConfig

        cfg = CLIPVisionConfig()
        model = CLIPVisionModel(config=cfg)
        x = jax.ShapeDtypeStruct((1, 224, 224, 3), jnp.float32)
        variables = jax.eval_shape(
            lambda xx: model.init(jax.random.PRNGKey(0), xx), x
        )
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
        # analytic: conv 602112 + cls 1024 + pos 257*1024 + 2 LN 4096
        #   + 24 layers * 12596224 + projection 1024*768
        assert n == 303_966_208, f"got {n:,}"

    def test_conversion_roundtrip(self):
        from leco_tpu.models.convert import torch_clip_vision_to_flax

        cfg, model, params, x = self._init()
        torch_sd = {}
        for path, v in flatten_dict(params).items():
            v = np.asarray(v)
            if path == ("visual_projection", "kernel"):
                torch_sd["visual_projection.weight"] = v.T
            elif path == ("class_embedding",):
                torch_sd["vision_model.embeddings.class_embedding"] = v
            elif path == ("patch_embedding", "kernel"):
                torch_sd["vision_model.embeddings.patch_embedding.weight"] = (
                    v.transpose(3, 2, 0, 1)
                )
            elif path == ("position_embedding", "embedding"):
                torch_sd["vision_model.embeddings.position_embedding.weight"] = v
            elif path[0] in ("pre_layrnorm", "post_layernorm"):
                leaf = "weight" if path[1] == "scale" else "bias"
                torch_sd[f"vision_model.{path[0]}.{leaf}"] = v
            else:  # layers_N
                idx = path[0].split("_")[1]
                rest = path[1:]
                if rest[0] == "self_attn":
                    leaf = "weight" if rest[2] == "kernel" else "bias"
                    val = v.T if rest[2] == "kernel" else v
                    torch_sd[
                        f"vision_model.encoder.layers.{idx}.self_attn.{rest[1]}.{leaf}"
                    ] = val
                elif rest[0].startswith("mlp_"):
                    leaf = "weight" if rest[1] == "kernel" else "bias"
                    val = v.T if rest[1] == "kernel" else v
                    torch_sd[
                        f"vision_model.encoder.layers.{idx}.mlp.{rest[0][4:]}.{leaf}"
                    ] = val
                else:
                    leaf = "weight" if rest[1] == "scale" else "bias"
                    torch_sd[
                        f"vision_model.encoder.layers.{idx}.{rest[0]}.{leaf}"
                    ] = v
        back = torch_clip_vision_to_flax(torch_sd)
        f1, f2 = flatten_dict(params), flatten_dict(back)
        assert set(f1) == set(f2), (
            f"missing {sorted(set(f1)-set(f2))[:3]} extra {sorted(set(f2)-set(f1))[:3]}"
        )
        for k in f1:
            np.testing.assert_allclose(np.asarray(f1[k]), np.asarray(f2[k]))


class TestScoring:
    def test_preprocess(self):
        imgs = np.random.randint(0, 255, (2, 64, 48, 3), np.uint8)
        out = preprocess_images(imgs, 32)
        assert out.shape == (2, 32, 32, 3)
        assert float(jnp.abs(out).max()) < 4.0  # normalized range

    def test_clip_score_identity(self):
        e = jnp.array([[1.0, 0.0], [0.0, 1.0]])
        s = clip_score(e, e)
        np.testing.assert_allclose(np.asarray(s), [100.0, 100.0], atol=1e-4)
        s2 = clip_score(e, e[::-1])
        np.testing.assert_allclose(np.asarray(s2), [0.0, 0.0], atol=1e-4)

    def test_erased_concept_delta_protocol(self):
        """Wire the protocol with stub generate/decode/scorer functions."""
        from leco_tpu.eval import erased_concept_delta

        class StubScorer:
            def score(self, images, texts):
                # pretend multiplier-0 images score high, erased score low
                return np.asarray([images.mean()])

        def generate_fn(prompt, seed, multiplier):
            return np.full((1, 4, 4, 3), 100.0 - multiplier * 50.0)

        def decode_fn(latents):
            return latents

        out = erased_concept_delta(
            StubScorer(), decode_fn, generate_fn, "van gogh", seeds=(0, 1)
        )
        assert out["base"] == pytest.approx(100.0)
        assert out["erased"] == pytest.approx(50.0)
        assert out["delta"] == pytest.approx(50.0)
