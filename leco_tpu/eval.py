"""Quantitative evaluation: erased-concept CLIP-score delta.

The north-star quality metric (BASELINE.md): generate images for a prompt
containing the target concept with the LoRA OFF (multiplier 0) and ON
(multiplier +1 for erase), score each batch against the concept text with
CLIP, and report the score drop. The reference ships no quantitative eval
(its acceptance test is a visual A/B grid, SURVEY.md section 6).

Requires a local CLIP checkpoint directory (e.g. a clone of
openai/clip-vit-large-patch14: config.json + model weights + tokenizer
files) — fully offline, like every other loader in this framework.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from leco_tpu.models.clip import CLIPTextModel, CLIPTextConfig
from leco_tpu.models.clip_vision import (
    CLIPVisionConfig,
    CLIPVisionModel,
    clip_score,
    preprocess_images,
)
from leco_tpu.models.tokenizer import CLIPTokenizer


@dataclasses.dataclass
class CLIPScorer:
    """Dual-encoder CLIP scorer loaded from a local checkpoint dir."""

    tokenizer: CLIPTokenizer
    text_model: CLIPTextModel
    text_params: dict
    vision_model: CLIPVisionModel
    vision_params: dict
    image_size: int

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.float32) -> "CLIPScorer":
        from leco_tpu.models import convert
        from leco_tpu.models.loader import _load_component_tensors

        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        tcfg_json = cfg.get("text_config", cfg)
        vcfg_json = cfg.get("vision_config", cfg)

        text_config = CLIPTextConfig(
            vocab_size=tcfg_json.get("vocab_size", 49408),
            hidden_size=tcfg_json.get("hidden_size", 768),
            intermediate_size=tcfg_json.get("intermediate_size", 3072),
            num_hidden_layers=tcfg_json.get("num_hidden_layers", 12),
            num_attention_heads=tcfg_json.get("num_attention_heads", 12),
            hidden_act=tcfg_json.get("hidden_act", "quick_gelu"),
            projection_dim=cfg.get("projection_dim", 768),
            eos_token_id=tcfg_json.get("eos_token_id", 49407),
        )
        vision_config = CLIPVisionConfig(
            hidden_size=vcfg_json.get("hidden_size", 1024),
            intermediate_size=vcfg_json.get("intermediate_size", 4096),
            num_hidden_layers=vcfg_json.get("num_hidden_layers", 24),
            num_attention_heads=vcfg_json.get("num_attention_heads", 16),
            image_size=vcfg_json.get("image_size", 224),
            patch_size=vcfg_json.get("patch_size", 14),
            projection_dim=cfg.get("projection_dim", 768),
            hidden_act=vcfg_json.get("hidden_act", "quick_gelu"),
        )

        sd = _load_component_tensors(path)
        text_params = convert.torch_clip_to_flax(
            sd, text_config.num_hidden_layers
        )
        # CLIPModel nests text keys under text_model.; torch_clip_to_flax
        # already strips that prefix. text_projection handled there too.
        vision_params = convert.torch_clip_vision_to_flax(sd)
        cast = lambda t: jax.tree.map(lambda x: jnp.asarray(x, dtype), t)
        return cls(
            tokenizer=CLIPTokenizer.from_pretrained(path),
            text_model=CLIPTextModel(config=text_config, dtype=dtype, param_dtype=dtype),
            text_params=cast(text_params),
            vision_model=CLIPVisionModel(config=vision_config, dtype=dtype, param_dtype=dtype),
            vision_params=cast(vision_params),
            image_size=vision_config.image_size,
        )

    def text_embeds(self, texts: Sequence[str]) -> jnp.ndarray:
        tokens = jnp.asarray(self.tokenizer(list(texts)))
        _, pooled, _ = self.text_model.apply({"params": self.text_params}, tokens)
        return pooled

    def image_embeds(self, images) -> jnp.ndarray:
        pixels = preprocess_images(images, self.image_size)
        return self.vision_model.apply({"params": self.vision_params}, pixels)

    def score(self, images, texts: Sequence[str]) -> np.ndarray:
        """CLIPScore per image against its (broadcast) text."""
        ie = self.image_embeds(images)
        te = self.text_embeds(texts)
        if te.shape[0] == 1 and ie.shape[0] > 1:
            te = jnp.tile(te, (ie.shape[0], 1))
        return np.asarray(clip_score(ie, te))


def erased_concept_delta(
    scorer: CLIPScorer,
    decode_fn,
    generate_fn,
    concept: str,
    prompts: Optional[Sequence[str]] = None,
    seeds: Sequence[int] = (0, 1, 2, 3),
    multiplier: float = 1.0,
) -> dict:
    """Erased-concept CLIP-score delta.

    generate_fn(prompt, seed, multiplier) -> latents;
    decode_fn(latents) -> uint8 images.
    Returns {"base": mean score, "erased": mean score, "delta": base-erased}.
    Positive delta == the concept became less present.
    """
    prompts = list(prompts) if prompts else [concept]
    base_scores, erased_scores = [], []
    for prompt in prompts:
        for seed in seeds:
            img_base = decode_fn(generate_fn(prompt, seed, 0.0))
            img_erased = decode_fn(generate_fn(prompt, seed, multiplier))
            base_scores.append(scorer.score(img_base, [concept]).mean())
            erased_scores.append(scorer.score(img_erased, [concept]).mean())
    base = float(np.mean(base_scores))
    erased = float(np.mean(erased_scores))
    return {"base": base, "erased": erased, "delta": base - erased}
