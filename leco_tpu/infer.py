"""Inference / eval harness: text2img with optional LoRA A/B.

JAX equivalent of the reference's test/infer_xl.py (SDXL smoke script) and
the notebook's before/after A/B protocol (train.ipynb cells 11-12: same
seed, LoRA applied at a chosen multiplier). Works for SD1.x/2.x and SDXL.

The denoising loop is jitted once per (batch, resolution, steps) and driven
by the same pure-JAX schedulers as training; the LoRA multiplier is applied
by scaling the `lora_up` leaves (exact — see leco_tpu/lora.py), reproducing
the A1111 AddNet weight semantics the reference's README documents
(README.md:85-107).
"""

from __future__ import annotations

import dataclasses

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from leco_tpu.lora import (
    LoRASpec,
    compose_lora_params,
    merge_params,
    scale_lora_tree,
)
from leco_tpu.models.loader import LoadedModels
from leco_tpu.prompts import PromptEmbedsXL
from leco_tpu.train import diffusion as diff


# jitted denoise runners, cached per (unet, schedule, guidance, added-conds)
# so repeated generate calls (A/B grids) compile once
_RUNNERS: dict = {}


def _get_runner(models, state, guidance_scale: float, has_added: bool):
    key = (
        id(models.unet),
        state.kind,
        state.prediction_type,
        state.num_inference_steps,
        float(guidance_scale),
        has_added,
    )
    if key not in _RUNNERS:
        n_steps = state.num_inference_steps

        def run(params, k_sched, latents, text_embeddings, added):
            def unet_apply(sample, t, ctx, added_kw):
                return models.unet.apply({"params": params}, sample, t, ctx, added_kw)

            return diff.diffusion(
                unet_apply,
                state,
                k_sched,
                latents,
                text_embeddings,
                n_steps,
                guidance_scale=guidance_scale,
                added_cond_kwargs=added,
            )

        _RUNNERS[key] = jax.jit(run)
    return _RUNNERS[key]


@dataclasses.dataclass
class GenerationConfig:
    height: int = 512
    width: int = 512
    num_inference_steps: int = 20
    guidance_scale: float = 7.0
    seed: int = 0
    noise_offset: float = 0.0  # SDXL smoke used 0.0357 (infer_xl.py:26)


def _encode(models: LoadedModels, prompt: str):
    if not models.is_xl:
        tokens = jnp.asarray(models.tokenizer([prompt]))
        last, _, _ = models.text_encoder.model.apply(
            {"params": models.text_encoder.params}, tokens
        )
        return last
    seqs, pooled = [], None
    for tokenizer, te in (
        (models.tokenizer, models.text_encoder),
        (models.tokenizer_2, models.text_encoder_2),
    ):
        tokens = jnp.asarray(tokenizer([prompt]))
        _, pooled, hidden = te.model.apply({"params": te.params}, tokens)
        seqs.append(hidden[-2])
    return PromptEmbedsXL(jnp.concatenate(seqs, axis=-1), pooled)


def generate_latents(
    models: LoadedModels,
    prompt: str,
    negative_prompt: str = "",
    gen: GenerationConfig = GenerationConfig(),
    lora: Optional[dict | list] = None,
    multiplier: float = 1.0,
    spec: Optional[LoRASpec] = None,
    positive_embeds: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full text2img denoise -> final latents (B, h/8, w/8, 4).

    `lora` is either one LoRA tree (applied at `multiplier`) or a list of
    (tree, multiplier) pairs — the A1111 multi-AddNet composition, folded
    via `compose_lora_params` (requires `spec` for the alpha/rank scale).

    `positive_embeds` (1, 77, d) overrides the positive prompt's encoding
    (SD only) — how a trained textual-inversion embedding enters inference
    (textual_inversion.encode_spliced)."""
    state = models.scheduler.set_timesteps(gen.num_inference_steps)

    params = models.unet_base_params
    if isinstance(lora, (list, tuple)):
        if spec is None:
            raise ValueError("multi-LoRA composition requires spec=LoRASpec(...)")
        params = compose_lora_params(params, lora, spec)
    elif lora is not None and multiplier != 0.0:
        params = merge_params(params, scale_lora_tree(lora, multiplier))

    pos = _encode(models, prompt)
    neg = _encode(models, negative_prompt)
    if positive_embeds is not None:
        if models.is_xl:
            raise ValueError("positive_embeds targets SD1.x/2.x inference")
        pos = jnp.asarray(positive_embeds)
    if models.is_xl:
        # (uncond, cond) order for CFG chunking (train_util.py:133-138)
        text_embeddings = jnp.concatenate(
            [neg.text_embeds, pos.text_embeds], axis=0
        )
        add_text = jnp.concatenate([neg.pooled_embeds, pos.pooled_embeds], axis=0)
        time_ids = jnp.asarray(diff.get_add_time_ids(gen.height, gen.width))
        added = {"text_embeds": add_text, "time_ids": jnp.tile(time_ids, (2, 1))}
    else:
        text_embeddings = jnp.concatenate([neg, pos], axis=0)
        added = None

    key = jax.random.PRNGKey(gen.seed)
    k_lat, k_off, k_sched = jax.random.split(key, 3)
    latents = diff.get_initial_latents(k_lat, state, 1, gen.height, gen.width)
    if gen.noise_offset:
        latents = diff.apply_noise_offset(k_off, latents, gen.noise_offset)

    run = _get_runner(models, state, gen.guidance_scale, added is not None)
    return run(params, k_sched, latents, text_embeddings, added)


def decode_latents(
    models: LoadedModels, latents: jnp.ndarray, vae=None, vae_params=None
) -> np.ndarray:
    """latents -> uint8 HWC images via the VAE decoder
    (test/infer_xl.py:136-153)."""
    if vae is None:
        raise ValueError(
            "pass vae=VAEDecoder(...) + vae_params (load via "
            "leco_tpu.models.loader.load_vae_decoder)"
        )
    z = latents / vae.config.scaling_factor
    images = vae.apply({"params": vae_params}, z)
    images = np.asarray(images, np.float32)
    images = np.clip(images / 2 + 0.5, 0.0, 1.0)
    return (images * 255).round().astype(np.uint8)


def save_images(images: np.ndarray, prefix: str = "output") -> list[str]:
    from PIL import Image

    paths = []
    for i, img in enumerate(images):
        p = f"{prefix}_{i}.png"
        Image.fromarray(img).save(p)
        paths.append(p)
    return paths


def ab_compare(
    models: LoadedModels,
    lora: dict,
    prompt: str,
    negative_prompt: str = "",
    multipliers: tuple = (-1.0, 0.0, 1.0),
    gen: GenerationConfig = GenerationConfig(),
) -> dict[float, jnp.ndarray]:
    """The notebook's A/B protocol (train.ipynb cells 11-12) generalized to
    the reference README's X/Y/Z AddNet-weight grid: same seed, a latents
    batch per multiplier."""
    return {
        m: generate_latents(
            models, prompt, negative_prompt, gen, lora=lora, multiplier=m
        )
        for m in multipliers
    }
