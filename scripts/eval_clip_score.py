"""Erased-concept CLIP-score delta evaluation (the north-star quality
metric, BASELINE.md).

Generates same-seed image pairs with the LoRA off/on and reports the CLIP
score drop for the erased concept. All models local/offline.

Usage:
  python scripts/eval_clip_score.py \
      --model /models/stable-diffusion-v1-5 \
      --clip /models/clip-vit-large-patch14 \
      --lora output/van_gogh_last.safetensors \
      --concept "van gogh" [--rank 4] [--seeds 0 1 2 3] [--steps 20]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--clip", required=True)
    ap.add_argument("--lora", required=True)
    ap.add_argument("--concept", required=True)
    ap.add_argument("--prompts", nargs="*", default=None)
    ap.add_argument("--rank", type=int, default=4)
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--network", default="lierla")
    ap.add_argument("--v2", action="store_true")
    ap.add_argument("--v_pred", action="store_true")
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2, 3])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--multiplier", type=float, default=1.0)
    args = ap.parse_args()

    from leco_tpu.eval import CLIPScorer, erased_concept_delta
    from leco_tpu.infer import GenerationConfig, decode_latents, generate_latents
    from leco_tpu.lora import LoRASpec, load_lora_weights
    from leco_tpu.models.loader import load_models, load_vae_decoder
    from leco_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    spec = LoRASpec(rank=args.rank, alpha=args.alpha, network_type=args.network)
    models = load_models(
        args.model,
        "ddim",
        v2=args.v2,
        v_pred=args.v_pred,
        weight_dtype=jnp.bfloat16,
        lora_spec=spec,
    )
    lora = load_lora_weights(args.lora, models.unet_lora_params)
    vae, vae_params = load_vae_decoder(args.model, jnp.float32)
    scorer = CLIPScorer.from_pretrained(args.clip)

    def generate_fn(prompt, seed, multiplier):
        gen = GenerationConfig(
            height=args.resolution,
            width=args.resolution,
            num_inference_steps=args.steps,
            guidance_scale=7.0,
            seed=seed,
        )
        return generate_latents(
            models, prompt, "", gen, lora=lora, multiplier=multiplier
        )

    def decode_fn(latents):
        return decode_latents(models, latents, vae=vae, vae_params=vae_params)

    result = erased_concept_delta(
        scorer,
        decode_fn,
        generate_fn,
        args.concept,
        prompts=args.prompts,
        seeds=tuple(args.seeds),
        multiplier=args.multiplier,
    )
    print(json.dumps({"concept": args.concept, **result}))


if __name__ == "__main__":
    main()
