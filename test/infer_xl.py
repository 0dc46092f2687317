"""SDXL inference smoke script — parity with the reference's only test
(test/infer_xl.py in p1atdev/LECO): load SDXL, encode a prompt with both
text encoders, 16-step DDIM denoise at 1024x768, decode with the VAE, save
PNGs. Requires a local SDXL diffusers directory (offline).

Usage: python test/infer_xl.py /models/stable-diffusion-xl-base
"""

import sys

import jax.numpy as jnp

SDXL_NOISE_OFFSET = 0.0357  # reference test/infer_xl.py:26
DDIM_STEPS = 16
HEIGHT, WIDTH = 1024, 768
PROMPT = "a photo of lemonade"
NEGATIVE_PROMPT = ""


def main(model_path: str):
    from leco_tpu.infer import (
        GenerationConfig,
        decode_latents,
        generate_latents,
        save_images,
    )
    from leco_tpu.models.loader import load_models_xl, load_vae_decoder
    from leco_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    models = load_models_xl(model_path, "ddim", weight_dtype=jnp.bfloat16)
    vae, vae_params = load_vae_decoder(model_path, weight_dtype=jnp.float32)

    gen = GenerationConfig(
        height=HEIGHT,
        width=WIDTH,
        num_inference_steps=DDIM_STEPS,
        guidance_scale=7.0,
        seed=0,
        noise_offset=SDXL_NOISE_OFFSET,
    )
    latents = generate_latents(models, PROMPT, NEGATIVE_PROMPT, gen)
    images = decode_latents(models, latents, vae=vae, vae_params=vae_params)
    paths = save_images(images, prefix="output")
    print("saved:", paths)


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1])
