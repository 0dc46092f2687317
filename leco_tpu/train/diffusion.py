"""Diffusion ops: CFG noise prediction, the partial-denoise sampler, latent
init, embedding packing, SDXL micro-conditioning, resolution buckets.

JAX re-design of train_util.py (p1atdev/LECO). Key differences, all
documented in docs/QUIRKS.md:

  * `diffusion(...)` — the reference's eager python loop over
    `scheduler.timesteps[0:t_to]` (train_util.py:171-193) — becomes a
    `lax.fori_loop` with a *traced* bound, so one compiled train step covers
    every sampled `timesteps_to` in [1, max_denoising_steps).
  * Noise comes from explicit PRNG keys (the reference used CPU torch RNG
    then copied to device, train_util.py:20-32).
  * Latents are NHWC.
  * `predict_noise` at guidance_scale == 1 is algebraically the
    text-conditioned branch alone (uncond + 1*(text - uncond)); callers that
    know g == 1 (the four training predictions, train_lora.py:212-256)
    should call the UNet directly on the conditioned batch instead — the
    trainer does exactly that and saves ~2.4x UNet FLOPs per iteration.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from leco_tpu.ops import schedulers as sched

UNET_IN_CHANNELS = 4  # train_util.py:12 — fixed for SD and SDXL
VAE_SCALE_FACTOR = 8  # train_util.py:13
UNET_ATTENTION_TIME_EMBED_DIM = 256  # train_util.py:15 (XL)
TEXT_ENCODER_2_PROJECTION_DIM = 1280  # train_util.py:16
UNET_PROJECTION_CLASS_EMBEDDING_INPUT_DIM = 2816  # train_util.py:17


def get_random_noise(
    key: jax.Array, batch_size: int, height: int, width: int
) -> jnp.ndarray:
    """(B, H/8, W/8, 4) standard normal (train_util.py:20-32, NHWC)."""
    return jax.random.normal(
        key,
        (
            batch_size,
            height // VAE_SCALE_FACTOR,
            width // VAE_SCALE_FACTOR,
            UNET_IN_CHANNELS,
        ),
        jnp.float32,
    )


def apply_noise_offset(
    key: jax.Array, latents: jnp.ndarray, noise_offset: float
) -> jnp.ndarray:
    """Offset noise (train_util.py:36-40): per-(batch, channel) DC shift."""
    shift = jax.random.normal(
        key, (latents.shape[0], 1, 1, latents.shape[-1]), latents.dtype
    )
    return latents + noise_offset * shift


def get_initial_latents(
    key: jax.Array,
    state: sched.SchedulerState,
    n_imgs: int,
    height: int,
    width: int,
    n_prompts: int = 1,
) -> jnp.ndarray:
    """noise * init_noise_sigma, tiled over prompts (train_util.py:43-57)."""
    noise = get_random_noise(key, n_imgs, height, width)
    noise = jnp.tile(noise, (n_prompts, 1, 1, 1))
    return noise * state.init_noise_sigma


def concat_embeddings(
    unconditional: jnp.ndarray, conditional: jnp.ndarray, n_imgs: int
) -> jnp.ndarray:
    """cat([uncond, cond]).repeat_interleave(n_imgs, 0)
    (train_util.py:133-138). Inputs (1, 77, d) -> (2*n_imgs, 77, d)."""
    both = jnp.concatenate([unconditional, conditional], axis=0)
    return jnp.repeat(both, n_imgs, axis=0)


def predict_noise(
    unet_apply: Callable,
    state: sched.SchedulerState,
    step_index,
    latents: jnp.ndarray,
    text_embeddings: jnp.ndarray,
    guidance_scale: float = 7.5,
    added_cond_kwargs: Optional[dict] = None,
    constrain_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """Single-batched CFG prediction (train_util.py:142-168 / 217-257).

    `unet_apply(sample, timesteps, encoder_hidden_states, added_cond_kwargs)`
    closes over the params. `text_embeddings` is the packed (2B, 77, d)
    uncond+cond batch; `step_index` indexes `state`'s schedule.
    `constrain_fn` (optional) applies a sharding constraint to the packed 2B
    CFG input — the point where batch-1 training becomes shardable over dp.
    """
    latent_in = jnp.concatenate([latents] * 2, axis=0)
    if constrain_fn is not None:
        latent_in = constrain_fn(latent_in)
    latent_in = sched.scale_model_input(state, latent_in, step_index)
    t = state.timesteps[step_index]
    noise_pred = unet_apply(latent_in, t, text_embeddings, added_cond_kwargs)
    uncond, text = jnp.split(noise_pred, 2, axis=0)
    return uncond + guidance_scale * (text - uncond)


def diffusion(
    unet_apply: Callable,
    state: sched.SchedulerState,
    key: jax.Array,
    latents: jnp.ndarray,
    text_embeddings: jnp.ndarray,
    total_timesteps,
    guidance_scale: float = 3.0,
    added_cond_kwargs: Optional[dict] = None,
    constrain_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """Partial denoise from pure noise for `total_timesteps` steps of the
    `state` schedule (train_util.py:171-193). `total_timesteps` may be a
    traced scalar; the loop is a lax.fori_loop with static per-step shapes.

    LMS keeps its derivative history in the loop carry; stochastic
    schedulers consume per-step PRNG keys folded from `key`.
    """
    kind = state.kind
    lms_hist = (
        jnp.zeros((sched.LMS_ORDER,) + latents.shape, jnp.float32)
        if kind == "lms"
        else jnp.zeros((0,), jnp.float32)
    )

    def body(i, carry):
        latents, hist = carry
        noise_pred = predict_noise(
            unet_apply,
            state,
            i,
            latents,
            text_embeddings,
            guidance_scale=guidance_scale,
            added_cond_kwargs=added_cond_kwargs,
            constrain_fn=constrain_fn,
        )
        if kind == "ddim":
            latents = sched.step_ddim(state, noise_pred, i, latents)
        elif kind == "ddpm":
            latents = sched.step_ddpm(
                state, noise_pred, i, latents, jax.random.fold_in(key, i)
            )
        elif kind == "euler_a":
            latents = sched.step_euler_a(
                state, noise_pred, i, latents, jax.random.fold_in(key, i)
            )
        elif kind == "lms":
            latents, hist = sched.step_lms(state, noise_pred, i, latents, hist)
        else:
            raise ValueError(kind)
        return latents, hist

    latents, _ = jax.lax.fori_loop(0, total_timesteps, body, (latents, lms_hist))
    return latents


def get_add_time_ids(
    height: int,
    width: int,
    dynamic_crops: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """SDXL micro-conditioning [orig_h, orig_w, crop_t, crop_l, target_h,
    target_w] (train_util.py:294-330). Host-side (static per iteration)."""
    if dynamic_crops:
        rng = rng or np.random.default_rng()
        random_scale = float(rng.random()) * 2 + 1
        original_size = (int(height * random_scale), int(width * random_scale))
        crops_coords_top_left = (
            int(rng.integers(0, original_size[0] - height)),
            int(rng.integers(0, original_size[1] - width)),
        )
        target_size = (height, width)
    else:
        original_size = (height, width)
        crops_coords_top_left = (0, 0)
        target_size = (height, width)

    add_time_ids = list(original_size + crops_coords_top_left + target_size)

    passed_add_embed_dim = (
        UNET_ATTENTION_TIME_EMBED_DIM * len(add_time_ids)
        + TEXT_ENCODER_2_PROJECTION_DIM
    )
    if passed_add_embed_dim != UNET_PROJECTION_CLASS_EMBEDDING_INPUT_DIM:
        raise ValueError(
            f"Model expects an added time embedding vector of length "
            f"{UNET_PROJECTION_CLASS_EMBEDDING_INPUT_DIM}, but a vector of "
            f"{passed_add_embed_dim} was created."
        )
    return np.array([add_time_ids], dtype=np.float32)


def get_random_resolution_in_bucket(
    rng: np.random.Generator, bucket_resolution: int = 512
) -> tuple[int, int]:
    """Random (h, w) multiples of 64 in [res/2, res) — the upper bound is
    exclusive, so the configured resolution itself is never drawn; this
    matches the reference's torch.randint semantics (train_util.py:404-416,
    SURVEY.md quirk 13)."""
    step = 64
    min_step = bucket_resolution // 2 // step
    max_step = bucket_resolution // step
    height = int(rng.integers(min_step, max_step)) * step
    width = int(rng.integers(min_step, max_step)) * step
    return height, width
