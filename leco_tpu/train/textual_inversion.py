"""Textual-inversion-style concept erasure (leco-tpu extension).

The reference trains a LoRA on the UNet (lora.py in p1atdev/LECO); this
module trains **token embeddings** instead, with the identical ESD
objective and the identical prompt-only self-synthesized data recipe
(SURVEY.md section 2.1 #7, #10): the trainable parameter is the target
prompt's own token-embedding rows (pivotal tuning of the prompt in the
CLIP input space — classic textual inversion, Gal et al. 2022), the UNet
and the rest of the text encoder stay frozen.

Because the trainable lives in the token-embedding space, the exported
artifact is a standard A1111/webui embedding (`.safetensors` with an
`emb_params` tensor of shape (n_tokens, hidden)) usable as a textual
inversion in any SD consumer — drop it in `embeddings/` and reference it
by filename in a (negative) prompt.

TPU shape: one jitted step; the text-encoder forward runs INSIDE the step
(CLIP-L is ~123M params — noise next to the UNet passes) so the gradient
flows UNet -> sequence embedding -> encoder layers -> the trained rows.
The inner partial denoise re-encodes with the CURRENT embedding each
iteration (the "model under optimization synthesizes the data" semantics,
matching the reference's LoRA-on inner loop, train_lora.py:179-193).

SD1.x/2.x only: SDXL prompts feed two encoders whose concatenated widths
make a single input-space embedding ill-defined for export; A1111 XL
embeddings are a dual-part format this module does not target.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from leco_tpu.config import RootConfig, parse_precision
from leco_tpu.prompts import PromptSettings, esd_loss
from leco_tpu.train import diffusion as diff
from leco_tpu.train.optim import get_lr_schedule, get_optimizer
from leco_tpu.train.trainer import ModelBundle, encode_prompt_pairs


@dataclasses.dataclass
class TextEncoderHandle:
    """The pieces of the text stack the TI step needs to keep alive (the
    LoRA trainer frees them after the one-shot prompt encoding)."""

    model: Any  # CLIPTextModel
    params: dict
    tokenizer: Callable  # list[str] -> (B, 77) int ids


def prompt_slots(token_ids: np.ndarray, eos: int = 49407):
    """Positions of the REAL prompt tokens: everything after BOS (always
    position 0) up to the first EOS (exclusive). Those rows become the
    trainable embedding."""
    ids = np.asarray(token_ids).reshape(-1)
    end = int(np.argmax(ids == eos))
    if end <= 1:
        raise ValueError("target prompt tokenized to zero trainable tokens")
    return np.arange(1, end)


def init_prompt_embedding(handle: TextEncoderHandle, prompt: str):
    """tokenize the target prompt and gather the current token-embedding
    rows at its real-token positions -> (token_ids (1,77), slots (n,),
    emb0 (n, hidden) f32)."""
    cfg = handle.model.config
    token_ids = np.asarray(handle.tokenizer([prompt]))
    slots = prompt_slots(token_ids, cfg.eos_token_id)
    table = np.asarray(
        handle.params["token_embedding"]["embedding"], np.float32
    )
    emb0 = jnp.asarray(table[token_ids[0, slots]])
    return jnp.asarray(token_ids), slots, emb0


def make_ti_train_step(
    bundle: ModelBundle,
    handle: TextEncoderHandle,
    token_ids,
    slots: np.ndarray,
    optimizer: optax.GradientTransformation,
    max_denoising_steps: int,
    inner_guidance_scale: float = 3.0,
):
    """Build the jitted TI step. Mirrors trainer.make_train_step's
    skeleton (inner denoise / 3 batched refs / differentiated target pass /
    esd_loss) with the trainable swapped from the LoRA tree to the
    embedding rows. Returns step(base, emb, opt_state, key, pack,
    guidance_scale, erase_sign, timesteps_to, *, height, width)."""
    unet = bundle.unet
    scheduler = bundle.scheduler
    state_n = scheduler.set_timesteps(max_denoising_steps)
    state_full = scheduler.set_timesteps(scheduler.num_train_timesteps)
    num_train_timesteps = scheduler.num_train_timesteps

    te_model, te_params = handle.model, handle.params
    slots = np.asarray(slots)  # static positions, closed over

    def encode_with(emb):
        """Sequence embedding of the target prompt with the trained rows
        spliced into the token embeddings (final-LN last hidden state —
        the SD1/2 convention, train_util.py:77-85)."""
        table = te_params["token_embedding"]["embedding"]
        tok = jnp.take(table, token_ids, axis=0)  # (1, 77, hidden)
        tok = tok.at[:, slots].set(emb[None].astype(tok.dtype))
        last, _, _ = te_model.apply(
            {"params": te_params}, token_ids, input_embeds=tok
        )
        return last

    def apply_unet(params, sample, t, ctx):
        return unet.apply({"params": params}, sample, t, ctx, None)

    @functools.partial(
        jax.jit,
        static_argnames=("height", "width"),
        donate_argnames=("emb", "opt_state"),
    )
    def step(
        base,
        emb,
        opt_state,
        key,
        pack,
        guidance_scale,
        erase_sign,
        timesteps_to,
        *,
        height: int,
        width: int,
    ):
        batch = pack["ref_embeds"].shape[0] // 3
        k_latents, k_sched = jax.random.split(key)

        latents = diff.get_initial_latents(
            k_latents, state_n, batch, height, width
        )

        # ---- inner partial denoise with the CURRENT embedding (stop-grad;
        # the analog of the reference's LoRA-on inner loop)
        target_seq = jax.lax.stop_gradient(encode_with(emb))
        inner_embeds = jnp.concatenate(
            [
                jnp.repeat(pack["uncond_embeds"], batch, axis=0),
                jnp.repeat(target_seq, batch, axis=0),
            ],
            axis=0,
        )
        unet_frozen = lambda s, t, c, a: apply_unet(base, s, t, c)
        denoised = diff.diffusion(
            unet_frozen,
            state_n,
            k_sched,
            latents,
            inner_embeds,
            timesteps_to,
            guidance_scale=inner_guidance_scale,
        )
        denoised = jax.lax.stop_gradient(denoised)

        idx = (timesteps_to * num_train_timesteps) // max_denoising_steps
        t = state_full.timesteps[idx]
        in_scale = state_full.input_scales[idx]

        # ---- 3 reference predictions on fixed embeddings
        ref_in = jnp.tile(denoised, (3, 1, 1, 1)) * in_scale
        ref_preds = apply_unet(base, ref_in, t, pack["ref_embeds"]).astype(
            jnp.float32
        )
        positive, neutral, uncond = jnp.split(ref_preds, 3, axis=0)

        # ---- differentiated target pass: grads flow through the UNet AND
        # the text encoder into the embedding rows
        def loss_fn(e):
            ctx = jnp.repeat(encode_with(e), batch, axis=0)
            pred = apply_unet(base, denoised * in_scale, t, ctx)
            return esd_loss(
                pred, positive, uncond, neutral, guidance_scale, erase_sign
            )

        loss, grads = jax.value_and_grad(loss_fn)(emb)
        updates, opt_state = optimizer.update(grads, opt_state, emb)
        emb = optax.apply_updates(emb, updates)
        return emb, opt_state, loss

    return step


def encode_spliced(
    handle: TextEncoderHandle, token_ids, slots: np.ndarray, emb
) -> jnp.ndarray:
    """Sequence embedding of `token_ids` with the trained rows spliced in —
    the inference-side counterpart of the step's encode (what A1111 does
    when an embedding file is referenced in a prompt). Pass the result as
    `generate_latents(..., positive_embeds=...)` for the -1/0/+1-style A/B."""
    table = handle.params["token_embedding"]["embedding"]
    tok = jnp.take(table, jnp.asarray(token_ids), axis=0)
    tok = tok.at[:, np.asarray(slots)].set(
        jnp.asarray(emb)[None].astype(tok.dtype)
    )
    last, _, _ = handle.model.apply(
        {"params": handle.params}, jnp.asarray(token_ids), input_embeds=tok
    )
    return last


def save_embedding(
    file: str | os.PathLike,
    emb,
    name: str = "",
    save_dtype=np.float32,
    metadata: Optional[dict] = None,
) -> None:
    """A1111/webui textual-inversion safetensors: one `emb_params` tensor
    (n_tokens, hidden). .npz fallback for other extensions (mirroring
    lora.save_lora_weights)."""
    state = {"emb_params": np.ascontiguousarray(np.asarray(emb, save_dtype))}
    file = os.fspath(file)
    if os.path.splitext(file)[1] == ".safetensors":
        from safetensors.numpy import save_file

        meta = {"name": name}
        if metadata:
            meta.update(metadata)
        save_file(state, file, metadata=meta)
    else:
        np.savez(file, **state)


def load_embedding(file: str | os.PathLike) -> jnp.ndarray:
    from safetensors.numpy import load_file

    return jnp.asarray(load_file(os.fspath(file))["emb_params"])


def train_textual_inversion(
    config: RootConfig,
    prompts: list[PromptSettings],
    bundle: ModelBundle,
    handle: TextEncoderHandle,
    on_step: Optional[Callable] = None,
) -> dict:
    """Host loop for embedding-space erasure. Same sampling/save cadence as
    trainer.train; trains ONE concept (the embedding is per-prompt, so a
    single prompt-settings entry is required)."""
    if len(prompts) != 1:
        raise ValueError(
            "textual-inversion erasure trains one concept per run; got "
            f"{len(prompts)} prompt entries"
        )
    if bundle.is_xl:
        raise ValueError("textual inversion targets SD1.x/2.x (see module doc)")

    settings = prompts[0]
    pairs = encode_prompt_pairs(prompts, bundle.encode_fn)
    pair = pairs[0]

    token_ids, slots, emb = init_prompt_embedding(handle, settings.target)

    lr_schedule = get_lr_schedule(
        config.train.lr_scheduler,
        config.train.lr,
        config.train.iterations,
        lr_min=config.train.lr / 100,
    )
    optimizer = get_optimizer(
        config.train.optimizer, lr_schedule, config.train.optimizer_args
    )
    opt_state = optimizer.init(emb)

    step_fn = make_ti_train_step(
        bundle,
        handle,
        token_ids,
        slots,
        optimizer,
        config.train.max_denoising_steps,
    )

    b = settings.batch_size
    pack = {
        "uncond_embeds": pair.unconditional,
        "ref_embeds": jnp.concatenate(
            [
                jnp.repeat(pair.positive, b, axis=0),
                jnp.repeat(pair.neutral, b, axis=0),
                jnp.repeat(pair.unconditional, b, axis=0),
            ],
            axis=0,
        ),
    }

    seed = config.train.seed
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed if seed is not None else rng.integers(2**31))
    save_dtype = np.dtype(parse_precision(config.save.precision))
    save_path = Path(config.save.path)
    save_path.mkdir(parents=True, exist_ok=True)
    metadata = {"config": config.model_dump_json(), "target": settings.target}

    wandb_run = None
    if config.logging.use_wandb:
        try:
            import wandb

            wandb_run = wandb.init(
                project=f"LECO_{config.save.name}", config=metadata
            )
        except ImportError:
            print("wandb not installed; continuing without it")

    losses: list[float] = []
    saved: list[Path] = []
    height = width = settings.resolution
    metrics_file = open(save_path / "metrics.jsonl", "a")
    try:
        from tqdm import tqdm

        pbar = tqdm(range(config.train.iterations))
    except ImportError:  # pragma: no cover
        pbar = range(config.train.iterations)
    import json as _json

    for i in pbar:
        timesteps_to = int(rng.integers(1, config.train.max_denoising_steps))
        key, sub = jax.random.split(key)
        emb, opt_state, loss = step_fn(
            bundle.base_params,
            emb,
            opt_state,
            sub,
            pack,
            jnp.float32(settings.guidance_scale),
            jnp.float32(pair.erase_sign),
            jnp.int32(timesteps_to),
            height=height,
            width=width,
        )
        loss_val = float(loss)
        if not np.isfinite(loss_val):
            raise FloatingPointError(f"non-finite loss at iteration {i}")
        losses.append(loss_val)
        if hasattr(pbar, "set_description"):
            pbar.set_description(f"Loss*1k: {loss_val * 1000:.4f}")
        metrics_file.write(
            _json.dumps(
                {
                    "loss": loss_val,
                    "iteration": i,
                    "lr": float(lr_schedule(i)),
                    "timesteps_to": timesteps_to,
                }
            )
            + "\n"
        )
        if wandb_run is not None:
            wandb_run.log(
                {"loss": loss_val, "iteration": i, "lr": float(lr_schedule(i))}
            )
        if on_step is not None:
            on_step(i, loss_val)
        if (
            i % config.save.per_steps == 0
            and i != 0
            and i != config.train.iterations - 1
        ):
            p = save_path / f"{config.save.name}_{i}steps_ti.safetensors"
            save_embedding(p, emb, config.save.name, save_dtype, metadata)
            saved.append(p)

    p = save_path / f"{config.save.name}_ti.safetensors"
    save_embedding(p, emb, config.save.name, save_dtype, metadata)
    saved.append(p)
    metrics_file.close()
    if wandb_run is not None:
        wandb_run.finish()
    return {"embedding": emb, "slots": slots, "losses": losses, "saved": saved}
