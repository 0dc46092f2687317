"""Tracked quality metric: synthetic erased-concept signature delta.

BASELINE.md's second target row — "erased-concept CLIP-score delta: parity
with CUDA reference" — had zero measured evidence through round 4 (round-4
verdict, Missing #3): no real CLIP/SD weights exist in this zero-egress
environment, so `scripts/eval_clip_score.py` (the real-weights protocol,
reference README.md:104-107) has never produced a number.

This script is the offline quantitative stand-in, promoted from the
direction-of-effect acceptance test (tests/test_erasure_acceptance.py) to a
TRACKED METRIC with a committed threshold in BASELINE.md:

  1. plant a concept in the tiny test UNet: overfit the base params so the
     concept conditioning emits a fixed unit-norm signature pattern and the
     neutral conditioning emits an orthogonal one;
  2. run the REAL `train()` ESD erase recipe against it (the same code path
     as the CLI, reference train_lora.py:34-343), 150 iterations;
  3. measure erasure strength exactly the way the real metric will, through
     `eval.erased_concept_delta`, with signature correlation standing in
     for CLIP score: delta = mean corr(multiplier 0) - mean corr(+1).

Everything is seeded and runs on CPU, so the number is stable per code
version: a regression in the ESD loss, the LoRA overlay, the trainer's
reference/target scoping, or the eval plumbing moves it. The moment real
SD + CLIP checkpoints exist, scripts/eval_clip_score.py replaces this as
the quality record; the protocol (same-seed A/B at multiplier 0/+1, score
drop on the concept prompt) is identical by construction.

Prints ONE JSON line and appends it to bench_history.jsonl.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the tiny-UNet protocol is a CPU workload; never claim the TPU tunnel.
# The env var alone is NOT enough: the axon TPU plugin ignores
# JAX_PLATFORMS, so the config update below is what actually forces CPU
# (without it this script silently round-trips the tunneled chip and
# deadlocks against any concurrent TPU run).
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

# committed bar (BASELINE.md, round-5 quality row): the erase-trained LoRA
# at multiplier +1 must cut the planted concept's signature correlation by
# at least this much vs multiplier 0
DELTA_BAR = 0.5

CONCEPT = "van gogh"
NEUTRAL = ""


def main():
    import optax

    from leco_tpu.config import RootConfig
    from leco_tpu.eval import erased_concept_delta
    from leco_tpu.lora import merge_params, scale_lora_tree
    from leco_tpu.prompts import PromptSettings
    from leco_tpu.testing import make_random_bundle
    from leco_tpu.train.trainer import train
    from leco_tpu.utils import benchkit

    t0 = time.perf_counter()

    # --- 1. plant the concept (identical constants to the acceptance test)
    bundle = make_random_bundle()
    shape = (1, 8, 8, 4)
    sig = jax.random.normal(jax.random.PRNGKey(1234), shape, jnp.float32)
    sig = sig / jnp.linalg.norm(sig)
    sig_n = jax.random.normal(jax.random.PRNGKey(4321), shape, jnp.float32)
    sig_n = sig_n - jnp.sum(sig_n * sig) * sig
    sig_n = sig_n / jnp.linalg.norm(sig_n)
    ctx_c = bundle.encode_fn(CONCEPT)
    ctx_n = bundle.encode_fn(NEUTRAL)

    unet = bundle.unet
    lora0 = scale_lora_tree(bundle.lora_params, 0.0)
    opt = optax.adam(3e-3)

    def overfit_loss(base, x, t):
        params = merge_params(base, lora0)
        bsz = x.shape[0]
        out_c = unet.apply(
            {"params": params}, x, t, jnp.tile(ctx_c, (bsz, 1, 1)), None
        )
        out_n = unet.apply(
            {"params": params}, x, t, jnp.tile(ctx_n, (bsz, 1, 1)), None
        )
        return jnp.mean((out_c - sig) ** 2) + jnp.mean((out_n - sig_n) ** 2)

    @jax.jit
    def overfit_step(base, opt_state, key):
        kx, kt = jax.random.split(key)
        x = jax.random.normal(kx, (4, 8, 8, 4), jnp.float32)
        t = jax.random.uniform(kt, (4,), minval=0.0, maxval=999.0)
        loss, grads = jax.value_and_grad(overfit_loss)(base, x, t)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(base, updates), opt_state, loss

    base = bundle.base_params
    opt_state = opt.init(base)
    key = jax.random.PRNGKey(7)
    for _ in range(800):
        key, sub = jax.random.split(key)
        base, opt_state, loss = overfit_step(base, opt_state, sub)
    bundle = dataclasses.replace(bundle, base_params=base)
    encode_fn = bundle.encode_fn
    overfit_loss_v = float(loss)

    # --- 2. the real erase recipe through train()
    out_dir = os.environ.get("LECO_QUALITY_OUT", "/tmp/leco_quality_run")
    config = RootConfig.model_validate(
        {
            "prompts_file": "(in-code)",
            "pretrained_model": {"name_or_path": "random://tiny"},
            "network": {"rank": 4, "alpha": 1.0},
            "train": {
                "iterations": 150,
                "max_denoising_steps": 3,
                "lr": 5e-3,
                "seed": 0,
                "precision": "float32",
            },
            "save": {"name": "quality", "path": out_dir, "per_steps": 0},
            "logging": {"use_wandb": False, "verbose": False},
        }
    )
    prompts = [
        PromptSettings(
            target=CONCEPT,
            unconditional=NEUTRAL,
            action="erase",
            guidance_scale=1.0,
            resolution=64,
            batch_size=1,
        )
    ]
    result = train(config, prompts, bundle)
    lora = result["lora"]

    # --- 3. measure through the REAL eval path with a signature scorer
    def _cos(a, b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    class SigScorer:
        def score(self, images, texts):
            return np.asarray([_cos(img, sig) for img in np.asarray(images)])

    def generate_fn(prompt, seed, multiplier):
        ctx = encode_fn(prompt)
        params = merge_params(
            bundle.base_params, scale_lora_tree(lora, multiplier)
        )
        kx = jax.random.PRNGKey(seed)
        x = jax.random.normal(kx, shape, jnp.float32)
        return bundle.unet.apply(
            {"params": params}, x, jnp.float32(500.0), ctx, None
        )

    out = erased_concept_delta(
        SigScorer(),
        decode_fn=lambda latents: latents,
        generate_fn=generate_fn,
        concept=CONCEPT,
        seeds=(0, 1, 2, 3),
    )

    # the notebook-protocol A/B at -1/0/+1 for the record (enhance side)
    def sim_at(mult):
        vals = []
        for i in range(4):
            kx, kt = jax.random.split(jax.random.PRNGKey(100 + i))
            x = jax.random.normal(kx, shape, jnp.float32)
            t = jax.random.uniform(kt, (), minval=0.0, maxval=999.0)
            params = merge_params(
                bundle.base_params, scale_lora_tree(lora, mult)
            )
            vals.append(_cos(unet.apply({"params": params}, x, t, ctx_c, None), sig))
        return float(np.mean(vals))

    sims = {str(m): round(sim_at(m), 4) for m in (-1.0, 0.0, 1.0)}

    record = {
        "metric": (
            "synthetic erased-concept signature delta (planted-concept "
            "protocol, tiny UNet, REAL train() erase recipe)"
        ),
        "value": round(out["delta"], 4),
        "unit": "cosine-correlation drop (multiplier 0 -> +1)",
        "vs_baseline": round(out["delta"] / DELTA_BAR, 2),
        "bar": DELTA_BAR,
        "bar_met": out["delta"] >= DELTA_BAR,
        "base_score": round(out["base"], 4),
        "erased_score": round(out["erased"], 4),
        "sims_at_multiplier": sims,
        "overfit_loss": round(overfit_loss_v, 6),
        "train_losses_first10_mean": round(
            float(np.mean(result["losses"][:10])), 6
        ),
        "train_losses_last10_mean": round(
            float(np.mean(result["losses"][-10:])), 6
        ),
        "wall_s": round(time.perf_counter() - t0, 1),
        "kind": "quality",
    }
    print(json.dumps(record))
    benchkit.append_history(
        record,
        os.path.join(os.path.dirname(__file__), "..", "bench_history.jsonl"),
    )


if __name__ == "__main__":
    main()
