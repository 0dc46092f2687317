"""SDXL synthetic-concept erasure acceptance — direction-of-effect evidence.

The XL analog of tests/test_erasure_acceptance.py: the reference ships a
separate SDXL entry point (train_lora_xl.py) whose acceptance evidence is
the same before/after grid protocol (reference README.md:85-227). This test
proves the XL recipe — dual-embedding conditioning, pooled text_embeds, and
the time-ids micro-conditioning — actually erases:

  1. overfit the tiny XL UNet so its output under the FULL XL conditioning
     (sequence embeds + pooled + time_ids) carries a measurable concept;
  2. run the REAL `train()` XL erase recipe (same code path as
     train_lora_xl.py);
  3. assert the multiplier -1/0/+1 A/B moves the concept signature the
     right way under the same conditioning the trainer used.

Without this, direction-of-effect evidence existed only for the SD1.5
path; a regression in the XL-only plumbing (added-cond batching, pooled
routing) could silently break erasure while every loss stayed finite.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow  # acceptance-scale wall time (see pyproject markers)

from leco_tpu.config import (
    LoggingConfig,
    NetworkConfig,
    OtherConfig,
    PretrainedModelConfig,
    RootConfig,
    SaveConfig,
    TrainConfig,
)
from leco_tpu.lora import merge_params, scale_lora_tree
from leco_tpu.prompts import PromptSettings
from leco_tpu.testing import make_random_bundle
from leco_tpu.train import diffusion as diff
from leco_tpu.train.trainer import train
from tests.test_erasure_acceptance import _cos, _signatures
from tests.test_trainer_xl import tiny_xl_config_obj

CONCEPT = "van gogh"
NEUTRAL = ""


def _added(emb, height=64, width=64):
    """The added-cond dict exactly as build_pack presents it to the UNet
    (trainer.py build_pack): pooled text_embeds + static time_ids."""
    time_ids = jnp.asarray(diff.get_add_time_ids(height, width))
    return {
        "text_embeds": emb.pooled_embeds,
        "time_ids": time_ids,
    }


def _overfit_concept(bundle, emb_c, emb_n, sig_c, sig_n, steps=800, lr=3e-3):
    """Train the BASE params so the full XL conditioning of the concept
    prompt maps to sig_c and the neutral conditioning to sig_n."""
    unet = bundle.unet
    lora0 = scale_lora_tree(bundle.lora_params, 0.0)
    ctx_c, added_c = emb_c.text_embeds, _added(emb_c)
    ctx_n, added_n = emb_n.text_embeds, _added(emb_n)

    opt = optax.adam(lr)

    def tile_added(a, bsz):
        return {k: jnp.tile(v, (bsz, 1)) for k, v in a.items()}

    def loss_fn(base, x, t):
        params = merge_params(base, lora0)
        bsz = x.shape[0]
        out_c = unet.apply(
            {"params": params}, x, t,
            jnp.tile(ctx_c, (bsz, 1, 1)), tile_added(added_c, bsz),
        )
        out_n = unet.apply(
            {"params": params}, x, t,
            jnp.tile(ctx_n, (bsz, 1, 1)), tile_added(added_n, bsz),
        )
        return jnp.mean((out_c - sig_c) ** 2) + jnp.mean((out_n - sig_n) ** 2)

    @jax.jit
    def step(base, opt_state, key):
        kx, kt = jax.random.split(key)
        x = jax.random.normal(kx, (4, 8, 8, 4), jnp.float32)
        t = jax.random.uniform(kt, (4,), minval=0.0, maxval=999.0)
        loss, grads = jax.value_and_grad(loss_fn)(base, x, t)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(base, updates), opt_state, loss

    base = bundle.base_params
    opt_state = opt.init(base)
    key = jax.random.PRNGKey(7)
    for _ in range(steps):
        key, sub = jax.random.split(key)
        base, opt_state, loss = step(base, opt_state, sub)
    return base, float(loss)


def _concept_similarity(bundle, lora, multiplier, emb, sig, n=4):
    params = merge_params(bundle.base_params, scale_lora_tree(lora, multiplier))
    ctx, added = emb.text_embeds, _added(emb)
    sims = []
    for i in range(n):
        kx, kt = jax.random.split(jax.random.PRNGKey(100 + i))
        x = jax.random.normal(kx, (1, 8, 8, 4), jnp.float32)
        t = jax.random.uniform(kt, (), minval=0.0, maxval=999.0)
        out = bundle.unet.apply({"params": params}, x, t, ctx, added)
        sims.append(_cos(out, sig))
    return float(np.mean(sims))


@pytest.fixture(scope="module")
def erasure_run_xl(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("erase_xl")
    bundle = make_random_bundle(config=tiny_xl_config_obj())
    assert bundle.is_xl
    sig, sig_n = _signatures()
    emb_c = bundle.encode_fn(CONCEPT)
    emb_n = bundle.encode_fn(NEUTRAL)

    base, overfit_loss = _overfit_concept(bundle, emb_c, emb_n, sig, sig_n)
    bundle = dataclasses.replace(bundle, base_params=base)

    config = RootConfig(
        prompts_file="unused.yaml",
        pretrained_model=PretrainedModelConfig(name_or_path="random://tiny-xl"),
        network=NetworkConfig(rank=4, alpha=1.0),
        train=TrainConfig(
            iterations=150,
            max_denoising_steps=3,
            lr=5e-3,
            seed=0,
            precision="float32",
        ),
        save=SaveConfig(name="erase_xl", path=str(tmp_path), per_steps=1000),
        logging=LoggingConfig(),
        other=OtherConfig(),
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
    return dict(
        bundle=bundle,
        sig=sig,
        emb_c=emb_c,
        emb_n=emb_n,
        lora=result["lora"],
        losses=result["losses"],
        overfit_loss=overfit_loss,
    )


class TestConceptErasureXL:
    def test_overfit_planted_the_concept(self, erasure_run_xl):
        r = erasure_run_xl
        sim_c = _concept_similarity(r["bundle"], r["lora"], 0.0, r["emb_c"], r["sig"])
        sim_n = _concept_similarity(r["bundle"], r["lora"], 0.0, r["emb_n"], r["sig"])
        assert sim_c > 0.8, f"concept not planted (sim={sim_c:.3f})"
        assert abs(sim_n) < 0.4, f"neutral leaks signature (sim={sim_n:.3f})"

    def test_erase_direction_of_effect(self, erasure_run_xl):
        """Notebook A/B protocol on the XL recipe: +1 suppresses the
        concept signature, -1 sits on the enhance side."""
        r = erasure_run_xl
        sims = {
            m: _concept_similarity(r["bundle"], r["lora"], m, r["emb_c"], r["sig"])
            for m in (-1.0, 0.0, 1.0)
        }
        assert sims[1.0] < sims[0.0] - 0.3, f"erase did not erase: {sims}"
        assert sims[-1.0] > sims[1.0] + 0.3, f"-1 not on enhance side: {sims}"

    def test_neutral_output_preserved(self, erasure_run_xl):
        """Erasure must be concept-selective under the XL conditioning."""
        r = erasure_run_xl
        bundle, lora = r["bundle"], r["lora"]
        p0 = merge_params(bundle.base_params, scale_lora_tree(lora, 0.0))
        p1 = merge_params(bundle.base_params, scale_lora_tree(lora, 1.0))
        x = jax.random.normal(jax.random.PRNGKey(55), (1, 8, 8, 4), jnp.float32)
        t = jnp.float32(500.0)
        ctx_n, added_n = r["emb_n"].text_embeds, _added(r["emb_n"])
        ctx_c, added_c = r["emb_c"].text_embeds, _added(r["emb_c"])
        out0 = bundle.unet.apply({"params": p0}, x, t, ctx_n, added_n)
        out1 = bundle.unet.apply({"params": p1}, x, t, ctx_n, added_n)
        c0 = bundle.unet.apply({"params": p0}, x, t, ctx_c, added_c)
        c1 = bundle.unet.apply({"params": p1}, x, t, ctx_c, added_c)
        drift_n = float(jnp.linalg.norm(out1 - out0))
        drift_c = float(jnp.linalg.norm(c1 - c0))
        assert drift_c > 0, "LoRA is a no-op"
        assert drift_n < drift_c, (
            f"neutral drifted as much as the concept ({drift_n:.4f} vs "
            f"{drift_c:.4f}) — erasure is not concept-selective"
        )
