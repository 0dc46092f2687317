"""Textual-inversion erasure acceptance — direction-of-effect evidence.

The TI analog of tests/test_erasure_acceptance.py: plant a synthetic
concept in a tiny UNet (output of the encoded concept prompt correlates
with a fixed signature), run the REAL train_textual_inversion() erase
recipe, and assert the LEARNED EMBEDDING's conditioning suppresses the
signature while the untouched model still carries the concept for the
plain prompt (TI never modifies model weights — the embedding is the
artifact that erases when used)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow  # acceptance-scale wall time (see pyproject markers)

from leco_tpu.config import (
    NetworkConfig,
    PretrainedModelConfig,
    RootConfig,
    SaveConfig,
    TrainConfig,
)
from leco_tpu.lora import LoRASpec, merge_params, scale_lora_tree
from leco_tpu.prompts import PromptSettings
from leco_tpu.train.textual_inversion import (
    TextEncoderHandle,
    encode_spliced,
    init_prompt_embedding,
    train_textual_inversion,
)
from tests.test_erasure_acceptance import _cos, _signatures
from tests.test_loader_integration import fake_checkpoint  # noqa: F401

CONCEPT = "van gogh"
NEUTRAL = ""


@pytest.fixture(scope="module")
def ti_run(fake_checkpoint, tmp_path_factory):  # noqa: F811
    from leco_tpu.models.loader import load_models
    from leco_tpu.train.trainer import ModelBundle

    tmp_path = tmp_path_factory.mktemp("ti_erase")
    root, _ = fake_checkpoint
    models = load_models(str(root), "ddim", lora_spec=LoRASpec(rank=2),
                         remat=False)
    te = models.text_encoder

    def encode_fn(prompt: str):
        tokens = jnp.asarray(models.tokenizer([prompt]))
        last, _, _ = te.model.apply({"params": te.params}, tokens)
        return last

    handle = TextEncoderHandle(
        model=te.model, params=te.params, tokenizer=models.tokenizer
    )
    unet = models.unet
    lora0 = scale_lora_tree(models.unet_lora_params, 0.0)
    sig, sig_n = _signatures()
    ctx_c = encode_fn(CONCEPT)
    ctx_n = encode_fn(NEUTRAL)

    # ---- plant the concept (same recipe as test_erasure_acceptance)
    opt = optax.adam(3e-3)

    def loss_fn(base, x, t):
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
    def ostep(base, opt_state, key):
        kx, kt = jax.random.split(key)
        x = jax.random.normal(kx, (4, 8, 8, 4), jnp.float32)
        t = jax.random.uniform(kt, (4,), minval=0.0, maxval=999.0)
        loss, grads = jax.value_and_grad(loss_fn)(base, x, t)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(base, updates), opt_state, loss

    base = models.unet_base_params
    opt_state = opt.init(base)
    key = jax.random.PRNGKey(7)
    for _ in range(800):
        key, sub = jax.random.split(key)
        base, opt_state, _ = ostep(base, opt_state, sub)

    bundle = ModelBundle(
        unet=unet,
        base_params=base,
        lora_params=models.unet_lora_params,
        scheduler=models.scheduler,
        spec=LoRASpec(rank=2),
        encode_fn=encode_fn,
        is_xl=False,
    )

    config = RootConfig(
        prompts_file="unused.yaml",
        pretrained_model=PretrainedModelConfig(name_or_path="random://tiny"),
        network=NetworkConfig(rank=2),
        train=TrainConfig(
            iterations=150,
            max_denoising_steps=3,
            lr=2e-2,  # embeddings need a higher lr than LoRA
            seed=0,
            precision="float32",
        ),
        save=SaveConfig(name="ti_erase", path=str(tmp_path), per_steps=1000),
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
    result = train_textual_inversion(config, prompts, bundle, handle)
    token_ids, slots, emb0 = init_prompt_embedding(handle, CONCEPT)
    return dict(
        bundle=bundle,
        handle=handle,
        sig=sig,
        ctx_c=ctx_c,
        token_ids=token_ids,
        slots=slots,
        emb0=emb0,
        emb=result["embedding"],
        losses=result["losses"],
    )


def _similarity(bundle, ctx, sig, n=4):
    params = merge_params(bundle.base_params, scale_lora_tree(
        bundle.lora_params, 0.0))
    sims = []
    for i in range(n):
        kx, kt = jax.random.split(jax.random.PRNGKey(100 + i))
        x = jax.random.normal(kx, (1, 8, 8, 4), jnp.float32)
        t = jax.random.uniform(kt, (), minval=0.0, maxval=999.0)
        out = bundle.unet.apply({"params": params}, x, t, ctx, None)
        sims.append(_cos(out, sig))
    return float(np.mean(sims))


class TestTIErasure:
    def test_concept_planted(self, ti_run):
        r = ti_run
        sim_c = _similarity(r["bundle"], r["ctx_c"], r["sig"])
        assert sim_c > 0.8, f"concept not planted (sim={sim_c:.3f})"
        # the identity splice reproduces the planted conditioning
        ctx0 = encode_spliced(r["handle"], r["token_ids"], r["slots"], r["emb0"])
        assert _similarity(r["bundle"], ctx0, r["sig"]) > 0.8

    def test_trained_embedding_erases(self, ti_run):
        """The learned embedding's conditioning must suppress the concept
        signature; the plain prompt (model untouched) must still carry it."""
        r = ti_run
        ctx_ti = encode_spliced(r["handle"], r["token_ids"], r["slots"], r["emb"])
        sim_ti = _similarity(r["bundle"], ctx_ti, r["sig"])
        sim_plain = _similarity(r["bundle"], r["ctx_c"], r["sig"])
        assert sim_ti < sim_plain - 0.3, (
            f"TI did not erase: spliced sim {sim_ti:.3f} vs plain "
            f"{sim_plain:.3f}"
        )
        # TI never touches model weights: the plain prompt still works
        assert sim_plain > 0.8
