"""Test/bench fixtures: randomly-initialized model bundles.

The reference's only test is a manual GPU inference script
(test/infer_xl.py); this framework instead follows the SURVEY.md section 4
plan: a tiny UNet + fake encoder that runs the whole train loop on CPU in
seconds, and full-size random-weight bundles for throughput benchmarking
(training-speed numbers do not depend on the weight values)."""

from __future__ import annotations

import hashlib
from typing import Optional

import jax
import jax.numpy as jnp

from leco_tpu.lora import LoRASpec, split_lora_params
from leco_tpu.models.unet import (
    UNet2DConditionModel,
    UNetConfig,
    sd15_config,
    tiny_unet_config,
)
from leco_tpu.ops.schedulers import NoiseScheduler
from leco_tpu.train.trainer import ModelBundle


def _fake_encode_fn(cross_attention_dim: int, is_xl: bool = False,
                    pooled_dim: int = 1280):
    """Deterministic pseudo-embedding per prompt string (for tests/bench:
    the ESD objective only needs *distinct, consistent* embeddings)."""

    def encode(prompt: str):
        digest = hashlib.sha256(prompt.encode()).digest()
        seed = int.from_bytes(digest[:4], "little")
        key = jax.random.PRNGKey(seed)
        seq = jax.random.normal(key, (1, 77, cross_attention_dim), jnp.float32)
        if not is_xl:
            return seq
        from leco_tpu.prompts import PromptEmbedsXL

        pooled = jax.random.normal(
            jax.random.fold_in(key, 1), (1, pooled_dim), jnp.float32
        )
        return PromptEmbedsXL(seq, pooled)

    return encode


def make_random_bundle(
    config: Optional[UNetConfig] = None,
    spec: Optional[LoRASpec] = None,
    scheduler_kind: str = "ddim",
    prediction_type: str = "epsilon",
    dtype=jnp.float32,
    param_dtype=jnp.float32,
    attn_backend: str = "xla",
    remat: bool = False,
    seed: int = 0,
    is_xl: Optional[bool] = None,
) -> ModelBundle:
    """Random-weight ModelBundle. Defaults to the tiny CPU test UNet; pass
    `config=sd15_config()` etc. for full-size benchmarking."""
    config = config or tiny_unet_config()
    spec = spec or LoRASpec(rank=4, alpha=1.0)
    if is_xl is None:
        is_xl = config.addition_embed_type == "text_time"

    unet = UNet2DConditionModel(
        config=config,
        lora_spec=spec,
        dtype=dtype,
        param_dtype=param_dtype,
        attn_backend=attn_backend,
        remat=remat,
    )
    sample = jnp.zeros((1, 8, 8, config.in_channels), dtype)
    ctx = jnp.zeros((1, 77, config.cross_attention_dim), dtype)
    added = None
    if is_xl:
        pooled_dim = (
            config.projection_class_embeddings_input_dim
            - 6 * config.addition_time_embed_dim
        )
        added = {
            "text_embeds": jnp.zeros((1, pooled_dim), dtype),
            "time_ids": jnp.zeros((1, 6), dtype),
        }
    # jit the init: unjitted it dispatches thousands of tiny ops one by one
    # (minutes through a remote-TPU tunnel); one compiled program is seconds
    init_fn = jax.jit(
        lambda key: unet.init(key, sample, jnp.zeros((), jnp.float32), ctx, added)
    )
    params = init_fn(jax.random.PRNGKey(seed))["params"]
    base, lora = split_lora_params(params)

    pooled_dim = 1280
    if is_xl:
        pooled_dim = (
            config.projection_class_embeddings_input_dim
            - 6 * config.addition_time_embed_dim
        )
    return ModelBundle(
        unet=unet,
        base_params=base,
        lora_params=lora,
        scheduler=NoiseScheduler(scheduler_kind, prediction_type),
        spec=spec,
        encode_fn=_fake_encode_fn(
            config.cross_attention_dim, is_xl=is_xl, pooled_dim=pooled_dim
        ),
        is_xl=is_xl,
    )


def make_sd15_bundle(dtype=jnp.bfloat16, **kw) -> ModelBundle:
    """Full-size SD1.5 bundle with random weights (throughput benchmarks)."""
    return make_random_bundle(
        config=sd15_config(), dtype=dtype, param_dtype=dtype, **kw
    )
