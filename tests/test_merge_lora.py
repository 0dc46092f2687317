"""Weight-merge tool: merging the exported LoRA into the torch state dict
must equal the activation-space LoRA apply (linear layers are exact)."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leco_tpu.lora import (
    LoRASpec,
    export_lora_state,
    merge_params,
    split_lora_params,
)
from leco_tpu.models.convert import torch_unet_to_flax
from leco_tpu.models.unet import UNet2DConditionModel, tiny_unet_config
from tests.test_convert import flax_unet_to_torch_dict


def _load_merge_module():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts", "merge_lora.py")
    spec = importlib.util.spec_from_file_location("merge_lora", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestMerge:
    def test_merged_weights_match_lora_apply(self):
        merge_mod = _load_merge_module()
        spec = LoRASpec(rank=4, alpha=1.0, network_type="c3lier")
        cfg = tiny_unet_config()
        model = UNet2DConditionModel(config=cfg, lora_spec=spec)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 32))
        params = model.init(jax.random.PRNGKey(2), x, 0, ctx)["params"]
        base, lora = split_lora_params(params)
        lora = jax.tree.map(
            lambda v: jax.random.normal(jax.random.PRNGKey(3), v.shape) * 0.02,
            lora,
        )

        out_lora = np.asarray(
            model.apply({"params": merge_params(base, lora)}, x, 10, ctx)
        )

        torch_sd = flax_unet_to_torch_dict(base)
        lora_state = export_lora_state(lora, spec)
        merged_sd = merge_mod.merge_lora_into_torch_sd(torch_sd, lora_state)
        merged_flax = torch_unet_to_flax(merged_sd)
        base_model = UNet2DConditionModel(config=cfg)  # no lora spec
        out_merged = np.asarray(
            base_model.apply({"params": merged_flax}, x, 10, ctx)
        )
        # linear/1x1 merges are exact; 3x3 conv merges are exact too
        # (composition of conv + 1x1 = conv with contracted kernel)
        np.testing.assert_allclose(out_lora, out_merged, atol=2e-4)

    def test_multiplier_zero_is_identity(self):
        merge_mod = _load_merge_module()
        spec = LoRASpec(rank=2, alpha=1.0)
        cfg = tiny_unet_config()
        model = UNet2DConditionModel(config=cfg, lora_spec=spec)
        x = jnp.zeros((1, 16, 16, 4))
        ctx = jnp.zeros((1, 77, 32))
        params = model.init(jax.random.PRNGKey(0), x, 0, ctx)["params"]
        base, lora = split_lora_params(params)
        lora = jax.tree.map(lambda v: jnp.ones_like(v), lora)
        torch_sd = flax_unet_to_torch_dict(base)
        merged = merge_mod.merge_lora_into_torch_sd(
            torch_sd, export_lora_state(lora, spec), multiplier=0.0
        )
        for k in torch_sd:
            np.testing.assert_allclose(
                np.asarray(torch_sd[k]), np.asarray(merged[k])
            )
