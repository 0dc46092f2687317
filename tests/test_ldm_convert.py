"""LDM single-file -> diffusers key mapping, cross-checked against an
independently-written reverse mapping over the real SD1.5 topology (key sets
derived from the Flax UNet via eval_shape — no weights needed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from leco_tpu.models import convert
from leco_tpu.models.unet import UNet2DConditionModel, sd15_config
from tests.test_convert import flax_unet_to_torch_dict


@pytest.fixture(scope="module")
def sd15_diffusers_keys():
    cfg = sd15_config()
    model = UNet2DConditionModel(config=cfg)
    sample = jax.ShapeDtypeStruct((1, 8, 8, 4), jnp.float32)
    ctx = jax.ShapeDtypeStruct((1, 77, 768), jnp.float32)
    variables = jax.eval_shape(
        lambda s, c: model.init(jax.random.PRNGKey(0), s, 0, c), sample, ctx
    )
    params = jax.tree.map(
        lambda x: np.zeros(x.shape, np.float32), variables["params"]
    )
    return flax_unet_to_torch_dict(params)


def _reverse_resnet(d_prefix, l_prefix):
    """diffusers resnet keys -> LDM keys (independent of the converter)."""
    return {
        f"{d_prefix}.norm1.weight": f"{l_prefix}.in_layers.0.weight",
        f"{d_prefix}.norm1.bias": f"{l_prefix}.in_layers.0.bias",
        f"{d_prefix}.conv1.weight": f"{l_prefix}.in_layers.2.weight",
        f"{d_prefix}.conv1.bias": f"{l_prefix}.in_layers.2.bias",
        f"{d_prefix}.time_emb_proj.weight": f"{l_prefix}.emb_layers.1.weight",
        f"{d_prefix}.time_emb_proj.bias": f"{l_prefix}.emb_layers.1.bias",
        f"{d_prefix}.norm2.weight": f"{l_prefix}.out_layers.0.weight",
        f"{d_prefix}.norm2.bias": f"{l_prefix}.out_layers.0.bias",
        f"{d_prefix}.conv2.weight": f"{l_prefix}.out_layers.3.weight",
        f"{d_prefix}.conv2.bias": f"{l_prefix}.out_layers.3.bias",
        f"{d_prefix}.conv_shortcut.weight": f"{l_prefix}.skip_connection.weight",
        f"{d_prefix}.conv_shortcut.bias": f"{l_prefix}.skip_connection.bias",
    }


def build_ldm_from_diffusers(diffusers_sd):
    """Reverse mapping for SD1.x topology (input_blocks 1-11, middle 0-2,
    output_blocks 0-11), written independently of the converter under test."""
    reverse = {
        "time_embedding.linear_1.weight": "time_embed.0.weight",
        "time_embedding.linear_1.bias": "time_embed.0.bias",
        "time_embedding.linear_2.weight": "time_embed.2.weight",
        "time_embedding.linear_2.bias": "time_embed.2.bias",
        "conv_in.weight": "input_blocks.0.0.weight",
        "conv_in.bias": "input_blocks.0.0.bias",
        "conv_norm_out.weight": "out.0.weight",
        "conv_norm_out.bias": "out.0.bias",
        "conv_out.weight": "out.2.weight",
        "conv_out.bias": "out.2.bias",
    }
    # down: input_blocks 1,2 | 4,5 | 7,8 | 10,11 with downsamplers at 3,6,9
    idx = 1
    for level in range(4):
        for layer in range(2):
            reverse.update(
                _reverse_resnet(
                    f"down_blocks.{level}.resnets.{layer}",
                    f"input_blocks.{idx}.0",
                )
            )
            if level < 3:  # attention levels
                d = f"down_blocks.{level}.attentions.{layer}."
                l = f"input_blocks.{idx}.1."
                for k in diffusers_sd:
                    if k.startswith(d):
                        reverse[k] = l + k[len(d):]
            idx += 1
        if level < 3:
            reverse[f"down_blocks.{level}.downsamplers.0.conv.weight"] = (
                f"input_blocks.{idx}.0.op.weight"
            )
            reverse[f"down_blocks.{level}.downsamplers.0.conv.bias"] = (
                f"input_blocks.{idx}.0.op.bias"
            )
            idx += 1
    # mid
    reverse.update(_reverse_resnet("mid_block.resnets.0", "middle_block.0"))
    reverse.update(_reverse_resnet("mid_block.resnets.1", "middle_block.2"))
    for k in diffusers_sd:
        if k.startswith("mid_block.attentions.0."):
            reverse[k] = "middle_block.1." + k[len("mid_block.attentions.0."):]
    # up: output_blocks 0..11, 3 layers per level; upsampler rides the last
    # entry of levels 0..2 (at submodule .1 for level 0 [no attention there in
    # diffusers UP order? level 0 of up_blocks for SD1.5 is UpBlock2D], .2 else)
    idx = 0
    up_has_attn = [False, True, True, True]  # up_blocks order in diffusers
    for level in range(4):
        for layer in range(3):
            reverse.update(
                _reverse_resnet(
                    f"up_blocks.{level}.resnets.{layer}",
                    f"output_blocks.{idx}.0",
                )
            )
            if up_has_attn[level]:
                d = f"up_blocks.{level}.attentions.{layer}."
                l = f"output_blocks.{idx}.1."
                for k in diffusers_sd:
                    if k.startswith(d):
                        reverse[k] = l + k[len(d):]
            if layer == 2 and level < 3:
                sub = 2 if up_has_attn[level] else 1
                reverse[f"up_blocks.{level}.upsamplers.0.conv.weight"] = (
                    f"output_blocks.{idx}.{sub}.conv.weight"
                )
                reverse[f"up_blocks.{level}.upsamplers.0.conv.bias"] = (
                    f"output_blocks.{idx}.{sub}.conv.bias"
                )
            idx += 1

    ldm = {}
    for d_key, tensor in diffusers_sd.items():
        l_key = reverse.get(d_key)
        assert l_key is not None, f"no reverse mapping for {d_key}"
        ldm["model.diffusion_model." + l_key] = tensor
    return ldm


class TestLDMUNet:
    def test_full_sd15_roundtrip(self, sd15_diffusers_keys):
        ldm = build_ldm_from_diffusers(sd15_diffusers_keys)
        assert len(ldm) == len(sd15_diffusers_keys)
        back = convert.ldm_unet_to_diffusers(ldm)
        missing = set(sd15_diffusers_keys) - set(back)
        extra = set(back) - set(sd15_diffusers_keys)
        assert not missing, f"converter missed {len(missing)}: {sorted(missing)[:5]}"
        assert not extra, f"converter invented {len(extra)}: {sorted(extra)[:5]}"

    def test_tensor_count(self, sd15_diffusers_keys):
        # SD1.5 UNet: 686 tensors
        assert len(sd15_diffusers_keys) == 686

    def test_no_diffusion_model_keys_raises(self):
        with pytest.raises(ValueError):
            convert.ldm_unet_to_diffusers({"foo.bar": np.zeros(1)})
