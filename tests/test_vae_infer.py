"""VAE decoder + inference harness tests (tiny shapes, CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from leco_tpu.models.vae import VAEDecoder, VAEDecoderConfig


def tiny_vae_config():
    return VAEDecoderConfig(
        block_out_channels=(8, 8, 16, 16), layers_per_block=1, norm_num_groups=4
    )


class TestVAEDecoder:
    def test_upscales_8x(self):
        cfg = tiny_vae_config()
        vae = VAEDecoder(config=cfg)
        z = jnp.zeros((1, 4, 4, 4))
        params = vae.init(jax.random.PRNGKey(0), z)["params"]
        img = vae.apply({"params": params}, z)
        assert img.shape == (1, 32, 32, 3)

    def test_param_paths(self):
        cfg = tiny_vae_config()
        vae = VAEDecoder(config=cfg)
        z = jnp.zeros((1, 4, 4, 4))
        params = vae.init(jax.random.PRNGKey(0), z)["params"]
        names = {"_".join(k[:-1]) for k in flatten_dict(params)}
        for expected in (
            "post_quant_conv",
            "conv_in",
            "mid_block_resnets_0_conv1",
            "mid_block_attentions_0_to_q",
            "mid_block_attentions_0_to_out_0",
            "up_blocks_0_resnets_0_conv1",
            "up_blocks_0_upsamplers_0_conv",
            "conv_norm_out",
            "conv_out",
        ):
            assert any(n.startswith(expected) for n in names), expected

    def test_sd_vae_param_count(self):
        """diffusers SD1.5 AutoencoderKL decoder+post_quant_conv: 49.49M."""
        vae = VAEDecoder(config=VAEDecoderConfig())
        z = jax.ShapeDtypeStruct((1, 8, 8, 4), jnp.float32)
        variables = jax.eval_shape(
            lambda zz: vae.init(jax.random.PRNGKey(0), zz), z
        )
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"]))
        assert n == 49_490_199, f"got {n:,}"

    def test_conversion_roundtrip(self):
        from leco_tpu.models.convert import torch_vae_decoder_to_flax

        cfg = tiny_vae_config()
        vae = VAEDecoder(config=cfg)
        z = jnp.zeros((1, 4, 4, 4))
        params = vae.init(jax.random.PRNGKey(0), z)["params"]

        # build a torch-style dict from the flax tree (inverse mapping)
        torch_sd = {}
        for path, v in flatten_dict(params).items():
            v = np.asarray(v)
            head = path[0]
            if head == "post_quant_conv":
                name = "post_quant_conv"
                rest = path[1:]
            else:
                name = "decoder." + head.replace("_resnets_", ".resnets.").replace(
                    "_attentions_", ".attentions."
                ).replace("_upsamplers_", ".upsamplers.").replace(
                    "up_blocks_", "up_blocks."
                )
                rest = path[1:]
            for comp in rest[:-1]:
                name += "." + (comp.replace("to_out_0", "to_out.0"))
            leaf = rest[-1] if rest else path[-1]
            if leaf == "kernel":
                w = v.transpose(3, 2, 0, 1) if v.ndim == 4 else v.T
                torch_sd[f"{name}.weight"] = w
            elif leaf == "scale":
                torch_sd[f"{name}.weight"] = v
            else:
                torch_sd[f"{name}.bias"] = v

        back = torch_vae_decoder_to_flax(torch_sd)
        f1, f2 = flatten_dict(params), flatten_dict(back)
        assert set(f1) == set(f2), (
            f"missing: {sorted(set(f1) - set(f2))[:4]} "
            f"extra: {sorted(set(f2) - set(f1))[:4]}"
        )
        for k in f1:
            np.testing.assert_allclose(np.asarray(f1[k]), np.asarray(f2[k]))


class TestDecodePostprocess:
    def test_decode_latents_range(self):
        from leco_tpu.infer import decode_latents

        cfg = tiny_vae_config()
        vae = VAEDecoder(config=cfg)
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 4))
        params = vae.init(jax.random.PRNGKey(0), z)["params"]
        imgs = decode_latents(None, z, vae=vae, vae_params=params)
        assert imgs.dtype == np.uint8
        assert imgs.shape == (1, 32, 32, 3)
