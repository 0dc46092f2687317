"""Checkpoint loading: diffusers directories and LDM single files -> Flax.

Replaces model_util.load_models / load_models_xl (model_util.py:104-129,
200-227 in p1atdev/LECO). Fully offline: every tensor and the tokenizer
vocab come from the local checkpoint path (the reference instead downloaded
tokenizers from fixed hub repos — see docs/QUIRKS.md #17).

Supported layouts:
  * diffusers directory: unet/config.json + unet/diffusion_pytorch_model.
    {safetensors,bin}, text_encoder[_2]/, tokenizer[_2]/vocab.json+merges.txt
    (sharded *.safetensors.index.json also handled)
  * LDM single file (.ckpt via torch pickle, .safetensors):
    model.diffusion_model.* / cond_stage_model.* remapped through
    leco_tpu.models.convert
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from leco_tpu.lora import LoRASpec, split_lora_params
from leco_tpu.models import convert
from leco_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextModel,
    sd1_text_config,
    sd2_text_config,
)
from leco_tpu.models.tokenizer import CLIPTokenizer
from leco_tpu.models.unet import UNet2DConditionModel, UNetConfig
from leco_tpu.ops.schedulers import NoiseScheduler, create_noise_scheduler


# ---------------------------------------------------------------------------
# tensor file reading
# ---------------------------------------------------------------------------


def _load_tensor_file(path: str) -> dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        try:
            return load_file(path)
        except Exception:
            # bf16 tensors can't always map to numpy directly in older
            # safetensors; fall back through torch
            import torch
            from safetensors.torch import load_file as load_torch

            return {
                k: v.float().numpy() for k, v in load_torch(path).items()
            }
    # torch pickle (.bin / .ckpt)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {
        k: v.float().numpy()
        for k, v in sd.items()
        if hasattr(v, "numpy")
    }


def _load_component_tensors(component_dir: str) -> dict[str, np.ndarray]:
    """Load a diffusers component dir, handling sharded checkpoints."""
    for fname in (
        "diffusion_pytorch_model.safetensors",
        "model.safetensors",
        "diffusion_pytorch_model.bin",
        "pytorch_model.bin",
        "model.fp16.safetensors",
    ):
        p = os.path.join(component_dir, fname)
        if os.path.exists(p):
            return _load_tensor_file(p)
    # sharded?
    for fname in os.listdir(component_dir):
        if fname.endswith(".index.json"):
            with open(os.path.join(component_dir, fname)) as f:
                index = json.load(f)
            out: dict[str, np.ndarray] = {}
            for shard in sorted(set(index["weight_map"].values())):
                out.update(_load_tensor_file(os.path.join(component_dir, shard)))
            return out
    raise FileNotFoundError(f"no model weights found in {component_dir}")


# ---------------------------------------------------------------------------
# config parsing
# ---------------------------------------------------------------------------


def unet_config_from_json(config: dict) -> UNetConfig:
    def tup(v):
        return tuple(v) if isinstance(v, (list, tuple)) else v

    return UNetConfig(
        sample_size=config.get("sample_size", 64),
        in_channels=config.get("in_channels", 4),
        out_channels=config.get("out_channels", 4),
        down_block_types=tuple(config["down_block_types"]),
        up_block_types=tuple(config["up_block_types"]),
        block_out_channels=tuple(config["block_out_channels"]),
        layers_per_block=config.get("layers_per_block", 2),
        transformer_layers_per_block=tup(
            config.get("transformer_layers_per_block", 1)
        ),
        cross_attention_dim=config.get("cross_attention_dim", 768),
        # UNetConfig.attention_head_dim is the HEAD COUNT (diffusers-legacy
        # semantics, correct for every SD-family config.json). If a config
        # sets the modern explicit num_attention_heads, prefer it.
        attention_head_dim=tup(
            config.get("num_attention_heads")
            or config.get("attention_head_dim", 8)
        ),
        use_linear_projection=config.get("use_linear_projection", False),
        upcast_attention=config.get("upcast_attention", False) or False,
        addition_embed_type=config.get("addition_embed_type"),
        addition_time_embed_dim=config.get("addition_time_embed_dim", 256) or 256,
        projection_class_embeddings_input_dim=config.get(
            "projection_class_embeddings_input_dim", 2816
        )
        or 2816,
        norm_num_groups=config.get("norm_num_groups", 32),
    )


def clip_config_from_json(config: dict, clip_skip: Optional[int] = None) -> CLIPTextConfig:
    num_layers = config.get("num_hidden_layers", 12)
    # reference clip-skip arithmetic (model_util.py:48,62): clip_skip=k drops
    # the last k-1 layers. When clip_skip is None the config's own layer count
    # stands as-is — note SD2-family configs often ship already truncated to
    # 23 layers (clip-skip-2 baked in); applying clip_skip on top of such a
    # config stacks, so validate the result is sane.
    if clip_skip is not None:
        num_layers = num_layers - (clip_skip - 1)
        if num_layers < 1:
            raise ValueError(
                f"clip_skip={clip_skip} would leave {num_layers} encoder "
                f"layers (config has {config.get('num_hidden_layers', 12)}); "
                "the checkpoint's text-encoder config may already be "
                "truncated — use a smaller clip_skip or none."
            )
    return CLIPTextConfig(
        vocab_size=config.get("vocab_size", 49408),
        hidden_size=config.get("hidden_size", 768),
        intermediate_size=config.get("intermediate_size", 3072),
        num_hidden_layers=num_layers,
        num_attention_heads=config.get("num_attention_heads", 12),
        max_position_embeddings=config.get("max_position_embeddings", 77),
        hidden_act=config.get("hidden_act", "quick_gelu"),
        projection_dim=(
            config.get("projection_dim")
            if config.get("architectures", [""])[0]
            == "CLIPTextModelWithProjection"
            else None
        ),
        eos_token_id=config.get("eos_token_id", 49407),
    )


# ---------------------------------------------------------------------------
# public loaders
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LoadedTextEncoder:
    model: CLIPTextModel
    params: dict
    config: CLIPTextConfig


@dataclasses.dataclass
class LoadedModels:
    """What load_models returns (cf. model_util.load_models's
    (tokenizer, text_encoder, unet, scheduler) tuple)."""

    tokenizer: CLIPTokenizer
    text_encoder: LoadedTextEncoder
    unet: UNet2DConditionModel
    unet_base_params: dict
    unet_lora_params: dict
    scheduler: NoiseScheduler
    unet_config: UNetConfig
    # SDXL extras
    tokenizer_2: Optional[CLIPTokenizer] = None
    text_encoder_2: Optional[LoadedTextEncoder] = None

    @property
    def is_xl(self) -> bool:
        return self.text_encoder_2 is not None


def _build_unet(
    unet_config: UNetConfig,
    torch_sd: dict[str, np.ndarray],
    spec: Optional[LoRASpec],
    weight_dtype,
    attn_backend: str,
    remat: bool,
    seed: int = 0,
):
    """Convert weights, then init only the lora leaves via the module."""
    unet = UNet2DConditionModel(
        config=unet_config,
        lora_spec=spec,
        dtype=weight_dtype,
        param_dtype=weight_dtype,
        attn_backend=attn_backend,
        remat=remat,
    )
    base = convert.torch_unet_to_flax(torch_sd)
    base = jax.tree.map(lambda x: jnp.asarray(x, weight_dtype), base)

    lora = {}
    if spec is not None:
        sample = jnp.zeros((1, 8, 8, unet_config.in_channels), weight_dtype)
        ctx = jnp.zeros((1, 77, unet_config.cross_attention_dim), weight_dtype)
        added = None
        if unet_config.addition_embed_type == "text_time":
            pooled = (
                unet_config.projection_class_embeddings_input_dim
                - 6 * unet_config.addition_time_embed_dim
            )
            added = {
                "text_embeds": jnp.zeros((1, pooled), weight_dtype),
                "time_ids": jnp.zeros((1, 6), weight_dtype),
            }
        variables = jax.eval_shape(
            lambda s, c, a: unet.init(jax.random.PRNGKey(0), s, 0, c, a),
            sample,
            ctx,
            added,
        )
        _, lora_shapes = split_lora_params(variables["params"])
        # materialize lora leaves with the real init distributions, fp32
        from flax.traverse_util import flatten_dict, unflatten_dict

        from leco_tpu.lora import _kaiming_down_init

        key = jax.random.PRNGKey(seed)
        flat = {}
        for k, v in sorted(flatten_dict(lora_shapes).items()):
            if k[-1] == "lora_down":
                key, sub = jax.random.split(key)
                flat[k] = _kaiming_down_init(sub, v.shape, jnp.float32)
            else:
                flat[k] = jnp.zeros(v.shape, jnp.float32)
        lora = unflatten_dict(flat)
    return unet, base, lora


def load_models(
    pretrained_model_name_or_path: str,
    scheduler_name: str = "ddim",
    v2: bool = False,
    v_pred: bool = False,
    weight_dtype=jnp.float32,
    clip_skip: Optional[int] = None,
    lora_spec: Optional[LoRASpec] = None,
    attn_backend: str = "xla",
    remat: bool = True,
) -> LoadedModels:
    """SD1.x/2.x loader (reference model_util.load_models,
    model_util.py:104-129). Accepts a diffusers directory or a single
    .ckpt/.safetensors LDM file."""
    path = pretrained_model_name_or_path
    if path.endswith(".ckpt") or path.endswith(".safetensors"):
        return _load_single_file(
            path, scheduler_name, v2, v_pred, weight_dtype, clip_skip,
            lora_spec, attn_backend, remat,
        )

    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"{path!r} is not a local diffusers directory or checkpoint file. "
            "leco-tpu is offline-only: download the model first."
        )

    with open(os.path.join(path, "unet", "config.json")) as f:
        unet_cfg_json = json.load(f)
    unet_config = unet_config_from_json(unet_cfg_json)
    unet_sd = _load_component_tensors(os.path.join(path, "unet"))
    unet, base, lora = _build_unet(
        unet_config, unet_sd, lora_spec, weight_dtype, attn_backend, remat
    )

    with open(os.path.join(path, "text_encoder", "config.json")) as f:
        te_cfg_json = json.load(f)
    te_config = clip_config_from_json(te_cfg_json, clip_skip)
    te_sd = _load_component_tensors(os.path.join(path, "text_encoder"))
    te_params = convert.torch_clip_to_flax(te_sd, te_config.num_hidden_layers)
    te_params = jax.tree.map(lambda x: jnp.asarray(x, weight_dtype), te_params)
    te = CLIPTextModel(config=te_config, dtype=weight_dtype, param_dtype=weight_dtype)

    tokenizer = CLIPTokenizer.from_pretrained(os.path.join(path, "tokenizer"))

    scheduler = create_noise_scheduler(
        scheduler_name,
        prediction_type="v_prediction" if v_pred else "epsilon",
    )
    return LoadedModels(
        tokenizer=tokenizer,
        text_encoder=LoadedTextEncoder(te, te_params, te_config),
        unet=unet,
        unet_base_params=base,
        unet_lora_params=lora,
        scheduler=scheduler,
        unet_config=unet_config,
    )


def _load_single_file(
    path, scheduler_name, v2, v_pred, weight_dtype, clip_skip,
    lora_spec, attn_backend, remat,
) -> LoadedModels:
    sd = _load_tensor_file(path)
    if any(k.startswith("conditioner.embedders.1.") for k in sd):
        raise ValueError(
            f"{path} is an SDXL single-file checkpoint; use load_models_xl "
            "(train_lora_xl.py) instead of the SD1/2 loader."
        )

    unet_sd = convert.ldm_unet_to_diffusers(sd)
    # infer config from tensor shapes
    cross_dim = unet_sd[
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight"
    ].shape[1]
    use_linear = (
        unet_sd["down_blocks.0.attentions.0.proj_in.weight"].ndim == 2
    )
    if v2:
        from leco_tpu.models.unet import sd21_config

        unet_config = sd21_config()
    else:
        from leco_tpu.models.unet import sd15_config

        unet_config = sd15_config()
    if unet_config.cross_attention_dim != cross_dim:
        raise ValueError(
            f"checkpoint cross-attention dim is {cross_dim} but v2={v2} "
            f"implies {unet_config.cross_attention_dim}. If this is an SD2.x "
            "checkpoint, set pretrained_model.v2: true in the config (the "
            "reference requires the same flag, config_util.py:17); if it is "
            "SD1.x, unset it."
        )
    if unet_config.use_linear_projection != use_linear:
        raise ValueError(
            f"checkpoint transformer proj_in is "
            f"{'linear' if use_linear else 'conv'} but the v2={v2} config "
            f"expects {'linear' if unet_config.use_linear_projection else 'conv'} "
            "— the v2 flag likely does not match the checkpoint."
        )

    unet, base, lora = _build_unet(
        unet_config, unet_sd, lora_spec, weight_dtype, attn_backend, remat
    )

    if v2:
        te_sd = convert.ldm_openclip_to_hf(sd)
        n_layers = 24 - (clip_skip - 1) if clip_skip is not None else 23
        te_config = sd2_text_config(n_layers)
    else:
        te_sd = convert.ldm_clip_to_hf(sd)
        n_layers = 12 - (clip_skip - 1) if clip_skip is not None else 12
        te_config = sd1_text_config(n_layers)
    te_params = convert.torch_clip_to_flax(te_sd, te_config.num_hidden_layers)
    te_params = jax.tree.map(lambda x: jnp.asarray(x, weight_dtype), te_params)
    te = CLIPTextModel(config=te_config, dtype=weight_dtype, param_dtype=weight_dtype)

    # single-file checkpoints carry no tokenizer; look for one next to the file
    tok_dir = os.path.join(os.path.dirname(os.path.abspath(path)), "tokenizer")
    if os.path.isdir(tok_dir):
        tokenizer = CLIPTokenizer.from_pretrained(tok_dir)
    else:
        raise FileNotFoundError(
            "single-file checkpoints need a tokenizer/ directory (vocab.json "
            f"+ merges.txt) next to the checkpoint; none found at {tok_dir}. "
            "(The reference downloaded it from the HF hub, model_util.py:19-20; "
            "this framework is offline-only.)"
        )

    scheduler = create_noise_scheduler(
        scheduler_name, prediction_type="v_prediction" if v_pred else "epsilon"
    )
    return LoadedModels(
        tokenizer=tokenizer,
        text_encoder=LoadedTextEncoder(te, te_params, te_config),
        unet=unet,
        unet_base_params=base,
        unet_lora_params=lora,
        scheduler=scheduler,
        unet_config=unet_config,
    )


def load_models_xl(
    pretrained_model_name_or_path: str,
    scheduler_name: str = "ddim",
    weight_dtype=jnp.float32,
    lora_spec: Optional[LoRASpec] = None,
    attn_backend: str = "xla",
    remat: bool = True,
) -> LoadedModels:
    """SDXL loader (reference model_util.load_models_xl,
    model_util.py:200-227): dual tokenizers (tokenizer_2 pad id 0) + dual
    text encoders + UNet."""
    path = pretrained_model_name_or_path
    if path.endswith(".ckpt") or path.endswith(".safetensors"):
        return _load_single_file_xl(
            path, scheduler_name, weight_dtype, lora_spec, attn_backend, remat
        )
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"{path!r} is not a local diffusers directory or checkpoint file. "
            "leco-tpu is offline-only: download the model first."
        )

    with open(os.path.join(path, "unet", "config.json")) as f:
        unet_config = unet_config_from_json(json.load(f))
    unet_sd = _load_component_tensors(os.path.join(path, "unet"))
    unet, base, lora = _build_unet(
        unet_config, unet_sd, lora_spec, weight_dtype, attn_backend, remat
    )

    encoders = []
    for sub in ("text_encoder", "text_encoder_2"):
        with open(os.path.join(path, sub, "config.json")) as f:
            cfg_json = json.load(f)
        te_config = clip_config_from_json(cfg_json)
        te_sd = _load_component_tensors(os.path.join(path, sub))
        te_params = convert.torch_clip_to_flax(te_sd, te_config.num_hidden_layers)
        te_params = jax.tree.map(
            lambda x: jnp.asarray(x, weight_dtype), te_params
        )
        te = CLIPTextModel(
            config=te_config, dtype=weight_dtype, param_dtype=weight_dtype
        )
        encoders.append(LoadedTextEncoder(te, te_params, te_config))

    tokenizer = CLIPTokenizer.from_pretrained(os.path.join(path, "tokenizer"))
    tokenizer_2 = CLIPTokenizer.from_pretrained(
        os.path.join(path, "tokenizer_2"), pad_token_id=0  # model_util.py:150
    )

    scheduler = create_noise_scheduler(scheduler_name)
    return LoadedModels(
        tokenizer=tokenizer,
        text_encoder=encoders[0],
        unet=unet,
        unet_base_params=base,
        unet_lora_params=lora,
        scheduler=scheduler,
        unet_config=unet_config,
        tokenizer_2=tokenizer_2,
        text_encoder_2=encoders[1],
    )


def load_vae_decoder(
    pretrained_model_name_or_path: str,
    weight_dtype=jnp.float32,
):
    """Load the VAE decoder from a diffusers dir's `vae/` subfolder (or a
    standalone VAE dir like madebyollin/sdxl-vae-fp16-fix,
    test/infer_xl.py:21). Returns (VAEDecoder module, params)."""
    from leco_tpu.models.vae import VAEDecoder, VAEDecoderConfig

    path = pretrained_model_name_or_path
    for sub in ("vae", ""):
        d = os.path.join(path, sub) if sub else path
        if os.path.exists(os.path.join(d, "config.json")):
            with open(os.path.join(d, "config.json")) as f:
                cfg_json = json.load(f)
            if "latent_channels" in cfg_json or "scaling_factor" in cfg_json:
                path = d
                break
    else:
        raise FileNotFoundError(f"no VAE config.json under {path}")

    config = VAEDecoderConfig(
        latent_channels=cfg_json.get("latent_channels", 4),
        out_channels=cfg_json.get("out_channels", 3),
        block_out_channels=tuple(
            cfg_json.get("block_out_channels", (128, 256, 512, 512))
        ),
        layers_per_block=cfg_json.get("layers_per_block", 2),
        norm_num_groups=cfg_json.get("norm_num_groups", 32),
        scaling_factor=cfg_json.get("scaling_factor", 0.18215),
    )
    sd = _load_component_tensors(path)
    params = convert.torch_vae_decoder_to_flax(sd)
    params = jax.tree.map(lambda x: jnp.asarray(x, weight_dtype), params)
    vae = VAEDecoder(config=config, dtype=weight_dtype, param_dtype=weight_dtype)
    return vae, params


def _sibling_tokenizer(path: str, sub: str, pad_token_id=None) -> CLIPTokenizer:
    tok_dir = os.path.join(os.path.dirname(os.path.abspath(path)), sub)
    if os.path.isdir(tok_dir):
        return CLIPTokenizer.from_pretrained(tok_dir, pad_token_id=pad_token_id)
    raise FileNotFoundError(
        f"single-file checkpoints need a {sub}/ directory (vocab.json + "
        f"merges.txt) next to the checkpoint; none found at {tok_dir}. "
        "(The reference downloaded it from the HF hub; this framework is "
        "offline-only.)"
    )


def _load_single_file_xl(
    path, scheduler_name, weight_dtype, lora_spec, attn_backend, remat
) -> LoadedModels:
    """SDXL .safetensors/.ckpt single file (the reference's
    StableDiffusionXLPipeline.from_single_file path, model_util.py:179-197)."""
    from leco_tpu.models.clip import sd1_text_config, sdxl_text2_config
    from leco_tpu.models.unet import sdxl_config

    sd = _load_tensor_file(path)
    if not any(k.startswith("conditioner.embedders.1.") for k in sd):
        raise ValueError(f"{path} does not look like an SDXL checkpoint")

    unet_sd = convert.ldm_unet_to_diffusers(sd)
    unet_config = sdxl_config()
    unet, base, lora = _build_unet(
        unet_config, unet_sd, lora_spec, weight_dtype, attn_backend, remat
    )

    te1_sd = convert.ldm_clip_to_hf(
        sd, prefix="conditioner.embedders.0.transformer."
    )
    te1_config = sd1_text_config()
    te1_params = convert.torch_clip_to_flax(te1_sd, te1_config.num_hidden_layers)
    te1_params = jax.tree.map(lambda x: jnp.asarray(x, weight_dtype), te1_params)
    te1 = CLIPTextModel(config=te1_config, dtype=weight_dtype, param_dtype=weight_dtype)

    te2_hf = convert.ldm_openclip_to_hf(
        sd, hidden_size=1280, prefix="conditioner.embedders.1.model."
    )
    te2_config = sdxl_text2_config()
    te2_params = convert.torch_clip_to_flax(te2_hf, te2_config.num_hidden_layers)
    te2_params = jax.tree.map(lambda x: jnp.asarray(x, weight_dtype), te2_params)
    te2 = CLIPTextModel(config=te2_config, dtype=weight_dtype, param_dtype=weight_dtype)

    tokenizer = _sibling_tokenizer(path, "tokenizer")
    tokenizer_2 = _sibling_tokenizer(path, "tokenizer_2", pad_token_id=0)

    scheduler = create_noise_scheduler(scheduler_name)
    return LoadedModels(
        tokenizer=tokenizer,
        text_encoder=LoadedTextEncoder(te1, te1_params, te1_config),
        unet=unet,
        unet_base_params=base,
        unet_lora_params=lora,
        scheduler=scheduler,
        unet_config=unet_config,
        tokenizer_2=tokenizer_2,
        text_encoder_2=LoadedTextEncoder(te2, te2_params, te2_config),
    )
