"""torch state-dict -> Flax param-tree conversion (UNet + CLIP), plus the
LDM single-file key remapping.

Replaces the loading half of model_util.py (p1atdev/LECO): where the
reference delegates to diffusers `from_pretrained` / `from_single_file`
(model_util.py:29-129, 179-197), this module converts raw torch tensors
(read via safetensors, no torch required) into the Flax trees of
`leco_tpu.models.unet.UNet2DConditionModel` / `leco_tpu.models.clip`.

Layout rules:
  * Linear `weight` (out, in)        -> `kernel` (in, out)
  * Conv   `weight` (out, in, kh, kw)-> `kernel` (kh, kw, in, out)
  * Norm   `weight` (c,)             -> `scale`
  * Embedding `weight`               -> `embedding` (unchanged)
Path rule: diffusers dotted names with numeric segments fold into the Flax
module names ("down_blocks.0.attentions.0" -> "down_blocks_0/attentions_0";
"ff.net.0.proj" -> "ff/net_0/proj"; "to_out.0" -> "to_out_0").
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
from flax.traverse_util import unflatten_dict

# diffusers UNet modules whose children take a trailing ".N" that folds into
# the PARENT name (ModuleList indices)
_INDEXED = (
    "down_blocks",
    "up_blocks",
    "attentions",
    "resnets",
    "downsamplers",
    "upsamplers",
    "transformer_blocks",
    "net",
    "to_out",
    "layers",
)


def _fold_path(name: str) -> tuple[str, ...]:
    """'down_blocks.0.attentions.1.proj_in' ->
    ('down_blocks_0', 'attentions_1', 'proj_in')."""
    tokens = name.split(".")
    out: list[str] = []
    for tok in tokens:
        if tok.isdigit() and out and out[-1].split("_")[0] in {
            p.split("_")[0] for p in _INDEXED
        }:
            out[-1] = f"{out[-1]}_{tok}"
        elif tok.isdigit() and out:
            out[-1] = f"{out[-1]}_{tok}"
        else:
            out.append(tok)
    return tuple(out)


def _convert_leaf(path: tuple[str, ...], value: np.ndarray):
    """Map a (path, tensor) pair to the flax (path, array) pair."""
    leaf = path[-1]
    if leaf == "weight":
        if value.ndim == 4:  # conv
            return path[:-1] + ("kernel",), value.transpose(2, 3, 1, 0)
        if value.ndim == 2:  # linear
            return path[:-1] + ("kernel",), value.T
        return path[:-1] + ("scale",), value  # norm
    if leaf == "bias":
        return path, value
    return path, value


def torch_unet_to_flax(state_dict: Mapping[str, np.ndarray]) -> dict:
    """diffusers UNet2DConditionModel torch state dict -> flax params."""
    flat = {}
    for name, value in state_dict.items():
        value = np.asarray(value)
        path = _fold_path(name)
        # parameterless modules in the torch dict metadata
        if path[0] in ("time_proj", "add_time_proj"):
            continue
        path, value = _convert_leaf(path, value)
        flat[path] = value
    return unflatten_dict(flat)


def torch_clip_to_flax(
    state_dict: Mapping[str, np.ndarray], num_hidden_layers: int
) -> dict:
    """HF CLIPTextModel(WithProjection) torch state dict -> flax params for
    `leco_tpu.models.clip.CLIPTextModel`. Layers >= num_hidden_layers are
    dropped (the reference's clip-skip arithmetic, model_util.py:48,62)."""
    flat = {}
    for name, value in state_dict.items():
        value = np.asarray(value)
        if name == "text_projection.weight":
            flat[("text_projection", "kernel")] = value.T
            continue
        if not name.startswith("text_model."):
            continue
        name = name[len("text_model.") :]
        if name.startswith("embeddings."):
            name = name[len("embeddings.") :]
            which = name.split(".")[0]  # token_embedding | position_embedding
            flat[(which, "embedding")] = value
            continue
        if name.startswith("encoder.layers."):
            rest = name[len("encoder.layers.") :]
            idx, rest = rest.split(".", 1)
            if int(idx) >= num_hidden_layers:
                continue
            layer = f"layers_{idx}"
            if rest.startswith("self_attn."):
                sub = rest[len("self_attn.") :]  # q_proj.weight etc.
                proj, leaf = sub.split(".")
                path = (layer, "self_attn", proj, leaf)
            elif rest.startswith("mlp."):
                sub = rest[len("mlp.") :]  # fc1.weight
                fc, leaf = sub.split(".")
                path = (layer, f"mlp_{fc}", leaf)
            else:  # layer_norm1.weight etc.
                ln, leaf = rest.split(".")
                path = (layer, ln, leaf)
            path, value = _convert_leaf(path, value)
            flat[path] = value
            continue
        if name.startswith("final_layer_norm."):
            leaf = name.split(".")[-1]
            path, value = _convert_leaf(("final_layer_norm", leaf), value)
            flat[path] = value
            continue
        # position_ids buffers etc. are dropped
    return unflatten_dict(flat)


# ---------------------------------------------------------------------------
# LDM single-file (.ckpt / .safetensors) -> diffusers key layout
# (the from_single_file path, model_util.py:77-101)
# ---------------------------------------------------------------------------


def _ldm_resnet(prefix_out: str, prefix_in: str) -> dict[str, str]:
    return {
        f"{prefix_in}.in_layers.0.weight": f"{prefix_out}.norm1.weight",
        f"{prefix_in}.in_layers.0.bias": f"{prefix_out}.norm1.bias",
        f"{prefix_in}.in_layers.2.weight": f"{prefix_out}.conv1.weight",
        f"{prefix_in}.in_layers.2.bias": f"{prefix_out}.conv1.bias",
        f"{prefix_in}.emb_layers.1.weight": f"{prefix_out}.time_emb_proj.weight",
        f"{prefix_in}.emb_layers.1.bias": f"{prefix_out}.time_emb_proj.bias",
        f"{prefix_in}.out_layers.0.weight": f"{prefix_out}.norm2.weight",
        f"{prefix_in}.out_layers.0.bias": f"{prefix_out}.norm2.bias",
        f"{prefix_in}.out_layers.3.weight": f"{prefix_out}.conv2.weight",
        f"{prefix_in}.out_layers.3.bias": f"{prefix_out}.conv2.bias",
        f"{prefix_in}.skip_connection.weight": f"{prefix_out}.conv_shortcut.weight",
        f"{prefix_in}.skip_connection.bias": f"{prefix_out}.conv_shortcut.bias",
    }


def ldm_unet_to_diffusers(
    state_dict: Mapping[str, np.ndarray],
    num_blocks: int | None = None,
    layers_per_block: int = 2,
    strict: bool = True,
) -> dict[str, np.ndarray]:
    """'model.diffusion_model.*' LDM UNet keys -> diffusers UNet keys.

    Handles SD1.x/2.x (4 levels) and SDXL (3 levels) — the level count is
    inferred from the highest input_blocks index, and attention presence per
    block is detected from the keys themselves.

    With ``strict`` (the default), any ``model.diffusion_model.*`` key the
    mapping does not cover raises with the full list of leftover keys — a
    partially-understood checkpoint must fail loudly, not load a silently
    incomplete UNet (the reference gets this for free from diffusers'
    ``from_single_file``, model_util.py:77-101).
    """
    prefix = "model.diffusion_model."
    sd = {
        k[len(prefix) :]: np.asarray(v)
        for k, v in state_dict.items()
        if k.startswith(prefix)
    }
    if not sd:
        raise ValueError("no model.diffusion_model.* keys found")

    if num_blocks is None:
        max_in = max(
            int(k.split(".")[1]) for k in sd if k.startswith("input_blocks.")
        )
        # max index = num_blocks*layers + (num_blocks - 1)
        num_blocks = (max_in + 1) // (layers_per_block + 1)

    mapping: dict[str, str] = {
        "time_embed.0.weight": "time_embedding.linear_1.weight",
        "time_embed.0.bias": "time_embedding.linear_1.bias",
        "time_embed.2.weight": "time_embedding.linear_2.weight",
        "time_embed.2.bias": "time_embedding.linear_2.bias",
        "label_emb.0.0.weight": "add_embedding.linear_1.weight",
        "label_emb.0.0.bias": "add_embedding.linear_1.bias",
        "label_emb.0.2.weight": "add_embedding.linear_2.weight",
        "label_emb.0.2.bias": "add_embedding.linear_2.bias",
        "input_blocks.0.0.weight": "conv_in.weight",
        "input_blocks.0.0.bias": "conv_in.bias",
        "out.0.weight": "conv_norm_out.weight",
        "out.0.bias": "conv_norm_out.bias",
        "out.2.weight": "conv_out.weight",
        "out.2.bias": "conv_out.bias",
    }

    # --- input (down) blocks: LDM input_blocks.{1..}: per level:
    # layers_per_block resnet(+attn) entries then a downsample entry
    ldm_idx = 1
    for level in range(num_blocks):
        for layer in range(layers_per_block):
            d_res = f"down_blocks.{level}.resnets.{layer}"
            mapping.update(_ldm_resnet(d_res, f"input_blocks.{ldm_idx}.0"))
            # attention present if the key exists
            attn_in = f"input_blocks.{ldm_idx}.1"
            if any(k.startswith(attn_in + ".") for k in sd):
                _map_attention(
                    mapping, f"down_blocks.{level}.attentions.{layer}", attn_in, sd
                )
            ldm_idx += 1
        if level != num_blocks - 1:
            mapping[f"input_blocks.{ldm_idx}.0.op.weight"] = (
                f"down_blocks.{level}.downsamplers.0.conv.weight"
            )
            mapping[f"input_blocks.{ldm_idx}.0.op.bias"] = (
                f"down_blocks.{level}.downsamplers.0.conv.bias"
            )
            ldm_idx += 1

    # --- mid
    mapping.update(_ldm_resnet("mid_block.resnets.0", "middle_block.0"))
    _map_attention(mapping, "mid_block.attentions.0", "middle_block.1", sd)
    mapping.update(_ldm_resnet("mid_block.resnets.1", "middle_block.2"))

    # --- output (up) blocks: layers_per_block+1 entries per level. Each
    # output block is a submodule list: [resnet] (+ [transformer]) and the
    # last block of a non-final level appends an [upsample]. The transformer
    # is identified by its `norm.weight` key, the upsampler by `conv.weight`.
    ldm_idx = 0
    for level in range(num_blocks):
        for layer in range(layers_per_block + 1):
            u_res = f"up_blocks.{level}.resnets.{layer}"
            mapping.update(_ldm_resnet(u_res, f"output_blocks.{ldm_idx}.0"))
            for sub in (1, 2):
                prefix = f"output_blocks.{ldm_idx}.{sub}"
                if f"{prefix}.norm.weight" in sd:  # Transformer2DModel
                    _map_attention(
                        mapping,
                        f"up_blocks.{level}.attentions.{layer}",
                        prefix,
                        sd,
                    )
                elif f"{prefix}.conv.weight" in sd:  # Upsample2D
                    mapping[f"{prefix}.conv.weight"] = (
                        f"up_blocks.{level}.upsamplers.0.conv.weight"
                    )
                    mapping[f"{prefix}.conv.bias"] = (
                        f"up_blocks.{level}.upsamplers.0.conv.bias"
                    )
            ldm_idx += 1

    out = {}
    for ldm_key, diff_key in mapping.items():
        if ldm_key in sd:
            out[diff_key] = sd[ldm_key]
    if strict:
        unmapped = sorted(set(sd) - set(mapping))
        if unmapped:
            shown = "\n  ".join(
                f"model.diffusion_model.{k}" for k in unmapped[:40]
            )
            more = (
                f"\n  ... and {len(unmapped) - 40} more" if len(unmapped) > 40 else ""
            )
            raise ValueError(
                f"{len(unmapped)} UNet key(s) in this checkpoint are not "
                f"covered by the LDM->diffusers mapping (inferred "
                f"num_blocks={num_blocks}, layers_per_block={layers_per_block}); "
                f"refusing to load a partial UNet. Leftover keys:\n  {shown}{more}\n"
                "If these are expected non-UNet extras, pass strict=False."
            )
    return out


def _map_attention(mapping: dict, out_prefix: str, in_prefix: str, sd) -> None:
    """Transformer2DModel keys are identical between LDM and diffusers apart
    from the prefix."""
    for k in list(sd):
        if k.startswith(in_prefix + "."):
            mapping[k] = out_prefix + k[len(in_prefix) :]


def ldm_clip_to_hf(
    state_dict: Mapping[str, np.ndarray],
    prefix: str = "cond_stage_model.transformer.",
) -> dict[str, np.ndarray]:
    """LDM-embedded HF-format CLIP text encoder -> bare HF CLIP keys.
    Prefixes: 'cond_stage_model.transformer.' (SD1.x) or
    'conditioner.embedders.0.transformer.' (SDXL CLIP-L)."""
    return {
        k[len(prefix) :]: np.asarray(v)
        for k, v in state_dict.items()
        if k.startswith(prefix)
    }


def ldm_openclip_to_hf(
    state_dict: Mapping[str, np.ndarray],
    hidden_size: int = 1024,
    prefix: str = "cond_stage_model.model.",
) -> dict[str, np.ndarray]:
    """open_clip text tower -> HF CLIP keys: fused in_proj split into q/k/v.
    Prefixes: 'cond_stage_model.model.' (SD2.x single file) or
    'conditioner.embedders.1.model.' (SDXL single file, bigG)."""
    sd = {
        k[len(prefix) :]: np.asarray(v)
        for k, v in state_dict.items()
        if k.startswith(prefix)
    }
    if not sd:
        return {}
    out: dict[str, np.ndarray] = {}
    if "text_projection" in sd:
        # open_clip stores (width, proj) used as x @ W; HF Linear is x @ W.T
        out["text_projection.weight"] = sd["text_projection"].T
    out["text_model.embeddings.token_embedding.weight"] = sd[
        "token_embedding.weight"
    ]
    out["text_model.embeddings.position_embedding.weight"] = sd[
        "positional_embedding"
    ]
    out["text_model.final_layer_norm.weight"] = sd["ln_final.weight"]
    out["text_model.final_layer_norm.bias"] = sd["ln_final.bias"]
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        src = f"transformer.resblocks.{i}"
        dst = f"text_model.encoder.layers.{i}"
        out[f"{dst}.layer_norm1.weight"] = sd[f"{src}.ln_1.weight"]
        out[f"{dst}.layer_norm1.bias"] = sd[f"{src}.ln_1.bias"]
        out[f"{dst}.layer_norm2.weight"] = sd[f"{src}.ln_2.weight"]
        out[f"{dst}.layer_norm2.bias"] = sd[f"{src}.ln_2.bias"]
        w = sd[f"{src}.attn.in_proj_weight"]
        b = sd[f"{src}.attn.in_proj_bias"]
        for j, proj in enumerate(("q_proj", "k_proj", "v_proj")):
            out[f"{dst}.self_attn.{proj}.weight"] = w[
                j * hidden_size : (j + 1) * hidden_size
            ]
            out[f"{dst}.self_attn.{proj}.bias"] = b[
                j * hidden_size : (j + 1) * hidden_size
            ]
        out[f"{dst}.self_attn.out_proj.weight"] = sd[f"{src}.attn.out_proj.weight"]
        out[f"{dst}.self_attn.out_proj.bias"] = sd[f"{src}.attn.out_proj.bias"]
        out[f"{dst}.mlp.fc1.weight"] = sd[f"{src}.mlp.c_fc.weight"]
        out[f"{dst}.mlp.fc1.bias"] = sd[f"{src}.mlp.c_fc.bias"]
        out[f"{dst}.mlp.fc2.weight"] = sd[f"{src}.mlp.c_proj.weight"]
        out[f"{dst}.mlp.fc2.bias"] = sd[f"{src}.mlp.c_proj.bias"]
        i += 1
    return out


def torch_vae_decoder_to_flax(state_dict: Mapping[str, np.ndarray]) -> dict:
    """diffusers AutoencoderKL state dict -> flax params for
    `leco_tpu.models.vae.VAEDecoder` (decoder half + post_quant_conv only).
    Handles both modern attention names (to_q/to_out.0) and the legacy VAE
    names (query/key/value/proj_attn, 1x1-conv-shaped)."""
    legacy_attn = {
        "query": "to_q",
        "key": "to_k",
        "value": "to_v",
        "proj_attn": "to_out_0",
        "q": "to_q",
        "k": "to_k",
        "v": "to_v",
        "proj_out": "to_out_0",
    }
    flat = {}
    for name, value in state_dict.items():
        value = np.asarray(value)
        if name.startswith("post_quant_conv."):
            leaf = name.split(".")[-1]
            path, value = _convert_leaf(("post_quant_conv", leaf), value)
            flat[path] = value
            continue
        if not name.startswith("decoder."):
            continue
        tokens = name[len("decoder.") :].split(".")
        # fold numeric segments into the previous token, then join the block
        # levels into the flat module names VAEDecoder uses
        folded: list[str] = []
        for tok in tokens:
            if tok.isdigit() and folded:
                folded[-1] = f"{folded[-1]}_{tok}"
            else:
                folded.append(tok)
        # decoder.mid_block.resnets_0.conv1.weight ->
        #   ("mid_block_resnets_0", "conv1", "weight")
        if folded[0] in ("mid_block", "up_blocks") or folded[0].startswith(
            ("mid_block", "up_blocks")
        ):
            head = "_".join(folded[:-2]) if len(folded) > 2 else folded[0]
            rest = folded[len(folded) - 2 :]
            # attention submodule names may need the legacy mapping
            if rest[0] in legacy_attn:
                rest[0] = legacy_attn[rest[0]]
                if value.ndim == 4:  # legacy 1x1-conv attention projections
                    value = value[:, :, 0, 0]
            if rest[0] == "to_out":  # "to_out.0" folded into "to_out_0"
                rest[0] = "to_out_0"
            path = (head,) + tuple(rest)
        else:
            path = tuple(folded)
        path, value = _convert_leaf(path, value)
        flat[path] = value
    return unflatten_dict(flat)


def torch_clip_vision_to_flax(state_dict: Mapping[str, np.ndarray]) -> dict:
    """HF CLIPVisionModel(WithProjection) / CLIPModel vision half -> flax
    params for `leco_tpu.models.clip_vision.CLIPVisionModel`."""
    flat = {}
    for name, value in state_dict.items():
        value = np.asarray(value)
        if name == "visual_projection.weight":
            flat[("visual_projection", "kernel")] = value.T
            continue
        if not name.startswith("vision_model."):
            continue
        name = name[len("vision_model.") :]
        if name == "embeddings.class_embedding":
            flat[("class_embedding",)] = value.reshape(-1)
            continue
        if name == "embeddings.patch_embedding.weight":
            flat[("patch_embedding", "kernel")] = value.transpose(2, 3, 1, 0)
            continue
        if name == "embeddings.position_embedding.weight":
            flat[("position_embedding", "embedding")] = value
            continue
        # HF ships the pre-norm under the historical typo "pre_layrnorm"
        for ln in ("pre_layrnorm", "pre_layernorm", "post_layernorm"):
            if name.startswith(ln + "."):
                leaf = name.split(".")[-1]
                target = "pre_layrnorm" if ln.startswith("pre") else ln
                path, value = _convert_leaf((target, leaf), value)
                flat[path] = value
                break
        else:
            if name.startswith("encoder.layers."):
                rest = name[len("encoder.layers.") :]
                idx, rest = rest.split(".", 1)
                layer = f"layers_{idx}"
                if rest.startswith("self_attn."):
                    proj, leaf = rest[len("self_attn.") :].split(".")
                    path = (layer, "self_attn", proj, leaf)
                elif rest.startswith("mlp."):
                    fc, leaf = rest[len("mlp.") :].split(".")
                    path = (layer, f"mlp_{fc}", leaf)
                else:
                    ln_, leaf = rest.split(".")
                    path = (layer, ln_, leaf)
                path, value = _convert_leaf(path, value)
                flat[path] = value
    return unflatten_dict(flat)
