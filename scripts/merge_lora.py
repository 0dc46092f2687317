"""Bake a trained LoRA into base UNet weights and write a merged diffusers
safetensors file.

W' = W + up @ down * (alpha/rank) * multiplier per targeted layer (the
standard A1111/kohya merge). Output is a torch-layout diffusers UNet state
dict loadable by any SD consumer (and by this framework's loader).

Usage:
  python scripts/merge_lora.py \
      --model /models/stable-diffusion-v1-5 \
      --lora output/van_gogh_last.safetensors \
      --multiplier 1.0 --rank 4 --out merged_unet.safetensors
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def merge_lora_into_torch_sd(
    torch_sd: dict, lora_state: dict, multiplier: float = 1.0
) -> dict:
    """Apply every `lora_unet_<name>.*` triplet in `lora_state` to the
    matching diffusers key in `torch_sd` (both in torch layout)."""
    # group lora entries per layer
    layers = {}
    for key, v in lora_state.items():
        name, _, leaf = key.rpartition(".")
        if leaf == "alpha":
            layers.setdefault(name, {})["alpha"] = float(np.asarray(v))
            continue
        name, _, which = name.rpartition(".")
        layers.setdefault(name, {})[which] = np.asarray(v, np.float32)

    out = dict(torch_sd)
    merged = 0
    for name, t in layers.items():
        diff_key = name[len("lora_unet_") :].replace("_", ".") + ".weight"
        # underscores are ambiguous ('down.blocks.0...'); resolve against the
        # actual key set
        target = _resolve_key(out, name)
        if target is None:
            raise KeyError(f"cannot resolve {name} to a diffusers key")
        down, up = t["lora_down"], t["lora_up"]
        rank = down.shape[0]
        alpha = t.get("alpha", float(rank))
        scale = alpha / rank * multiplier
        w = np.asarray(out[target], np.float32)
        if w.ndim == 2:
            delta = up @ down * scale
        else:  # conv: (out,r,1,1) @ (r,in,kh,kw) contracted over r
            delta = np.einsum("or..., rikh -> oikh", up[:, :, 0, 0], down) * scale
            delta = delta.reshape(w.shape)
        out[target] = (w + delta).astype(np.asarray(out[target]).dtype)
        merged += 1
    print(f"merged {merged} LoRA layers")
    return out


def _resolve_key(torch_sd: dict, lora_name: str):
    """lora_unet_down_blocks_0_attentions_0_..._to_q -> the dotted diffusers
    key, resolved by matching against the real key set (underscore folding
    is ambiguous otherwise)."""
    flat = lora_name[len("lora_unet_") :]
    for key in torch_sd:
        if not key.endswith(".weight"):
            continue
        if key[: -len(".weight")].replace(".", "_") == flat:
            return key
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="diffusers dir")
    ap.add_argument("--lora", required=True)
    ap.add_argument("--multiplier", type=float, default=1.0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from safetensors.numpy import load_file, save_file

    from leco_tpu.models.loader import _load_component_tensors

    torch_sd = _load_component_tensors(os.path.join(args.model, "unet"))
    lora_state = load_file(args.lora)
    merged = merge_lora_into_torch_sd(torch_sd, lora_state, args.multiplier)
    save_file(
        {k: np.ascontiguousarray(v) for k, v in merged.items()}, args.out
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
