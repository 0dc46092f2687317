"""Pre-loop sanity checks (reference: debug_util.py).

The reference printed `requires_grad` and training-mode flags of the torch
modules (debug_util.py:6-16). The functional equivalents: which pytree is
differentiated (always exactly the lora tree) and its dtypes/sizes."""

from __future__ import annotations

import jax
import numpy as np
from flax.traverse_util import flatten_dict


def check_trainable_params(lora_params) -> dict:
    """Print and return a summary of the trainable (LoRA) tree."""
    flat = flatten_dict(lora_params)
    n_params = sum(int(np.prod(v.shape)) for v in flat.values())
    dtypes = {str(v.dtype) for v in flat.values()}
    n_layers = len({k[:-1] for k in flat})
    summary = {
        "trainable tensors": len(flat),
        "trainable params": n_params,
        "lora layers": n_layers,
        "dtypes": sorted(dtypes),
    }
    print("[leco-tpu] trainable:", summary)
    return summary


def check_frozen_params(base_params) -> dict:
    flat = flatten_dict(base_params)
    n_params = sum(int(np.prod(v.shape)) for v in flat.values())
    summary = {"frozen tensors": len(flat), "frozen params": n_params}
    print("[leco-tpu] frozen:", summary)
    return summary


def print_latent_corner(name: str, latents) -> None:
    """The reference's verbose latent peek (train_lora.py:239-242)."""
    arr = np.asarray(jax.device_get(latents), dtype=np.float32)
    print(f"{name}:", arr[0, :5, :5, 0] if arr.ndim == 4 else arr[:5])
