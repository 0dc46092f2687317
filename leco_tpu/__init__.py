"""leco-tpu: a TPU-native JAX framework for training concept-erasing/enhancing
LoRA adapters on Stable Diffusion models using only prompts (the ESD objective).

Re-implementation of the capabilities of p1atdev/LECO (PyTorch/CUDA), designed
TPU-first: Flax UNet + CLIP text encoders, pure-JAX noise schedulers, LoRA as a
functional parameter-tree overlay, a single jitted train step, Pallas flash
attention, and data parallelism over a `jax.sharding.Mesh`.
"""

__version__ = "0.3.0"

from leco_tpu.config import (  # noqa: F401
    RootConfig,
    load_config_from_yaml,
    parse_precision,
)
from leco_tpu.prompts import (  # noqa: F401
    PromptSettings,
    PromptEmbedsCache,
    PromptEmbedsPair,
    load_prompts_from_yaml,
)
from leco_tpu.lora import (  # noqa: F401
    LoRASpec,
    compose_lora_params,
    fold_lora_params,
    load_lora_weights,
    merge_params,
    save_lora_weights,
    scale_lora_tree,
    split_lora_params,
)
