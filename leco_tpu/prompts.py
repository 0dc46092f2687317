"""Prompt schema, embedding cache and the ESD erase/enhance loss.

Mirrors the reference prompt layer (prompt_util.py in p1atdev/LECO):
  * `PromptSettings` — one YAML prompt entry with validator-filled defaults
    (prompt_util.py:43-67): positive <- target, neutral <- unconditional.
  * `PromptEmbedsCache` — each unique prompt string encoded once
    (prompt_util.py:30-40).
  * ESD loss — erase: MSE(target, neutral - g*(positive - uncond));
    enhance: MSE(target, neutral + g*(positive - uncond))
    (prompt_util.py:107-135). Exposed both as the pure function `esd_loss`
    (used inside the jitted train step; fp32 accumulation) and as
    `PromptEmbedsPair.loss(...)` for API parity.
"""

from __future__ import annotations

from pathlib import Path
from typing import Literal, Optional, Union

import jax.numpy as jnp
import yaml
from pydantic import BaseModel, ConfigDict, model_validator

ACTION_TYPES = Literal["erase", "enhance"]


class PromptEmbedsXL:
    """SDXL needs two embeddings per prompt: sequence + pooled
    (reference prompt_util.py:17-24)."""

    def __init__(self, text_embeds, pooled_embeds) -> None:
        self.text_embeds = text_embeds
        self.pooled_embeds = pooled_embeds


# SD v1.x / v2.x cache values are arrays, SDXL values are PromptEmbedsXL.
PROMPT_EMBEDDING = Union[jnp.ndarray, PromptEmbedsXL]


class PromptEmbedsCache:
    """Prompt string -> embedding, computed once before the train loop."""

    def __init__(self) -> None:
        self.prompts: dict[str, PROMPT_EMBEDDING] = {}

    def __setitem__(self, name: str, value: PROMPT_EMBEDDING) -> None:
        self.prompts[name] = value

    def __getitem__(self, name: str) -> Optional[PROMPT_EMBEDDING]:
        return self.prompts.get(name)


class PromptSettings(BaseModel):
    """One prompt entry of the prompts YAML (prompt_util.py:43-67)."""

    model_config = ConfigDict(extra="ignore")

    target: str
    positive: str = None  # if None, target is used
    unconditional: str = ""
    neutral: str = None  # if None, unconditional is used
    action: ACTION_TYPES = "erase"
    guidance_scale: float = 1.0
    resolution: int = 512
    dynamic_resolution: bool = False
    batch_size: int = 1
    dynamic_crops: bool = False  # only used for SDXL

    @model_validator(mode="before")
    @classmethod
    def fill_prompts(cls, values):
        if "target" not in values:
            raise ValueError("target must be specified")
        values.setdefault("positive", values["target"])
        values.setdefault("unconditional", "")
        values.setdefault("neutral", values["unconditional"])
        return values


def esd_loss(
    target_latents: jnp.ndarray,
    positive_latents: jnp.ndarray,
    unconditional_latents: jnp.ndarray,
    neutral_latents: jnp.ndarray,
    guidance_scale: jnp.ndarray | float,
    erase_sign: jnp.ndarray | float,
) -> jnp.ndarray:
    """ESD noise-prediction MSE loss, fp32.

    erase_sign = +1.0 for "erase" (target pushed AWAY from the concept:
    neutral - g*(positive - uncond)), -1.0 for "enhance" (toward it).
    Matches prompt_util.py:107-135; computed in fp32 regardless of the model
    dtype (the reference moved all four predictions to cpu/fp32,
    train_lora.py:213-256 — here we just upcast on device).
    """
    f32 = jnp.float32
    target = target_latents.astype(f32)
    positive = positive_latents.astype(f32)
    uncond = unconditional_latents.astype(f32)
    neutral = neutral_latents.astype(f32)
    goal = neutral - erase_sign * guidance_scale * (positive - uncond)
    return jnp.mean((target - goal) ** 2)


class PromptEmbedsPair:
    """Cached embeddings for one prompt entry + its loss settings
    (prompt_util.py:70-148)."""

    def __init__(
        self,
        target: PROMPT_EMBEDDING,
        positive: PROMPT_EMBEDDING,
        unconditional: PROMPT_EMBEDDING,
        neutral: PROMPT_EMBEDDING,
        settings: PromptSettings,
    ) -> None:
        self.target = target
        self.positive = positive
        self.unconditional = unconditional
        self.neutral = neutral

        self.guidance_scale = settings.guidance_scale
        self.resolution = settings.resolution
        self.dynamic_resolution = settings.dynamic_resolution
        self.batch_size = settings.batch_size
        self.dynamic_crops = settings.dynamic_crops
        self.action = settings.action
        self.settings = settings

    @property
    def erase_sign(self) -> float:
        if self.action == "erase":
            return 1.0
        if self.action == "enhance":
            return -1.0
        raise ValueError("action must be erase or enhance")

    def loss(
        self,
        *,
        target_latents,
        positive_latents,
        unconditional_latents,
        neutral_latents,
    ):
        return esd_loss(
            target_latents,
            positive_latents,
            unconditional_latents,
            neutral_latents,
            guidance_scale=self.guidance_scale,
            erase_sign=self.erase_sign,
        )


def load_prompts_from_yaml(path: str | Path) -> list[PromptSettings]:
    """YAML list -> [PromptSettings] (prompt_util.py:151-160)."""
    with open(path, "r") as f:
        prompts = yaml.safe_load(f)
    if not prompts:
        raise ValueError("prompts file is empty")
    return [PromptSettings(**prompt) for prompt in prompts]
