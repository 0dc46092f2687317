"""Optimizer + LR-scheduler factories (optax).

Mirrors train_util.get_optimizer / get_lr_scheduler (train_util.py:333-401 in
p1atdev/LECO) with optax equivalents:

  name        reference backend          here
  ---------   ------------------------   ------------------------------------
  adam        torch.optim.Adam           optax.adam (torch defaults)
  adamw       torch.optim.AdamW          optax.adamw (weight_decay=0.01)
  lion        lion_pytorch.Lion          optax.lion (weight_decay=0.0)
  prodigy     prodigyopt.Prodigy         optax.contrib.prodigy
  dadaptadam  dadaptation.DAdaptAdam     optax.contrib.dadapt_adamw
  dadaptlion  dadaptation.DAdaptLion     train/dadapt.py (published algorithm)
  adam8bit    bitsandbytes Adam8bit      train/quant8.py — blockwise dynamic
  lion8bit    bitsandbytes Lion8bit      8-bit states per Dettmers et al.

The `optimizer_args` mini-DSL ("key=value key=value", ast.literal_eval per
value — train_lora.py:82-89) is parsed here, with torch arg names mapped to
optax (betas -> b1/b2, weight_decay, eps).

LR schedules reproduce the torch semantics exactly (train_util.py:373-401):
cosine (eta_min = lr/100), cosine_with_restarts (T_0 = iters//10, T_mult=2),
step (step_size = iters//100, gamma=0.999), constant, linear (start factor
0.5 over iters//100).
"""

from __future__ import annotations

import ast
from typing import Optional

import jax.numpy as jnp
import optax


def parse_optimizer_args(optimizer_args: str) -> dict:
    """'k1=v1 k2=v2' -> dict via ast.literal_eval (train_lora.py:82-89)."""
    kwargs = {}
    if optimizer_args:
        for arg in optimizer_args.split(" "):
            if not arg:
                continue
            key, value = arg.split("=")
            kwargs[key] = ast.literal_eval(value)
    return kwargs


def _map_torch_kwargs(kwargs: dict) -> dict:
    out = dict(kwargs)
    if "betas" in out:
        b1, b2 = out.pop("betas")
        out["b1"] = b1
        out["b2"] = b2
    return out


def get_lr_schedule(
    name: Optional[str],
    lr: float,
    max_iterations: Optional[int],
    lr_min: Optional[float] = None,
) -> optax.Schedule:
    """Schedule fn(step) -> lr, matching the torch schedulers the reference
    instantiates (train_util.py:373-401; lr_min = lr/100 per
    train_lora.py:90-95)."""
    if lr_min is None:
        lr_min = lr / 100

    if name == "cosine":

        def schedule(step):
            t = jnp.minimum(step, max_iterations)
            return lr_min + (lr - lr_min) * 0.5 * (
                1 + jnp.cos(jnp.pi * t / max_iterations)
            )

        return schedule

    if name == "cosine_with_restarts":
        t0 = max(max_iterations // 10, 1)

        def schedule(step):
            # cycle k has length T_0 * 2^k, starting at T_0 * (2^k - 1)
            step = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
            k = jnp.floor(jnp.log2(step / t0 + 1.0))
            cycle_start = t0 * (2.0**k - 1.0)
            cycle_len = t0 * 2.0**k
            t_cur = step - cycle_start
            return lr_min + (lr - lr_min) * 0.5 * (
                1 + jnp.cos(jnp.pi * t_cur / cycle_len)
            )

        return schedule

    if name == "step":
        step_size = max(max_iterations // 100, 1)

        def schedule(step):
            return lr * 0.999 ** jnp.floor(step / step_size)

        return schedule

    if name == "constant" or name is None:
        return lambda step: jnp.asarray(lr)

    if name == "linear":
        total = max(max_iterations // 100, 1)

        def schedule(step):
            frac = jnp.clip(step / total, 0.0, 1.0)
            return lr * (0.5 + 0.5 * frac)

        return schedule

    raise ValueError(
        "Scheduler must be cosine, cosine_with_restarts, step, linear or constant"
    )


def get_optimizer(
    name: str,
    lr_schedule: optax.Schedule,
    optimizer_args: str = "",
) -> optax.GradientTransformation:
    """Name -> optax transformation (train_util.py:333-370)."""
    name = name.lower()
    kwargs = _map_torch_kwargs(parse_optimizer_args(optimizer_args))

    if name.startswith("dadapt"):
        if name == "dadaptlion":
            from leco_tpu.train.dadapt import dadapt_lion

            return dadapt_lion(learning_rate=lr_schedule, **kwargs)
        if name == "dadaptadam":
            return optax.contrib.dadapt_adamw(learning_rate=lr_schedule, **kwargs)
        raise ValueError("DAdapt optimizer must be dadaptadam or dadaptlion")

    if name == "adam":
        kwargs.setdefault("eps", 1e-8)
        return optax.adam(learning_rate=lr_schedule, **kwargs)
    if name == "adam8bit":
        from leco_tpu.train.quant8 import adam8bit

        kwargs.setdefault("eps", 1e-8)
        return adam8bit(learning_rate=lr_schedule, **kwargs)
    if name == "adamw":
        kwargs.setdefault("eps", 1e-8)
        kwargs.setdefault("weight_decay", 0.01)  # torch AdamW default
        return optax.adamw(learning_rate=lr_schedule, **kwargs)
    if name == "lion":
        kwargs.setdefault("b1", 0.9)
        kwargs.setdefault("b2", 0.99)
        kwargs.setdefault("weight_decay", 0.0)  # lion_pytorch default
        return optax.lion(learning_rate=lr_schedule, **kwargs)
    if name == "lion8bit":
        from leco_tpu.train.quant8 import lion8bit

        return lion8bit(learning_rate=lr_schedule, **kwargs)
    if name == "prodigy":
        return optax.contrib.prodigy(learning_rate=lr_schedule, **kwargs)

    raise ValueError("Optimizer must be adam, adamw, lion or Prodigy")
