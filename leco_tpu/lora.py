"""LoRA as a functional parameter-tree overlay — the TPU-native redesign of
the reference's forward-hook injection (lora.py in p1atdev/LECO).

Design (SURVEY.md section 7, step 5): instead of monkey-patching module
forwards (reference lora.py:97-106), every targetable Dense/Conv layer in the
Flax UNet is a `LoRADense`/`LoRAConv`. When its path matches the `LoRASpec`
(network type + training method), `init` creates `lora_down`/`lora_up`
parameters *next to* the base kernel; `apply` adds
`(x @ down) @ up * (alpha/rank)` in activation space — mathematically the
reference's `org_forward(x) + lora_up(lora_down(x)) * multiplier * scale`.

The reference's `with network:` multiplier toggle (lora.py:231-237) becomes
pure pytree manipulation:
  * LoRA OFF  -> apply with the base subtree only (the layer detects the
    absent `lora_down` and skips the branch — zero overhead, exactly the
    base model).
  * LoRA ON   -> apply with base|lora merged.
  * arbitrary multiplier (A1111 AddNet weight -1..1) -> scale the `lora_up`
    leaves (the contribution is linear in `up`), see `scale_lora_tree`.

Targeting parity with the reference:
  * lierla: every Linear/Conv2d inside a Transformer2DModel
    (path contains `attentions_<i>`)   [lora.py:15-17, 188-190]
  * c3lier: + ResnetBlock2D / Downsample2D / Upsample2D subtrees
    (`resnets_<i>` / `downsamplers_0` / `upsamplers_0`)  [lora.py:18-22]
  * training_method name filters (lora.py:169-187) are applied to the FULL
    layer path. NOTE: the reference applies them to the *block* name, which
    never contains "attn1"/"attn2", so its `selfattn`/`xattn` methods
    silently create 0 modules; this rebuild implements the intended
    semantics (see docs/QUIRKS.md).
  * conv rank clamped to min(rank, in, out) (lora.py:72); stored alpha falls
    back to the *unclamped* rank when alpha is 0/None (lora.py:86), and
    scale = stored_alpha / clamped_rank (lora.py:87).
  * init: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    on down, zeros on up (lora.py:91-92).

Export (`save_lora_weights`) writes the A1111-AddNet/kohya-compatible
safetensors layout: `lora_unet_<path>.{lora_down.weight, lora_up.weight,
alpha}` in torch tensor layout (lora.py:212-229).
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import re
from typing import Any, Literal, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict
from jax import lax

TRAINING_METHODS = Literal["noxattn", "innoxattn", "selfattn", "xattn", "full"]

LORA_PREFIX_UNET = "lora_unet"

_TRANSFORMER_RE = re.compile(r"attentions_\d+$")
_CONV_BLOCK_RE = re.compile(r"(resnets_\d+|downsamplers_0|upsamplers_0)$")


@dataclasses.dataclass(frozen=True)
class LoRASpec:
    """Static LoRA network description (hashable — used as a module attr)."""

    rank: int = 4
    alpha: float = 1.0
    network_type: str = "lierla"  # or "c3lier"
    train_method: str = "full"

    @property
    def stored_alpha(self) -> float:
        """alpha falls back to the (unclamped) rank when 0/None
        (reference lora.py:86)."""
        return self.alpha if self.alpha else float(self.rank)

    def matches(self, path: tuple[str, ...]) -> bool:
        """Is the Dense/Conv layer at `path` a LoRA target?"""
        name = "_".join(path)
        m = self.train_method
        if m == "noxattn":
            if "attn2" in name or "time_embed" in name:
                return False
        elif m == "innoxattn":
            if "attn2" in name:
                return False
        elif m == "selfattn":
            if "attn1" not in name:
                return False
        elif m == "xattn":
            if "attn2" not in name:
                return False
        elif m != "full":
            raise NotImplementedError(f"train_method: {m} is not implemented.")

        in_transformer = any(_TRANSFORMER_RE.match(p) for p in path)
        if self.network_type == "lierla":
            return in_transformer
        if self.network_type == "c3lier":
            in_conv_block = any(_CONV_BLOCK_RE.match(p) for p in path)
            return in_transformer or in_conv_block
        raise ValueError(f"unknown network type: {self.network_type}")


def _kaiming_down_init(key, shape, dtype):
    """torch kaiming_uniform_(a=sqrt(5)): U(-b, b), b = 1/sqrt(fan_in);
    fan_in = prod(shape[:-1]) for both dense (in, r) and conv (kh,kw,in,r)."""
    fan_in = float(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


_RIDE_SUSPENDED = False


@contextlib.contextmanager
def ride_along_suspended():
    """Disable the concat-GEMM fusion for code traced inside this scope.

    The DIFFERENTIATED pass must not ride: autodiff of `x @ concat(W, down)`
    materializes the cotangent GEMM at the FULL concatenated width
    (in, out+r) before slicing out the r lora columns — wasted bwd FLOPs
    single-chip, and under GSPMD the gradient all-reduce rides the full
    width too (measured in round 4's compiled-HLO extraction: 1.06 GB/chip
    per step vs ~5 MB for the true lora grads; scripts/extract_comm_hlo.py).
    The trainer wraps only the target loss_fn in this scope; the
    stop-gradient inner denoise and reference calls keep the fusion
    (measured +3% fwd, round 2)."""
    global _RIDE_SUSPENDED
    prev = _RIDE_SUSPENDED
    _RIDE_SUSPENDED = True
    try:
        yield
    finally:
        _RIDE_SUSPENDED = prev


def _lora_ride_along() -> bool:
    """Concat-GEMM LoRA fusion (LECO_LORA_FUSE=0 opts out).

    Mathematically identical (same two GEMMs), but the wider GEMM may tile/
    reassociate differently, so "fresh LoRA == base model" holds to ~1e-4
    instead of bitwise. Measured on chip: 1.78 -> 1.83 it/s on the SD1.5
    bench (the GEGLU ride path must keep the gate GEMM separate — the
    single-concat form that merges value|gate|down into one GEMM breaks
    XLA's gelu fusion and costs ~20%, measured 1.46 it/s)."""
    if _RIDE_SUSPENDED:
        return False
    return os.environ.get("LECO_LORA_FUSE", "1") == "1"


class LoRADense(nn.Module):
    """nn.Dense with an optional LoRA branch; params named `kernel`/`bias`
    plus `lora_down` (in, r) / `lora_up` (r, out) when targeted.

    `geglu=True` turns the layer into the GEGLU projection: features must be
    2*inner, the output is `value * gelu_exact(gate)` of the two projection
    halves (ops/geglu.py: XLA single-GEMM form by default, with the
    polynomial-erf exact gelu; split/fused backends via LECO_GEGLU). The
    param tree and the LoRA composition point (pre-activation, like the
    reference's patched Linear) are unchanged."""

    features: int
    use_bias: bool = True
    geglu: bool = False
    lora_spec: Optional[LoRASpec] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
            self.param_dtype,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            if self.use_bias
            else None
        )

        spec = self.lora_spec
        lora_active = (
            spec is not None
            and spec.matches(self.path)
            and (self.is_initializing() or self.has_variable("params", "lora_down"))
        )
        down = up = None
        if lora_active:
            r = spec.rank
            down = self.param(
                "lora_down", _kaiming_down_init, (in_features, r), jnp.float32
            )
            up = self.param(
                "lora_up", nn.initializers.zeros, (r, self.features), jnp.float32
            )

        # ride-along fusion: concatenate lora_down's r columns onto the base
        # kernel so x@W and x@down come out of ONE GEMM — the MXU output-lane
        # padding (e.g. 320 -> 384) absorbs the +r columns for free, and x is
        # read from HBM once instead of twice. The concat itself is loop-
        # invariant, so XLA hoists it out of the inner denoise fori_loop.
        # Identical math up to float reassociation (~1e-4 in bf16): the
        # wider concat GEMM may retile/reassociate the accumulation.
        ride = lora_active and _lora_ride_along()
        xd = None
        if ride:
            w2 = jnp.concatenate(
                [kernel.astype(self.dtype), down.astype(self.dtype)], axis=1
            )

        if self.geglu:
            from leco_tpu.ops.geglu import (
                default_geglu_backend,
                geglu_fused,
                geglu_reference,
                geglu_split,
            )

            backend = default_geglu_backend()
            up_c = None
            if lora_active:
                scale = jnp.asarray(
                    spec.stored_alpha / spec.rank, self.dtype
                )
                if ride:
                    # value-half GEMM carries the lora_down columns; the
                    # gate GEMM stays separate so its gelu*mul epilogue
                    # fuses (see ops/geglu.py default_geglu_backend)
                    n = self.features // 2
                    kd = self.dtype
                    yzv = x @ jnp.concatenate(
                        [kernel[:, :n].astype(kd), down.astype(kd)], axis=1
                    )
                    value = yzv[..., :n]
                    xd = yzv[..., n:] * scale
                    gate = x @ kernel[:, n:].astype(kd)
                    if bias is not None:
                        value = value + bias[:n].astype(kd)
                        gate = gate + bias[n:].astype(kd)
                    value = value + xd @ up[:, :n].astype(kd)
                    gate = gate + xd @ up[:, n:].astype(kd)
                    from leco_tpu.ops.geglu import gelu_exact

                    return value * gelu_exact(gate)
                xd = (x @ down.astype(self.dtype)) * scale
                up_c = up.astype(self.dtype)
            fn = {
                "fused": geglu_fused,
                "split": geglu_split,
            }.get(backend, geglu_reference)
            return fn(x, kernel.astype(self.dtype), bias, xd, up_c)

        if ride:
            yz = x @ w2
            y = yz[..., : self.features]
            xd = yz[..., self.features :]
        else:
            y = x @ kernel.astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        if lora_active:
            scale = spec.stored_alpha / spec.rank
            if xd is None:
                xd = x @ down.astype(self.dtype)
            delta = xd @ up.astype(self.dtype)
            y = y + delta * jnp.asarray(scale, self.dtype)
        return y


def upsample2x_nearest(x):
    """Nearest-neighbor x2 via broadcast (cheaper than gather-based resize)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class LoRAConv(nn.Module):
    """2D conv (NHWC/HWIO) with an optional LoRA branch: `lora_down` is a
    conv with the base kernel/stride/padding, `lora_up` a 1x1 conv
    (reference lora.py:76-82).

    `pre_upsample`: the input is to be nearest-2x-upsampled before the conv
    (diffusers Upsample2D). When the LoRA branch is inactive this runs the
    EXACT same math as upsample+conv3x3 re-indexed into four 2x2 phase convs
    at the original resolution — 16 tap-GEMMs instead of 9 at 4x pixels
    (2.25x fewer FLOPs) and no 4x-materialized intermediate. Measured win on
    the chip (docs/DESIGN.md); bit-identical up to float reassociation."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    use_bias: bool = True
    pre_upsample: bool = False
    lora_spec: Optional[LoRASpec] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def _conv(self, x, kernel, strides=None):
        # 1x1/stride-1/no-pad convs (proj_in/proj_out, conv_shortcut, the
        # 1x1 lora_down convs) lower as plain GEMMs: XLA's conv path runs
        # these at ~20-30% MFU on TPU while the identical reshaped matmul
        # rides the standard GEMM emitter (measured: transformer/proj and
        # resnet/shortcut at 29%/34% of their roofline — docs/DESIGN.md).
        st = strides or self.strides
        pad = self.padding
        if (
            kernel.shape[0] == 1
            and kernel.shape[1] == 1
            and tuple(st) == (1, 1)
            and not isinstance(pad, str)
            and tuple(map(tuple, pad)) == ((0, 0), (0, 0))
        ):
            return x @ kernel[0, 0]
        return lax.conv_general_dilated(
            x,
            kernel,
            window_strides=st,
            padding=pad if isinstance(pad, str) else list(pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def _is_hot_3x3(self, in_features: int) -> bool:
        """The Pallas implicit-GEMM kernel targets the UNet's hot stride-1
        3x3 convs; thin-channel convs (conv_in, conv_out, lora_down) and
        strided downsamplers stay on XLA."""
        if isinstance(self.padding, str):
            return False
        return (
            tuple(self.kernel_size) == (3, 3)
            and tuple(self.strides) == (1, 1)
            and tuple(map(tuple, self.padding)) == ((1, 1), (1, 1))
            and in_features >= 128
            and self.features >= 128
            and self.use_bias
        )

    def _phase_conv_up2x(self, x, kernel):
        """upsample2x_nearest followed by this 3x3/s1/p1 conv, re-indexed as
        four 2x2 phase convolutions at the ORIGINAL resolution. Output phase
        (a, b) lands at upsampled pixel (2y+a, 2x+b); collapsing the nearest-
        neighbor duplication folds tap rows {1,2} (a=0) / {0,1} (a=1) of the
        3x3 kernel together (same for columns). Identical math, 2.25x fewer
        MXU FLOPs, no 4x-materialized intermediate."""
        w = kernel
        outs = []
        for a in (0, 1):
            rows = (w[0], w[1] + w[2]) if a == 0 else (w[0] + w[1], w[2])
            ka = jnp.stack(rows)  # (2, 3, Cin, Cout)
            pad_a = (1, 0) if a == 0 else (0, 1)
            for bp in (0, 1):
                cols = (
                    (ka[:, 0], ka[:, 1] + ka[:, 2])
                    if bp == 0
                    else (ka[:, 0] + ka[:, 1], ka[:, 2])
                )
                kab = jnp.stack(cols, axis=1)  # (2, 2, Cin, Cout)
                pad_b = (1, 0) if bp == 0 else (0, 1)
                outs.append(
                    lax.conv_general_dilated(
                        x,
                        kab,
                        (1, 1),
                        (pad_a, pad_b),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                )
        z = jnp.stack(outs)  # (a*b, B, H, W, Cout)
        bsz, hh, ww, cc = outs[0].shape
        z = z.reshape(2, 2, bsz, hh, ww, cc).transpose(2, 3, 0, 4, 1, 5)
        return z.reshape(bsz, hh * 2, ww * 2, cc)

    @nn.compact
    def __call__(self, x, affine=None):
        spec = self.lora_spec
        lora_active = (
            spec is not None
            and spec.matches(self.path)
            and (self.is_initializing() or self.has_variable("params", "lora_down"))
        )
        phase_up = (
            self.pre_upsample
            and not lora_active
            and tuple(self.kernel_size) == (3, 3)
            and tuple(self.strides) == (1, 1)
        )
        if self.pre_upsample and not phase_up:
            # LoRA targets this conv (c3lier): the rank-r branch needs the
            # real upsampled input, so keep the materialized form
            x = upsample2x_nearest(x)

        in_features = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_features, self.features),
            self.param_dtype,
        )
        from leco_tpu.ops.conv import conv3x3, default_conv_backend

        if affine is not None:
            # fused-resnet path: `affine` is the (a, s) per-(batch, channel)
            # equivalent of the producing GroupNorm (+ folded temb); this
            # conv owns the silu epilogue. The Pallas kernel handles the hot
            # 3x3 shapes; LoRA'd convs (c3lier) and unsupported shapes fall
            # back to an XLA epilogue + the normal conv path below, which
            # is the identical math on the materialized activation.
            from leco_tpu.ops import gn_conv

            a, s = affine
            if (
                not lora_active
                and self._is_hot_3x3(in_features)
                and gn_conv.supports(x.shape, self.features, x.dtype)
            ):
                bias = self.param(
                    "bias", nn.initializers.zeros, (self.features,),
                    self.param_dtype,
                )
                return gn_conv.affine_silu_conv(
                    x, a, s, kernel.astype(self.dtype),
                    bias.astype(jnp.float32),
                )
            x = gn_conv.apply_affine_silu(x, a, s)

        if phase_up:
            y = self._phase_conv_up2x(x, kernel.astype(self.dtype))
            if self.use_bias:
                bias = self.param(
                    "bias", nn.initializers.zeros, (self.features,), self.param_dtype
                )
                y = y + bias.astype(self.dtype)
        elif default_conv_backend() == "gemm" and self._is_hot_3x3(in_features):
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = conv3x3(x, kernel.astype(self.dtype), bias.astype(jnp.float32))
        else:
            y = self._conv(x, kernel.astype(self.dtype))
            if self.use_bias:
                bias = self.param(
                    "bias", nn.initializers.zeros, (self.features,), self.param_dtype
                )
                y = y + bias.astype(self.dtype)

        if spec is not None and spec.matches(self.path):
            if self.is_initializing() or self.has_variable("params", "lora_down"):
                r = min(spec.rank, in_features, self.features)  # lora.py:72
                down = self.param(
                    "lora_down",
                    _kaiming_down_init,
                    (kh, kw, in_features, r),
                    jnp.float32,
                )
                up = self.param(
                    "lora_up", nn.initializers.zeros, (r, self.features), jnp.float32
                )
                scale = spec.stored_alpha / r  # lora.py:86-87
                h = self._conv(x, down.astype(self.dtype))
                delta = jnp.einsum("bhwr,ro->bhwo", h, up.astype(self.dtype))
                y = y + delta * jnp.asarray(scale, self.dtype)
        return y


# ---------------------------------------------------------------------------
# Pytree surgery
# ---------------------------------------------------------------------------


def split_lora_params(params) -> tuple[dict, dict]:
    """Full init tree -> (base, lora) by leaf name."""
    flat = flatten_dict(params)
    base = {k: v for k, v in flat.items() if not k[-1].startswith("lora_")}
    lora = {k: v for k, v in flat.items() if k[-1].startswith("lora_")}
    return unflatten_dict(base), unflatten_dict(lora)


def merge_params(base, lora) -> dict:
    """(base, lora) -> one apply-able tree. Cheap: dict-level merge."""
    flat = dict(flatten_dict(base))
    flat.update(flatten_dict(lora))
    return unflatten_dict(flat)


def fold_lora_params(base, lora, spec: LoRASpec) -> dict:
    """(base, lora) -> a base-SHAPED tree with every targeted kernel
    replaced by W + compose(down, up) * (alpha / r) — the exact merge a
    consumer (A1111 AddNet) performs, proven equivalent to the branch form
    by tests/test_lora.py::TestConsumerSemantics.

    Used for the inner-denoise loop of the train step: the loop reuses the
    SAME LoRA params for every one of its ~t_to UNet calls and sits under
    stop_gradient, so folding once per iteration removes all rank-r GEMMs
    from the hot path at zero semantic cost (float reassociation only:
    W+delta rounds to the param dtype once instead of adding bf16
    activations). Conv LoRA composes linearly:
    conv(x, down) @1x1 up == conv(x, einsum('hwir,ro->hwio', down, up))."""
    flat = dict(flatten_dict(base))
    lflat = flatten_dict(lora)
    # sorted: a raw set comprehension iterates in PYTHONHASHSEED-dependent
    # order, which reorders the fold ops in the traced step, perturbs the
    # serialized HLO, and made the persistent compilation cache MISS for
    # every new process (the round-2 "714 s warm start" mystery — each run
    # silently recompiled the whole step for ~7-13 min)
    for path in sorted({k[:-1] for k in lflat}):
        down = lflat[path + ("lora_down",)]
        up = lflat[path + ("lora_up",)]
        kkey = path + ("kernel",)
        w = flat[kkey]
        r = down.shape[-1]
        scale = spec.stored_alpha / r  # conv r may be clamped (lora.py:72)
        if down.ndim == 4:
            delta = jnp.einsum("hwir,ro->hwio", down, up)
        else:
            delta = down @ up
        flat[kkey] = (
            w.astype(jnp.float32) + delta.astype(jnp.float32) * scale
        ).astype(w.dtype)
    return unflatten_dict(flat)


def compose_lora_params(base, loras, spec: LoRASpec) -> dict:
    """Fold SEVERAL LoRAs into one base-shaped tree — the multi-AddNet
    composition A1111 performs when more than one LoRA is active at once
    (each slider gets its own weight). `loras` is a list of
    (lora_tree, multiplier) pairs; deltas are additive so the sequential
    fold W + m1*d1 + m2*d2 + ... is exact regardless of order.

    Trees loaded from files with differing alphas must have been loaded via
    `load_lora_weights(..., spec=spec)`, which rescales `lora_up` so every
    tree is on this spec's alpha/rank scale."""
    out = base
    for tree, multiplier in loras:
        if multiplier == 0.0:
            continue
        out = fold_lora_params(out, scale_lora_tree(tree, multiplier), spec)
    return out


def scale_lora_tree(lora, multiplier: float | jnp.ndarray):
    """Scale the LoRA contribution by `multiplier` (the reference's
    network multiplier / A1111 AddNet weight): contribution is linear in
    `lora_up`, so scaling those leaves is exact."""
    flat = flatten_dict(lora)
    out = {
        k: (v * multiplier if k[-1] == "lora_up" else v) for k, v in flat.items()
    }
    return unflatten_dict(out)


def lora_module_names(lora) -> list[str]:
    """Export-layer names in tree order: 'lora_unet_<path>' per layer.
    Asserts uniqueness — the reference's duplicate-name guard
    (lora.py:139-144); with '_'-joined paths a collision would silently
    alias two layers in the export."""
    seen: list[str] = []
    paths = {k[:-1] for k in flatten_dict(lora)}
    for k in flatten_dict(lora):
        name = LORA_PREFIX_UNET + "_" + "_".join(k[:-1])
        if name not in seen:
            seen.append(name)
    assert len(seen) == len(paths), (
        f"duplicated lora name after path join: {len(paths)} layers -> "
        f"{len(seen)} names"
    )
    return seen


def count_lora_modules(lora) -> int:
    return len(lora_module_names(lora))


# ---------------------------------------------------------------------------
# Export / import (A1111-AddNet / kohya safetensors layout)
# ---------------------------------------------------------------------------


def export_lora_state(
    lora, spec: LoRASpec, save_dtype=np.float32
) -> dict[str, np.ndarray]:
    """Flax lora tree -> {key: torch-layout array} with the reference's key
    format (lora.py:212-229): `lora_unet_<name>.lora_down.weight`,
    `.lora_up.weight`, `.alpha`."""
    # one batched device->host transfer for the whole tree: per-leaf
    # np.asarray() fetches cost a tunnel round-trip EACH (~96 leaves x
    # ~50 ms measured as ~18 s save stalls in the round-4 full-recipe run)
    flat = flatten_dict(jax.device_get(lora))
    layers: dict[tuple, dict] = {}
    for k, v in flat.items():
        layers.setdefault(k[:-1], {})[k[-1]] = np.asarray(v)

    state: dict[str, np.ndarray] = {}
    # sorted: the export must not depend on tree insertion order (a jitted
    # tree round-trip — e.g. the async-save snapshot or the EMA lerp —
    # returns dicts with sorted keys, and the file bytes should be
    # identical either way; same determinism lesson as the round-3
    # fold_lora_params cache-key fix)
    for path, tensors in sorted(layers.items()):
        name = LORA_PREFIX_UNET + "_" + "_".join(path)
        down = tensors["lora_down"]
        up = tensors["lora_up"]
        if down.ndim == 2:  # dense: (in, r) -> (r, in); (r, out) -> (out, r)
            down_t = down.T
            up_t = up.T
        else:  # conv: (kh, kw, in, r) -> (r, in, kh, kw); up -> (out, r, 1, 1)
            down_t = down.transpose(3, 2, 0, 1)
            up_t = up.T[:, :, None, None]
        # safetensors serializes the raw buffer: views must be materialized
        state[f"{name}.lora_down.weight"] = np.ascontiguousarray(
            down_t.astype(save_dtype)
        )
        state[f"{name}.lora_up.weight"] = np.ascontiguousarray(
            up_t.astype(save_dtype)
        )
        state[f"{name}.alpha"] = np.asarray(spec.stored_alpha, dtype=save_dtype)
    return state


def save_lora_weights(
    file: str | os.PathLike,
    lora,
    spec: LoRASpec,
    save_dtype=np.float32,
    metadata: Optional[dict[str, str]] = None,
) -> None:
    """safetensors (or .npz fallback for non-.safetensors extensions,
    standing in for the reference's torch.save branch)."""
    state = export_lora_state(lora, spec, save_dtype=save_dtype)
    file = os.fspath(file)
    if os.path.splitext(file)[1] == ".safetensors":
        from safetensors.numpy import save_file

        save_file(state, file, metadata=metadata)
    else:
        np.savez(file, **state)


def load_lora_weights(
    file: str | os.PathLike,
    reference_lora,
    spec: Optional[LoRASpec] = None,
) -> dict:
    """safetensors -> flax lora tree, using `reference_lora` (an init'ed
    lora tree) to resolve the flattened names back into the tree structure.

    If `spec` is given and the file's per-layer `.alpha` differs from
    `spec.stored_alpha` (e.g. a kohya LoRA trained with a different alpha),
    the `lora_up` leaves are rescaled by alpha_file / spec.stored_alpha so
    the applied contribution matches the exporter's semantics (the model
    computes scale = spec.stored_alpha / rank)."""
    from safetensors.numpy import load_file

    state = load_file(os.fspath(file))
    flat_ref = flatten_dict(reference_lora)
    by_name = {}
    for k in flat_ref:
        by_name.setdefault(LORA_PREFIX_UNET + "_" + "_".join(k[:-1]), k[:-1])

    alphas = {
        key[: -len(".alpha")]: float(np.asarray(value))
        for key, value in state.items()
        if key.endswith(".alpha")
    }

    out = {}
    for key, value in state.items():
        name, _, leaf = key.rpartition(".")
        if name.endswith(".lora_down") or name.endswith(".lora_up"):
            layer_name, _, which = name.rpartition(".")
        else:
            continue  # the ".alpha" entries were collected above
        path = by_name.get(layer_name)
        if path is None:
            raise KeyError(f"LoRA key {key} does not match any model layer")
        v = np.asarray(value, np.float32)
        if which == "lora_down":
            # torch (r, in) -> flax (in, r); torch (r, in, kh, kw) -> (kh, kw, in, r)
            v = v.T if v.ndim == 2 else v.transpose(2, 3, 1, 0)
            out[path + ("lora_down",)] = jnp.asarray(v)
        else:
            v = v.T if v.ndim == 2 else v[:, :, 0, 0].T
            if spec is not None and layer_name in alphas:
                factor = alphas[layer_name] / spec.stored_alpha
                if factor != 1.0:
                    v = v * factor
            out[path + ("lora_up",)] = jnp.asarray(v)
    return unflatten_dict(out)
