"""Fused GroupNorm(+SiLU) Pallas kernel.

Profiling the SD1.5 UNet forward on v5e shows the fp32 GroupNorm statistic
fusions plus the layout copies they induce cost ~15% of the step. This
kernel computes the statistics in fp32 on-chip and writes the normalized
(optionally SiLU'd) bf16 output in a single HBM pass.

Grid: one program per batch item; the full (H, W, C) activation block lives
in VMEM (largest SD block: 96x96x320 bf16 = 5.9 MB). Falls back to the XLA
path (leco_tpu.models.unet._group_norm semantics) for shapes that don't fit
or on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups, eps, with_silu,
               row_chunk):
    # Two constraints shape this kernel:
    #  * Mosaic cannot split the lane (channel) dim, so group statistics are
    #    aggregated via a (C, G) membership matmul, not a (..., G, C/G)
    #    reshape;
    #  * fp32 temporaries of the whole block would blow VMEM at the largest
    #    SD shapes, so both passes run in row chunks.
    h, w, c = x_ref.shape[1:]
    cg = c // num_groups
    n = h * w * cg
    n_chunks = h // row_chunk

    def stat_body(i, acc):
        s, sq = acc
        chunk = x_ref[0, pl.ds(i * row_chunk, row_chunk), :, :]
        xf = chunk.reshape(row_chunk * w, c).astype(jnp.float32)
        return (
            s + jnp.sum(xf, axis=0, keepdims=True),
            sq + jnp.sum(xf * xf, axis=0, keepdims=True),
        )

    zeros = jnp.zeros((1, c), jnp.float32)
    s, sq = jax.lax.fori_loop(0, n_chunks, stat_body, (zeros, zeros))

    chan = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    member = (chan // cg == grp).astype(jnp.float32)  # (C, G)

    mean_g = jnp.dot(s, member, preferred_element_type=jnp.float32) / n
    sq_g = jnp.dot(sq, member, preferred_element_type=jnp.float32) / n
    var_g = sq_g - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)

    mean_c = jnp.dot(mean_g, member.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, member.T, preferred_element_type=jnp.float32)
    scale = scale_ref[:].astype(jnp.float32) * inv_c[0]
    shift = bias_ref[:].astype(jnp.float32) - mean_c[0] * scale

    def apply_body(i, _):
        chunk = x_ref[0, pl.ds(i * row_chunk, row_chunk), :, :]
        y = chunk.astype(jnp.float32) * scale + shift
        if with_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * row_chunk, row_chunk), :, :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, apply_body, 0)


def _row_chunk(h: int) -> int:
    for ch in (8, 4, 2, 1):
        if h % ch == 0:
            return ch
    return 1


def supports(shape, dtype) -> bool:
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    if c % 8 != 0:
        return False
    # in + out blocks, double-buffered by the pipeline, + chunk temporaries
    per_item = 4 * h * w * c * jnp.dtype(dtype).itemsize + 2 * 1024 * 1024
    return per_item <= _VMEM_BUDGET_BYTES


def group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float,
    with_silu: bool = True,
) -> jnp.ndarray:
    """x: (B, H, W, C) -> same shape/dtype; stats in fp32 per (batch, group)."""
    b, h, w, c = x.shape
    return pl.pallas_call(
        functools.partial(
            _gn_kernel,
            num_groups=num_groups,
            eps=eps,
            with_silu=with_silu,
            row_chunk=_row_chunk(h),
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * x.size,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=x.size if with_silu else 0,
        ),
    )(x, scale, bias)


def group_norm_silu_ref(x, scale, bias, num_groups, eps, with_silu=True):
    """XLA reference implementation (identical math, for fallback/tests)."""
    b, h, w, c = x.shape
    cg = c // num_groups
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, cg)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def group_norm_silu_mxu(x, scale, bias, num_groups, eps, with_silu=True):
    """Bandwidth-lean GroupNorm in the NATURAL channels-last layout.

    XLA's lowering of the fp32-reference form materializes an f32 upcast of
    x (~16 bytes/element vs the 6-byte minimum; measured 28% of the BW
    roofline, docs/DESIGN.md). Here the group sums ride the MXU instead:
    s1 = x @ M and s2 = (x*x) @ M with a (C, G) one-hot membership matrix,
    fp32 accumulation, NO reshape of x (the earlier (b,hw,G,cg) reshape
    variant broke layout propagation and measured 12x slower end-to-end).
    The normalize+affine+silu is then one fused elementwise pass.

    Precision: sums accumulate in fp32; the x*x operand rounds each square
    to bf16 (~2^-9 relative), which averages out over the ~160k elements
    per group — and var uses the E[x^2]-mu^2 form in fp32. Both effects sit
    below bf16 output resolution; tests pin the tolerance vs the fp32
    reference."""
    b, h, w, c = x.shape
    cg = c // num_groups
    f32 = jnp.float32
    member = (
        jnp.arange(c)[:, None] // cg == jnp.arange(num_groups)[None, :]
    ).astype(x.dtype)
    x2 = x.reshape(b, h * w, c)
    s1 = jnp.einsum("bnc,cg->bg", x2, member, preferred_element_type=f32)
    s2 = jnp.einsum(
        "bnc,cg->bg", x2 * x2, member, preferred_element_type=f32
    )
    n = h * w * cg
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)  # (b, g)
    expand = lambda v: jnp.repeat(v, cg, axis=-1)[:, None, None, :]  # (b,1,1,c)
    eff_scale = scale.astype(f32)[None, None, None, :] * expand(inv)
    eff_shift = bias.astype(f32)[None, None, None, :] - expand(mean) * eff_scale
    y = x.astype(f32) * eff_scale + eff_shift
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def group_norm_silu_sum(x, scale, bias, num_groups, eps, with_silu=True):
    """Bandwidth-lean GroupNorm via plain spatial reductions.

    Stats in two steps that never disturb the (b,h,w,c) layout: (1) fp32-
    accumulated sums of x and x*x over (h, w) -> (b, c) — XLA fuses both
    into one read pass; (2) group-sum the TINY (b, c) arrays by a (b, G,
    cg) reshape. The normalize+affine+silu is one fused elementwise pass
    with (b, 1, 1, c) broadcasts. 6 bytes/element total vs ~16 for the
    fp32-upcast reference lowering. The x*x operand rounds each square to
    the input dtype (~2^-9 relative for bf16), averaging out over the
    ~160k elements per group — below output resolution."""
    b, h, w, c = x.shape
    cg = c // num_groups
    f32 = jnp.float32
    s1c = jnp.sum(x, axis=(1, 2), dtype=f32)  # (b, c)
    s2c = jnp.sum(x * x, axis=(1, 2), dtype=f32)
    s1 = s1c.reshape(b, num_groups, cg).sum(-1)  # (b, G)
    s2 = s2c.reshape(b, num_groups, cg).sum(-1)
    n = h * w * cg
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    expand = lambda v: jnp.repeat(v, cg, axis=-1)[:, None, None, :]
    eff_scale = scale.astype(f32)[None, None, None, :] * expand(inv)
    eff_shift = bias.astype(f32)[None, None, None, :] - expand(mean) * eff_scale
    y = x.astype(f32) * eff_scale + eff_shift
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def group_norm_silu_fast(x, scale, bias, num_groups, eps, with_silu=True):
    """Bandwidth-lean XLA variant: statistics via f32-ACCUMULATED reductions
    (no materialized f32 copy of the activation), elementwise normalize in
    the input dtype with a pre-folded per-channel scale/shift. For bf16
    activations the result differs from the fp32 reference only by bf16
    rounding of O(1) values."""
    b, h, w, c = x.shape
    cg = c // num_groups
    x4 = x.reshape(b, h * w, num_groups, cg)
    mean = jnp.mean(x4, axis=(1, 3), keepdims=True, dtype=jnp.float32)
    sq = jnp.mean(
        jnp.square(x4.astype(jnp.float32)), axis=(1, 3), keepdims=True,
        dtype=jnp.float32,
    )
    var = sq - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)  # (b, 1, G, 1)
    # fold into per-(batch, channel) scale/shift, then one bf16 elementwise op
    inv_c = jnp.broadcast_to(inv, (b, 1, num_groups, cg)).reshape(b, 1, 1, c)
    mean_c = jnp.broadcast_to(mean, (b, 1, num_groups, cg)).reshape(b, 1, 1, c)
    eff_scale = scale.astype(jnp.float32) * inv_c
    eff_shift = bias.astype(jnp.float32) - mean_c * eff_scale
    y = x.astype(jnp.float32) * eff_scale + eff_shift
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm(x, scale, bias, num_groups, eps, with_silu):
    return group_norm_silu(x, scale, bias, num_groups, eps, with_silu)


def _fgn_fwd(x, scale, bias, num_groups, eps, with_silu):
    return group_norm_silu(x, scale, bias, num_groups, eps, with_silu), (
        x,
        scale,
        bias,
    )


def _fgn_bwd(num_groups, eps, with_silu, residuals, g):
    # backward via the XLA reference (recompute); only the single
    # differentiated target pass pays this, the forward-only passes use the
    # fused kernel alone
    x, scale, bias = residuals
    _, vjp = jax.vjp(
        lambda x_, s_, b_: group_norm_silu_ref(
            x_, s_, b_, num_groups, eps, with_silu
        ),
        x,
        scale,
        bias,
    )
    return vjp(g)


fused_group_norm.defvjp(_fgn_fwd, _fgn_bwd)


import os

import flax.linen as nn

# Default OFF: measured end-to-end on v5e the kernel LOSES to XLA's fused
# GroupNorm chains (1.40 vs 1.81 it/s on the SD1.5 bench) — the serial
# row-chunk loops underutilize the VPU vs XLA's wide fusions. Kept as an
# opt-in (LECO_TPU_FUSED_GN=1) and as the base for future fusion work.
_FUSED_GN_ENABLED = os.environ.get("LECO_TPU_FUSED_GN", "0") == "1"
# measured 1.59 vs 1.62 it/s on the SD1.5 bench in round 1 and a
# pathological 0.144 it/s in the round-2 fusion context ((b,hw,G,cg)
# reshapes break layout propagation) — permanently opt-in-only
_FAST_GN_ENABLED = os.environ.get("LECO_TPU_FAST_GN", "0") == "1"
# GroupNorm backend (LECO_TPU_GN): "sum" (default for bf16) computes the
# stats by fp32 spatial reductions in the natural layout — measured 2.03 ->
# 2.08 it/s on the SD1.5 bench vs the fp32-upcast reference lowering
# ("ref", which materializes an f32 copy of x). "mxu" (one-hot-matmul
# stats) measured pathologically slow (0.055 it/s) — kept only as a
# negative-result artifact. f32 inputs always use "ref".
_GN_BACKEND = os.environ.get("LECO_TPU_GN", "sum")


class FusedGroupNorm(nn.Module):
    """GroupNorm (+ optional fused SiLU). Params named scale/bias like
    nn.GroupNorm, so checkpoint conversion and LoRA export are unaffected.
    Uses the Pallas kernel on TPU when the block fits VMEM; the XLA
    reference implementation (fp32 stats) otherwise."""

    num_groups: int
    eps: float = 1e-5
    with_silu: bool = False

    @nn.compact
    def __call__(self, x, affine_only: bool = False, temb=None):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if affine_only:
            # fused-resnet path (ops/gn_conv.py): return the per-(batch,
            # channel) affine equivalent of this GroupNorm (+ optional
            # folded time-embedding bias); the consuming conv applies the
            # silu epilogue in its own kernel
            from leco_tpu.ops import gn_conv

            t = (
                jnp.zeros((x.shape[0], c), jnp.float32)
                if temb is None
                else temb.astype(jnp.float32)
            )
            return gn_conv.affine_from_gn(
                x, scale, bias, t, self.num_groups, self.eps
            )
        use_kernel = (
            _FUSED_GN_ENABLED
            and jax.default_backend() == "tpu"
            and supports(x.shape, x.dtype)
        )
        if use_kernel:
            return fused_group_norm(
                x, scale, bias, self.num_groups, self.eps, self.with_silu
            )
        if _FAST_GN_ENABLED and x.dtype == jnp.bfloat16:
            return group_norm_silu_fast(
                x, scale, bias, self.num_groups, self.eps, self.with_silu
            )
        if _GN_BACKEND == "mxu" and x.dtype == jnp.bfloat16:
            return group_norm_silu_mxu(
                x, scale, bias, self.num_groups, self.eps, self.with_silu
            )
        if _GN_BACKEND == "sum" and x.dtype == jnp.bfloat16:
            return group_norm_silu_sum(
                x, scale, bias, self.num_groups, self.eps, self.with_silu
            )
        return group_norm_silu_ref(
            x, scale, bias, self.num_groups, self.eps, self.with_silu
        )
