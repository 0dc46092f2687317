"""Fused GroupNorm(+time-emb)+SiLU+3x3-conv Pallas kernel — the
"padded-domain resnet" (docs/ROADMAP.md round-2 perf item; VERDICT round-2
next-step 1).

The SD UNet resnet half-block is `conv3x3(silu(groupnorm(x [+ temb])))`
(diffusers ResnetBlock2D; reference consumes it via the torch UNet,
train_lora.py). On v5e the round-2 attribution table (docs/DESIGN.md) put
the resnet convs at 71-74% of their attainable floor and the GN normalize
passes at 29% — together ~2 ms of reachable slack per forward. The round-2
standalone Pallas conv (ops/conv.py) reached per-conv parity with XLA but
paid ~2.3 ms/fwd in pad/reshape/slice boundary ops, and its weights had to
fit VMEM whole, so it never covered the concat-widened up-block conv1s at
all.

This kernel removes both problems:

  * the GroupNorm is collapsed OUTSIDE the kernel into a per-(batch,
    channel) affine: group statistics come from one fp32-accumulated
    channel-sum pass (the round-2 "sum-GN" trick), and the SD resnet's
    `h + temb[:, None, None, :]`折叠 analytically into the SAME affine
    (E[(x+t)^2] = E[x^2] + 2tE[x] + t^2 — per-channel scalars), so the
    temb-add never touches HBM;
  * the kernel applies `silu(a*x + b)` to its input slab in VMEM (fp32,
    one VPU pass over data already fetched for the conv), builds the
    zero-padded convolution domain in VMEM (the input stays in the natural
    NHWC layout except for a cheap H-only pad), and accumulates the 9
    implicit-GEMM taps on the MXU;
  * the input-channel dimension is gridded, so arbitrarily wide inputs
    (up-block conv1 reads 1920/2560 channels after skip concat) stream
    through VMEM-sized weight blocks instead of falling back to XLA.

Backward: custom_vjp recomputes through the XLA reference composition —
only the single differentiated target pass pays it (SURVEY.md call stack:
the inner denoise and the 3 reference predictions are forward-only).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024


def _interpret() -> bool:
    return os.environ.get("LECO_GNCONV_INTERPRET") == "1"


def enabled() -> bool:
    """Fused resnet path knob (LECO_RESNET_FUSED=1). Opt-in until the
    on-chip A/B lands; docs/DESIGN.md records the measurement that decides
    the default."""
    return os.environ.get("LECO_RESNET_FUSED", "0") == "1"


# ---------------------------------------------------------------------------
# block-size search
# ---------------------------------------------------------------------------


def _vmem_bytes(bh, w, cb, cout, itemsize):
    xblk = 2 * (bh + 3) * w * cb * itemsize  # double-buffered input block
    pad = (bh + 3) * (w + 2) * cb * itemsize  # scratch padded domain
    acc = bh * (w + 2) * cout * 4
    out = 2 * bh * w * cout * itemsize
    wts = 2 * 9 * cb * cout * itemsize  # double-buffered weight block
    return xblk + pad + acc + out + wts + 256 * 1024


def _pick_blocks(h, w, cin, cout, itemsize):
    """(bh, c_blk) maximizing MXU M-occupancy under the VMEM budget.
    Returns None if nothing fits (caller falls back to XLA)."""
    best = None
    c_divs = [d for d in (cin, 2560, 1920, 1280, 960, 640, 512, 384, 320,
                          256, 128) if d <= cin and cin % d == 0]
    for bh in range(min(h, 64), 0, -1):
        if h % bh:
            continue
        m = bh * (w + 2)
        eff = m / (-(-m // 128) * 128)
        for cb in c_divs:
            if _vmem_bytes(bh, w, cb, cout, itemsize) > _VMEM_BUDGET:
                continue
            # fewer channel chunks = fewer acc revisits; prefer large cb
            score = (eff, cb, bh)
            if best is None or score > best[0]:
                best = (score, bh, cb)
            break  # c_divs sorted desc: first fit is the largest
    return None if best is None else (best[1], best[2])


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _gnconv_kernel(
    x_ref,  # (1, bh+3, W, cb)   H-padded natural-layout input slab
    a_ref,  # (1, 1, cb) f32     per-(batch, channel) GN affine scale
    s_ref,  # (1, 1, cb) f32     per-(batch, channel) GN affine shift
    w_ref,  # (9, cb, Cout)      tap-major conv weights
    b_ref,  # (1, Cout) f32      conv bias
    o_ref,  # (1, bh, W, Cout)
    pad_ref,  # scratch (bh+3, W+2, cb) input dtype
    acc_ref,  # scratch (bh*(W+2), Cout) f32
    *,
    bh: int,
    w: int,
    h: int,
    nc: int,
    with_silu: bool,
):
    ih = pl.program_id(1)
    ic = pl.program_id(2)

    # activation epilogue of the producing GroupNorm, applied to the slab
    # already in VMEM: y = silu(a*x + b) in fp32, zeroed outside the valid
    # image rows (padded row index ih*bh + r maps to image row -1 at r=0)
    xf = x_ref[0].astype(jnp.float32)
    y = xf * a_ref[0, 0] + s_ref[0, 0]
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    row = lax.broadcasted_iota(jnp.int32, (bh + 3, 1, 1), 0) + ih * bh
    valid = (row >= 1) & (row <= h)
    y = jnp.where(valid, y, 0.0).astype(pad_ref.dtype)
    pad_ref[:, 1 : w + 1, :] = y
    pad_ref[:, 0:1, :] = jnp.zeros_like(pad_ref[:, 0:1, :])
    pad_ref[:, w + 1 : w + 2, :] = jnp.zeros_like(pad_ref[:, 0:1, :])

    flat = pad_ref[...].reshape((bh + 3) * (w + 2), pad_ref.shape[-1])
    bm = bh * (w + 2)

    @pl.when(ic == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for dy in range(3):
        for dx in range(3):
            off = dy * (w + 2) + dx
            acc_ref[...] += jax.lax.dot(
                flat[off : off + bm, :],
                w_ref[dy * 3 + dx],
                preferred_element_type=jnp.float32,
            )

    @pl.when(ic == nc - 1)
    def _done():
        out = acc_ref[...] + b_ref[...]
        out = out.reshape(bh, w + 2, -1)[:, :w, :]
        o_ref[0] = out.astype(o_ref.dtype)


def _gnconv_call(xp, a, s, wf, bias, *, h, w, cout, bh, cb, with_silu):
    """xp: (B, H+3, W, Cin) H-padded input (1 top + 2 bottom pad rows);
    a/s: (B, 1, Cin) f32 affine; wf: (9, Cin, Cout); bias: (1, Cout) f32."""
    b, hp, _, cin = xp.shape
    nh = h // bh
    nc = cin // cb
    E = pl.Element
    return pl.pallas_call(
        functools.partial(
            _gnconv_kernel, bh=bh, w=w, h=h, nc=nc, with_silu=with_silu
        ),
        grid=(b, nh, nc),
        in_specs=[
            pl.BlockSpec(
                (E(1), E(bh + 3), E(w), E(cb)),
                lambda bi, ih, ic: (bi, ih * bh, 0, ic * cb),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (E(1), E(1), E(cb)),
                lambda bi, ih, ic: (bi, 0, ic * cb),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (E(1), E(1), E(cb)),
                lambda bi, ih, ic: (bi, 0, ic * cb),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (E(9), E(cb), E(cout)),
                lambda bi, ih, ic: (0, ic * cb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (E(1), E(cout)), lambda bi, ih, ic: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (E(1), E(bh), E(w), E(cout)),
            lambda bi, ih, ic: (bi, ih * bh, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM(((bh + 3), w + 2, cb), xp.dtype),
            pltpu.VMEM((bh * (w + 2), cout), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (w + 2) * 9 * cin * cout,
            bytes_accessed=(xp.size + wf.size + b * h * w * cout)
            * xp.dtype.itemsize,
            transcendentals=xp.size,
        ),
        interpret=_interpret(),
    )(xp, a, s, wf, bias)


# ---------------------------------------------------------------------------
# stats + affine (XLA side)
# ---------------------------------------------------------------------------


def affine_from_gn(x, gn_scale, gn_bias, temb, num_groups, eps):
    """Public, differentiable: per-(batch, channel) affine (a, s) with
    a*x + s == groupnorm(x + temb[:, None, None, :]) * gn_scale + gn_bias.
    Plain XLA ops — gradients w.r.t. x flow through the statistics exactly
    as in the unfused composition."""
    return _gn_affine(x, gn_scale, gn_bias, temb, num_groups, eps)


def apply_affine_silu(x, a, s, with_silu=True):
    """XLA fallback epilogue: silu(a*x + s) in fp32, cast back. Used when
    the Pallas path is unavailable (LoRA'd convs, unsupported shapes,
    non-TPU) so the fused-resnet control flow stays uniform."""
    y = x.astype(jnp.float32) * a[:, None, None, :] + s[:, None, None, :]
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _gn_affine(x, gn_scale, gn_bias, temb, num_groups, eps):
    """Per-(batch, channel) affine (a, s) such that
    a*x + s == groupnorm(x + temb_broadcast) * gn_scale + gn_bias.

    Stats ride one fp32-accumulated channel-sum pass over x (the "sum-GN"
    layout trick, ops/group_norm.py); temb enters analytically:
    mean' = mean + E_g[t], E'[x^2] = E[x^2] + 2 E_g[t*x...] — exactly, via
    the per-channel sums, since t is constant over (H, W)."""
    b, h, w, c = x.shape
    cg = c // num_groups
    f32 = jnp.float32
    n = h * w * cg
    s1c = jnp.sum(x, axis=(1, 2), dtype=f32)  # (B, C)
    s2c = jnp.sum(x * x, axis=(1, 2), dtype=f32)
    t = temb.astype(f32)  # (B, C)
    # sums of (x + t) over the group: zeros of the pad never enter (sums
    # are over the unpadded x), and t adds h*w per pixel
    s1c = s1c + h * w * t
    s2c = s2c + 2.0 * t * (s1c - h * w * t) + h * w * t * t
    s1 = s1c.reshape(b, num_groups, cg).sum(-1)  # (B, G)
    s2 = s2c.reshape(b, num_groups, cg).sum(-1)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    inv = lax.rsqrt(var + eps)  # (B, G)
    expand = lambda v: jnp.repeat(v, cg, axis=-1)  # (B, C)
    a = gn_scale.astype(f32)[None, :] * expand(inv)
    s = (
        gn_bias.astype(f32)[None, :]
        + (t - expand(mean)) * a
    )
    return a, s


def _conv_reference(x, a, s, kernel, bias, with_silu):
    """Pure-XLA composition of the kernel's exact math (backward +
    fallback + tests): conv3x3(silu(a*x + s)) + bias."""
    y = apply_affine_silu(x, a, s, with_silu)
    out = lax.conv_general_dilated(
        y,
        kernel.astype(x.dtype),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias.astype(x.dtype)


def _reference(x, gn_scale, gn_bias, temb, kernel, bias, num_groups, eps,
               with_silu):
    """Full unfused composition (tests): groupnorm -> silu -> conv."""
    xt = x + temb.astype(x.dtype)[:, None, None, :]
    from leco_tpu.ops.group_norm import group_norm_silu_sum

    y = group_norm_silu_sum(
        xt, gn_scale, gn_bias, num_groups, eps, with_silu=with_silu
    )
    out = lax.conv_general_dilated(
        y,
        kernel.astype(x.dtype),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias.astype(x.dtype)


def supports(shape, cout, dtype) -> bool:
    """Hot-shape gate: SD's resnet convs are >= 128-channel (320/640/1280
    and the concat-widened sums); thin shapes (conv_in etc.) stay on XLA."""
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    if h < 4 or w < 4 or c < 128 or cout < 128:
        return False
    return _pick_blocks(h, w, c, cout, jnp.dtype(dtype).itemsize) is not None


def _fwd_impl(x, a, s, kernel, bias, with_silu):
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    blocks = _pick_blocks(h, w, cin, cout, x.dtype.itemsize)
    if blocks is None:
        return _conv_reference(x, a, s, kernel, bias, with_silu)
    bh, cb = blocks
    xp = jnp.pad(x, ((0, 0), (1, 2), (0, 0), (0, 0)))
    wf = kernel.astype(x.dtype).reshape(9, cin, cout)
    bf = bias.reshape(1, cout).astype(jnp.float32)
    return _gnconv_call(
        xp,
        a[:, None, :],
        s[:, None, :],
        wf,
        bf,
        h=h,
        w=w,
        cout=cout,
        bh=bh,
        cb=cb,
        with_silu=with_silu,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def affine_silu_conv(x, a, s, kernel, bias, with_silu=True):
    """conv3x3_s1_p1(silu(a*x + s)) + bias on the fused Pallas kernel.

    x: (B, H, W, Cin) natural layout; a/s: (B, Cin) fp32 per-channel affine
    (from affine_from_gn — GN and the resnet temb-add collapse into it);
    kernel: (3, 3, Cin, Cout) HWIO. Returns (B, H, W, Cout) in x.dtype.
    Compose gradients by computing (a, s) with differentiable XLA ops: the
    chain rule routes d/dx through both the data path (this op's VJP) and
    the statistics path (autodiff of affine_from_gn)."""
    return _fwd_impl(x, a, s, kernel, bias, with_silu)


def _vjp_fwd(x, a, s, kernel, bias, with_silu):
    return _fwd_impl(x, a, s, kernel, bias, with_silu), (x, a, s, kernel, bias)


def _vjp_bwd(with_silu, residuals, g):
    x, a, s, kernel, bias = residuals
    _, vjp = jax.vjp(
        lambda *args: _conv_reference(*args, with_silu), x, a, s, kernel, bias
    )
    return vjp(g)


affine_silu_conv.defvjp(_vjp_fwd, _vjp_bwd)
