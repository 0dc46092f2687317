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
    `h + temb[:, None, None, :]` folds analytically into the SAME affine
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


_PEAK_BF16 = 197e12  # v5e MXU
_HBM_BW = 819e9
_VMEM_BW = 3.5e12  # approximate VPU<->VMEM


def _vmem_bytes(b, bh, w, cb, cob, itemsize):
    mp = (bh + 3) * (w + 2)
    bm = bh * (w + 2)
    xblk = 2 * b * (bh + 3) * w * cb * itemsize  # double-buffered input
    pad = b * mp * cb * itemsize  # flat scratch padded domain (whole batch)
    im2 = b * bm * 9 * cb * itemsize  # tap-gathered im2col slab
    acc = b * bm * cob * 4
    out = 2 * b * bh * w * cob * itemsize
    wts = 2 * 9 * cb * cob * itemsize  # double-buffered weight block
    interm = b * (bh + 3) * w * cb * 4  # f32 epilogue value (Mosaic stack)
    return xblk + pad + im2 + acc + out + wts + interm + 256 * 1024


def _pick_blocks(b, h, w, cin, cout, itemsize):
    """(bh, cb, cob) block config, or None if nothing fits the VMEM
    budget (caller falls back to XLA).

    Empirical preference from the on-chip sweep (scripts/autotune_gnconv.py,
    v5e, _TUNED below): the winner is uniformly **bh=8, cb=128,
    cob=<largest that fits>** — a small channel chunk keeps the
    double-buffered input+weight slabs light while K=9*128 is already
    MXU-deep, and a full-width accumulator minimizes revisits. The search
    tries bh nearest 8 first, then the largest cob, then the smallest cb.

    The whole batch rides in every block (one GEMM spans all images) and
    the 9 taps are gathered into an im2col VMEM slab so each channel chunk
    is a single K=9*cb GEMM (two accumulator passes per chunk instead of
    18 — the acc VMEM round-trips cost as much as the MXU time in the
    tap-by-tap variant).

    Mosaic constraints established by on-chip compile probes (round 3):
      * a PARTIAL block of the (lane) channel dim must be a 128-multiple
        (so cin is zero-padded up front, _padded_cin, and cb/cob divisors
        are restricted to 128-multiples);
      * H-dim Element offsets are unconstrained (untiled leading dim);
      * tap gathers/GEMM operands must address scratch REFS (lazy loads,
        the ops/conv.py pattern) — slicing a materialized value 9x
        allocates 9 relayout copies and blows VMEM."""
    bhs = sorted(
        (d for d in range(1, h + 1) if h % d == 0),
        key=lambda d: (d != 8, abs(d - 8)),
    )
    c_divs = sorted(d for d in range(128, cin + 1, 128) if cin % d == 0)
    # the weight block's lane dim (cout) needs the same 128-multiple
    # treatment as cin (the in-kernel (9, cb, cob) -> (9*cb, cob) flatten
    # trips window inference otherwise): pad cout up and emit a single
    # sliced chunk when cout itself is not a 128-multiple
    if cout % 128:
        co_divs = [_padded_cin(cout)]
    else:
        co_divs = sorted(
            {cout} | {d for d in range(128, cout, 128) if cout % d == 0},
            reverse=True,
        )
    for bh in bhs:
        for cob in co_divs:
            for cb in c_divs:
                if _vmem_bytes(b, bh, w, cb, cob, itemsize) <= _VMEM_BUDGET:
                    return (bh, cb, cob)
    return None


# On-chip autotune results (scripts/autotune_gnconv.py on a real v5e chip,
# device-trace timing, 2026-08-17; raw table docs/data/gnconv_tune_v5e.json).
# Key (h, w, cin, cout) -> None where the XLA composition
# (apply_affine_silu + lax.conv) beat every kernel config, else the best
# (bh, cb, cob). Measured at b=2; VMEM is re-checked at the actual batch on
# lookup. The pattern: the kernel wins the low-res levels (16x16, 8x8 —
# where XLA's conv has poor MXU occupancy and the epilogue fusion matters
# relatively more) and loses at 64x64/32x32 where XLA's native conv tiling
# is already near its floor and our im2col VMEM traffic dominates.
_TUNED = {
    (64, 64, 320, 320): None,
    (64, 64, 960, 320): None,
    (64, 64, 640, 320): None,
    (32, 32, 320, 640): None,
    (32, 32, 640, 640): None,
    (32, 32, 1920, 640): None,
    (32, 32, 960, 640): None,
    (32, 32, 1280, 640): (4, 256, 640),
    (16, 16, 640, 1280): (8, 128, 1280),
    (16, 16, 1280, 1280): (8, 128, 1280),
    (16, 16, 2560, 1280): (8, 128, 1280),
    (16, 16, 1920, 1280): (8, 128, 1280),
    (8, 8, 1280, 1280): (8, 128, 1280),
    (8, 8, 2560, 1280): (8, 128, 1280),
    (8, 8, 1920, 1280): (8, 128, 1280),
}
_MISS = object()


def _dispatch(b, h, w, cin, cout, itemsize):
    """The one place the fused-vs-XLA decision is made (supports() and
    _fwd_impl agree by construction): None -> XLA composition, else the
    (bh, cb, cob) block config."""
    cp = _padded_cin(cin)
    tuned = _TUNED.get((h, w, cin, cout), _MISS)
    if tuned is None:
        return None
    if tuned is not _MISS:
        bh, cb, cob = tuned
        if (
            h % bh == 0
            and cp % cb == 0
            and _vmem_bytes(b, bh, w, cb, cob, itemsize) <= _VMEM_BUDGET
        ):
            return tuned
    elif h > 16 or w > 16:
        # unmeasured high-res shape: extrapolate the sweep's clean split —
        # XLA wins everything above 16x16
        return None
    return _pick_blocks(b, h, w, cp, cout, itemsize)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _gnconv_kernel(
    x_ref,  # (B, bh+3, W, cb)   H-padded natural-layout input slab
    a_ref,  # (B, 1, cb) f32     per-(batch, channel) GN affine scale
    s_ref,  # (B, 1, cb) f32     per-(batch, channel) GN affine shift
    w_ref,  # (9, cb, cob)       tap-major conv weight block
    b_ref,  # (1, cob) f32       conv bias block
    o_ref,  # (B, bh, W, cob)
    pad_ref,  # scratch (B*(bh+3)*(W+2), cb) flat padded domain, input dtype
    im2_ref,  # scratch (B*bh*(W+2), 9*cb) tap-gathered im2col slab
    acc_ref,  # scratch (B*bh*(W+2), cob) f32
    *,
    b: int,
    bh: int,
    w: int,
    h: int,
    nc: int,
    nco: int,
    cob: int,
    with_silu: bool,
):
    ih = pl.program_id(0)
    ico = pl.program_id(1)
    ic = pl.program_id(2)
    w2 = w + 2
    mp = (bh + 3) * w2
    bm = bh * w2
    cb = pad_ref.shape[-1]

    # activation epilogue of the producing GroupNorm, applied to the slab
    # already in VMEM: y = silu(a*x + b) in fp32, zeroed outside the valid
    # image rows (padded row index ih*bh + r maps to image row -1 at r=0)
    xf = x_ref[...].astype(jnp.float32)
    y = xf * a_ref[...][:, :, None, :] + s_ref[...][:, :, None, :]
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    row = lax.broadcasted_iota(jnp.int32, (1, bh + 3, 1, 1), 1) + ih * bh
    valid = (row >= 1) & (row <= h)
    y = jnp.where(valid, y, 0.0).astype(pad_ref.dtype)
    # W-pad in registers, then ONE flat write; the tap gather below moves
    # scratch->scratch through REF slices (lazy sublane-offset loads, the
    # ops/conv.py pattern) — slicing a materialized value 9x would
    # allocate 9 relayout copies (VMEM OOM, established by on-chip
    # probes).
    zcol = jnp.zeros((b, bh + 3, 1, y.shape[-1]), y.dtype)
    ypad = jnp.concatenate([zcol, y, zcol], axis=2)  # (B, bh+3, W+2, cb)
    pad_ref[...] = ypad.reshape(b * mp, -1)

    # gather the 9 taps into lane-blocks of the im2col slab, per image
    # (each image reads its OWN halo rows, so images pack gap-free into
    # the GEMM M dim); lane offsets t*cb are 128-aligned by construction
    for i in range(b):
        for t in range(9):
            off = (t // 3) * w2 + t % 3
            im2_ref[i * bm : (i + 1) * bm, t * cb : (t + 1) * cb] = pad_ref[
                i * mp + off : i * mp + off + bm, :
            ]

    @pl.when(ic == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # ONE K=9*cb GEMM per channel chunk: 2 accumulator passes instead of
    # 18 (the acc VMEM round-trips dominated the tap-by-tap variant). The
    # (9, cb, cob) weight block flattens to (9*cb, cob) for free — the
    # collapse is layout-preserving for cb % 8 == 0.
    acc_ref[...] += jax.lax.dot(
        im2_ref[...],
        w_ref[...].reshape(9 * cb, cob),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ic == nc - 1)
    def _done():
        # cow < cob when cout itself is not a 128-multiple (320-out
        # levels): the GEMM ran on lane-padded weights; drop the pad lanes
        cow = o_ref.shape[-1]
        for i in range(b):
            out = acc_ref[i * bm : (i + 1) * bm, :] + b_ref[...]
            out = out.reshape(bh, w2, -1)[:, :w, :cow]
            o_ref[i] = out.astype(o_ref.dtype)


def _gnconv_call(xp, a, s, wf, bias, *, h, w, cout, bh, cb, cob, with_silu):
    """xp: (B, H+3, W, Cin) H-padded input (1 top + 2 bottom pad rows);
    a/s: (B, 1, Cin) f32 affine; wf: (9, Cin, Cop) lane-padded weights;
    bias: (1, Cop) f32. cout is the REAL output width (out array lanes)."""
    b, hp, _, cin = xp.shape
    nh = h // bh
    nc = cin // cb
    nco = max(1, cout // cob)
    cow = min(cob, cout)
    mp = (bh + 3) * (w + 2)
    bm = bh * (w + 2)
    E = pl.Element
    return pl.pallas_call(
        functools.partial(
            _gnconv_kernel,
            b=b,
            bh=bh,
            w=w,
            h=h,
            nc=nc,
            nco=nco,
            cob=cob,
            with_silu=with_silu,
        ),
        grid=(nh, nco, nc),
        in_specs=[
            pl.BlockSpec(
                (E(b), E(bh + 3), E(w), E(cb)),
                lambda ih, ico, ic: (0, ih * bh, 0, ic * cb),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (E(b), E(1), E(cb)),
                lambda ih, ico, ic: (0, 0, ic * cb),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (E(b), E(1), E(cb)),
                lambda ih, ico, ic: (0, 0, ic * cb),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (E(9), E(cb), E(cob)),
                lambda ih, ico, ic: (0, ic * cb, ico * cob),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (E(1), E(cob)), lambda ih, ico, ic: (0, ico * cob),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (E(b), E(bh), E(w), E(cow)),
            lambda ih, ico, ic: (0, ih * bh, 0, ico * cob),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((b * mp, cb), xp.dtype),
            pltpu.VMEM((b * bm, 9 * cb), xp.dtype),
            pltpu.VMEM((b * bm, cob), jnp.float32),
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


def _padded_cin(cin: int) -> int:
    """Mosaic cannot window an input whose lane (channel) dim is not a
    128-multiple (established by on-chip probes: C=320/960 fail window
    inference however blocked; C=128k pass). Round up — the zero channels
    ride the SAME pad copy as the H-halo (one fused XLA pad), get affine
    (a, s) = (0, 0) so silu(0) = 0, and contribute nothing to the taps."""
    return -(-cin // 128) * 128


def supports(shape, cout, dtype) -> bool:
    """Hot-shape gate: SD's resnet convs are >= 128-channel (320/640/1280
    and the concat-widened sums); thin shapes (conv_in etc.) stay on XLA."""
    if os.environ.get("LECO_GNCONV_KERNEL", "1") == "0":
        # A/B knob: affine-collapsed GN with the epilogue riding XLA's
        # conv input fusion instead of the Pallas kernel
        return False
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    if h < 4 or w < 4 or c < 128 or cout < 128:
        return False
    return _dispatch(b, h, w, c, cout, jnp.dtype(dtype).itemsize) is not None


def _fwd_impl(x, a, s, kernel, bias, with_silu):
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    cp = _padded_cin(cin)
    blocks = _dispatch(b, h, w, cin, cout, x.dtype.itemsize)
    if blocks is None:
        return _conv_reference(x, a, s, kernel, bias, with_silu)
    bh, cb, cob = blocks
    pc = cp - cin
    po = cob * max(1, cout // cob) - cout  # lane pad for non-128k cout
    xp = jnp.pad(x, ((0, 0), (1, 2), (0, 0), (0, pc)))
    wf = jnp.pad(
        kernel.astype(x.dtype), ((0, 0), (0, 0), (0, pc), (0, po))
    ).reshape(9, cp, cout + po)
    af = jnp.pad(a, ((0, 0), (0, pc)))
    sf = jnp.pad(s, ((0, 0), (0, pc)))
    bf = jnp.pad(bias, (0, po)).reshape(1, cout + po).astype(jnp.float32)
    return _gnconv_call(
        xp,
        af[:, None, :],
        sf[:, None, :],
        wf,
        bf,
        h=h,
        w=w,
        cout=cout,
        bh=bh,
        cb=cb,
        cob=cob,
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
