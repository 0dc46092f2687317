"""Pallas TPU implicit-GEMM 3x3 convolution.

Why this exists: XLA's native conv lowering reaches only ~13-28% MFU on the
SD UNet's hot 3x3 stride-1 shapes (measured on v5e, scripts/bench_convs.py),
while the same chip sustains >50% on plain GEMMs — and the whole-step profile
is conv-dominated (docs/DESIGN.md). The reference inherits cuDNN convs via
torch (train_lora.py); this is the TPU-native equivalent of that fast path.

Formulation (flat-row implicit GEMM):
  * pad the NHWC input by 1 in H and W, flatten each padded image to
    M' = (H+2)*(W+2) rows of Cin channels.
  * output pixel (y, x) lives at flat row m = y*(W+2) + x; the 3x3 tap
    (dy, dx) reads flat row m + dy*(W+2) + dx. Taps are static row offsets.
  * each grid cell loads ONE contiguous row-slab (bm + 2W + 6 rows) into
    VMEM and accumulates 9 MXU GEMMs (bm, Cin) @ (Cin, Cout) in fp32 —
    one per tap, each a static sublane-offset slice of the slab.
  * outputs land in (B, H*(W+2), Cout); two garbage columns per row
    (x in {W, W+1}, computed from padding) are sliced off outside.

The kernel computes a handful of wasted columns (2/(W+2) of the FLOPs) in
exchange for fully static, relayout-free addressing; there is no im2col
materialization and no (9x) input re-read.

Backward: dx of a stride-1 3x3 conv is itself a stride-1 3x3 conv with the
spatially-flipped, io-transposed kernel, so the VJP reuses this same kernel;
dw falls back to an XLA einsum (the base kernels are frozen in LECO training,
so the dw path is dead code the compiler removes).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_block(m_rows: int, w2: int, cin: int, cout: int, itemsize: int = 2):
    """Largest row-block bm that divides M = H*(W+2), keeps MXU M-efficiency
    reasonable, and fits the slab + weights + accumulator in VMEM."""
    best = None
    for bm in range(m_rows, 0, -1):
        if m_rows % bm:
            continue
        slab = 2 * (bm + 2 * w2 + 2) * cin * itemsize  # double-buffered
        wts = 9 * cin * cout * itemsize
        acc = bm * cout * 4
        out = 2 * bm * cout * itemsize
        if slab + wts + acc + out > _VMEM_BUDGET:
            continue
        # MXU occupancy of the M dimension (padded to 128 per pass)
        eff = bm / (-(-bm // 128) * 128)
        score = (eff, bm)
        if best is None or score > best[0]:
            best = (score, bm)
        if eff == 1.0:
            break
    return None if best is None else best[1]


def _conv_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, bm: int, w2: int):
    """x_ref: (1, slab_rows, Cin); w_ref: (9, Cin, Cout); b_ref: (1, Cout);
    o_ref: (1, bm, Cout)."""
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        for dx in range(3):
            off = dy * w2 + dx
            a = x_ref[0, off : off + bm, :]
            acc_ref[...] += jax.lax.dot(
                a, w_ref[dy * 3 + dx], preferred_element_type=jnp.float32
            )
    o_ref[0] = (acc_ref[...] + b_ref[...]).astype(o_ref.dtype)


def conv3x3_gemm(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """3x3 stride-1 pad-1 convolution. x: (B, H, W, Cin) NHWC;
    kernel: (3, 3, Cin, Cout) HWIO; returns (B, H, W, Cout)."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    w2 = w + 2
    m = h * w2

    bm = _pick_block(m, w2, cin, cout, x.dtype.itemsize)
    if bm is None:  # pathological shape: fall back to XLA
        return _xla_conv3x3(x, kernel, bias)
    # Mosaic wants the sublane block dim divisible by 8; the extra rows read
    # past the last tap offset are covered by the (H+3) row padding below
    slab_rows = -(-(bm + 2 * w2 + 2) // 8) * 8

    # pad: +1 ring for the convolution, +1 extra bottom row so the last
    # block's slab read ([m - bm, m + 2*w2 + 2)) stays inside the
    # (H+3)*(W+2) flat rows
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 1), (0, 0))).reshape(b, -1, cin)
    wf = kernel.reshape(9, cin, cout)
    bf = (
        jnp.zeros((1, cout), jnp.float32)
        if bias is None
        else bias.reshape(1, cout).astype(jnp.float32)
    )

    out = pl.pallas_call(
        functools.partial(_conv_kernel, bm=bm, w2=w2),
        grid=(b, m // bm),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(slab_rows), pl.Element(cin)),
                lambda bi, i: (bi, i * bm, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((9, cin, cout), lambda bi, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bm, cout), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, m, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * m * 9 * cin * cout,
            bytes_accessed=(x.size + kernel.size + b * m * cout)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, wf, bf)

    return out.reshape(b, h, w2, cout)[:, :, :w, :]


def _xla_conv3x3(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# differentiable wrapper
# ---------------------------------------------------------------------------


@jax.custom_vjp
def conv3x3(x, kernel, bias):
    """Differentiable 3x3/s1/p1 conv on the Pallas implicit-GEMM kernel."""
    return conv3x3_gemm(x, kernel, bias)


def _conv3x3_fwd(x, kernel, bias):
    return conv3x3_gemm(x, kernel, bias), (x, kernel)


def _conv3x3_bwd(res, g):
    x, kernel = res
    # dx: conv of g with the spatially-flipped, io-transposed kernel
    k_flip = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = conv3x3_gemm(g, k_flip, None)
    # dw[dy,dx,ci,co] = sum_{b,y,x} x_pad[y+dy, x+dx, ci] * g[y, x, co]
    # (dead code in LECO training — base kernels are frozen — XLA DCEs it)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = g.shape[1], g.shape[2]
    taps = [
        jnp.einsum(
            "bhwi,bhwo->io",
            jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_slice_in_dim(xp, dy, h, axis=1), dx, w, axis=2
            ),
            g,
            preferred_element_type=jnp.float32,
        )
        for dy in range(3)
        for dx in range(3)
    ]
    dw = jnp.stack(taps).reshape(3, 3, *taps[0].shape).astype(kernel.dtype)
    db = jnp.sum(g, axis=(0, 1, 2)).astype(jnp.float32)
    return dx, dw, db


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def default_conv_backend() -> str:
    """Measured on the real chip (profile_fwd A/B, res 512 batch 2): the
    Pallas kernel's per-conv time matches XLA's conv fusions, but the
    pad/reshape/slice boundary costs ~2.3 ms/fwd extra — XLA's convs were
    never the bottleneck (the per-component attribution lives in
    docs/DESIGN.md). Kernel stays opt-in: LECO_CONV_BACKEND=gemm."""
    return os.environ.get("LECO_CONV_BACKEND", "xla")
