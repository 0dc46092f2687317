"""Fused GEGLU projection kernel (Pallas TPU).

The transformer feed-forward's first half is `proj = x @ W (+ LoRA); value,
gate = split(proj); out = value * gelu(gate)` (reference: diffusers GEGLU,
wrapped by lora.py's monkey-patched Linear). Unfused, the (M, 2N) projection
round-trips HBM and the exact-erf gelu+mul runs as a separate full-size VPU
pass — measured ~0.3 ms per level-0 block on chip (docs/DESIGN.md). This
kernel computes the two GEMM halves with the gelu·mul epilogue in VMEM and
writes only the (M, N) result.

LoRA composes exactly: the rank-r delta enters the projection BEFORE the
nonlinearity (same as the reference's patched Linear). The caller passes
`xd = (x @ lora_down) * scale` (M, r) and the kernel adds `xd @ lora_up`
to each half — a rank-r MXU pass, ~1/100th of the main GEMM.

Backward is an XLA-einsum recompute custom VJP (only the B-sized target
pass differentiates; grads w.r.t. the frozen base kernel are DCE'd, grads
w.r.t. lora_down/lora_up flow through xd/up).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024
_INV_SQRT2 = 2.0**-0.5


def default_geglu_backend() -> str:
    """Backends:
    - "xla" (default): the literal single-GEMM reference form.
    - "split": two half-GEMMs `value = x@W[:, :n]`, `gate = x@W[:, n:]`,
      combined as `value * gelu(gate)` — in theory lets XLA fuse gelu·mul
      into the gate GEMM instead of round-tripping the (M, 2n) projection
      through HBM. Measured on chip: parity at best (1.95 vs 1.97 it/s on
      the SD1.5 bench) — XLA's single-GEMM fusion was already fine. Note
      the LoRA ride-along GEGLU path always uses the split structure (the
      value-half GEMM carries the lora_down columns); THAT one is a
      measured win in combination (see lora._lora_ride_along).
    - "fused": Pallas kernel — measured on chip as a net loss (the kernel
      itself is fine at ~1.4 ms/fwd but pulling the projection out of XLA's
      fusion graph costs ~+2.7 ms elsewhere; 20.7 -> 23.4 ms/fwd)."""
    import os

    return os.environ.get("LECO_GEGLU", "xla")


def geglu_split(x, kernel, bias, xd=None, up=None):
    """Two half-GEMMs so the gelu*mul epilogue fuses (see
    default_geglu_backend). Columns and reduction order match the
    single-GEMM form exactly."""
    n = kernel.shape[1] // 2
    value = x @ kernel[:, :n].astype(x.dtype)
    gate = x @ kernel[:, n:].astype(x.dtype)
    if bias is not None:
        value = value + bias[:n].astype(x.dtype)
        gate = gate + bias[n:].astype(x.dtype)
    if xd is not None:
        value = value + xd.astype(x.dtype) @ up[:, :n].astype(x.dtype)
        gate = gate + xd.astype(x.dtype) @ up[:, n:].astype(x.dtype)
    return value * gelu_exact(gate)


def _erf_poly(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7 — far below bf16
    resolution). Mosaic has no erf primitive; exp is native."""
    a1, a2, a3, a4, a5 = (
        0.254829592,
        -0.284496736,
        1.421413741,
        -1.453152027,
        1.061405429,
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact_f32(g, erf=jax.lax.erf):
    return 0.5 * g * (1.0 + erf(g * _INV_SQRT2))


def _kernel(x_ref, wv_ref, wg_ref, b_ref, xd_ref, uv_ref, ug_ref, o_ref):
    x = x_ref[...]
    v = jnp.dot(x, wv_ref[...], preferred_element_type=jnp.float32)
    g = jnp.dot(x, wg_ref[...], preferred_element_type=jnp.float32)
    if xd_ref is not None:
        xd = xd_ref[...]
        v += jnp.dot(xd, uv_ref[...], preferred_element_type=jnp.float32)
        g += jnp.dot(xd, ug_ref[...], preferred_element_type=jnp.float32)
    b = b_ref[...]
    v = v + b[0:1, :]
    g = g + b[1:2, :]
    o_ref[...] = (v * _gelu_exact_f32(g, erf=_erf_poly)).astype(o_ref.dtype)


def _pick(m: int, n: int, k: int, itemsize: int):
    nt = None
    for cand in (640, 512, 256, 128):
        if n % cand == 0:
            nt = cand
            break
    if nt is None:
        return None
    for bm in (1024, 512, 256, 128):
        if m % bm:
            continue
        vmem = (
            2 * bm * k * itemsize  # x (double-buffered)
            + 2 * 2 * 2 * k * nt * itemsize  # wv+wg double-buffered
            + 2 * bm * nt * 4  # two fp32 accumulators
            + 2 * bm * nt * itemsize
        )
        if vmem <= _VMEM_BUDGET:
            return bm, nt
    return None


def gelu_exact(g):
    """Exact (erf) gelu with the erf computed by the A&S 7.1.26 polynomial
    (|err| <= 1.5e-7 — far below bf16 resolution and below the fp32 test
    tolerances). XLA's own erf lowering is much longer on the VPU: swapping
    it measured 1.97 -> 2.03 it/s on the SD1.5 bench. LECO_GELU=erf reverts
    to jax.lax.erf."""
    import os

    import flax.linen as nn

    if os.environ.get("LECO_GELU") == "erf":
        return nn.gelu(g, approximate=False)
    gf = g.astype(jnp.float32)
    return (0.5 * gf * (1.0 + _erf_poly(gf * _INV_SQRT2))).astype(g.dtype)


def geglu_reference(x, kernel, bias, xd=None, up=None):
    """XLA fallback; also the ground truth for the kernel tests."""
    proj = x @ kernel.astype(x.dtype)
    if bias is not None:
        proj = proj + bias.astype(x.dtype)
    if xd is not None:
        proj = proj + xd.astype(x.dtype) @ up.astype(x.dtype)
    value, gate = jnp.split(proj, 2, axis=-1)
    return value * gelu_exact(gate)


def _fwd_impl(x, kernel, bias, xd, up):
    *lead, k = x.shape
    n2 = kernel.shape[1]
    n = n2 // 2
    m = 1
    for s in lead:
        m *= s
    pick = _pick(m, n, k, x.dtype.itemsize)
    if pick is None:
        return geglu_reference(x, kernel, bias, xd, up)
    bm, nt = pick

    x2 = x.reshape(m, k)
    wv = kernel[:, :n]
    wg = kernel[:, n:]
    b2 = (
        jnp.zeros((2, n), jnp.float32)
        if bias is None
        else jnp.stack([bias[:n], bias[n:]]).astype(jnp.float32)
    )

    has_lora = xd is not None
    r = xd.shape[-1] if has_lora else 0
    args = [x2, wv, wg, b2]
    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, nt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, nt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, nt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    if has_lora:
        args += [
            xd.reshape(m, r).astype(x.dtype),
            up[:, :n].astype(x.dtype),
            up[:, n:].astype(x.dtype),
        ]
        in_specs += [
            pl.BlockSpec((bm, r), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, nt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, nt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ]
        kern = _kernel
    else:
        kern = lambda x_ref, wv_ref, wg_ref, b_ref, o_ref: _kernel(
            x_ref, wv_ref, wg_ref, b_ref, None, None, None, o_ref
        )

    out = pl.pallas_call(
        kern,
        grid=(m // bm, n // nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, nt), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n2,
            bytes_accessed=(m * k + k * n2 + m * n) * x.dtype.itemsize,
            transcendentals=m * n,
        ),
    )(*args)
    return out.reshape(*lead, n)


@jax.custom_vjp
def geglu_fused(x, kernel, bias, xd, up):
    """out = value * gelu_exact(gate) of proj = x@kernel + bias + xd@up,
    split into (value, gate) halves. xd/up may be None (no LoRA)."""
    return _fwd_impl(x, kernel, bias, xd, up)


def _geglu_fwd(x, kernel, bias, xd, up):
    return _fwd_impl(x, kernel, bias, xd, up), (x, kernel, bias, xd, up)


def _geglu_bwd(res, gout):
    x, kernel, bias, xd, up = res
    f32 = jnp.float32
    xk = x.astype(f32)
    proj = xk @ kernel.astype(f32)
    if bias is not None:
        proj = proj + bias.astype(f32)
    if xd is not None:
        proj = proj + xd.astype(f32) @ up.astype(f32)
    n = proj.shape[-1] // 2
    v, g = proj[..., :n], proj[..., n:]
    gg = gout.astype(f32)
    act = _gelu_exact_f32(g)
    dv = gg * act
    # d/dg [g * Phi-like]: 0.5(1+erf(g/sqrt2)) + g * pdf(g)
    pdf = jnp.exp(-0.5 * g * g) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    dact = 0.5 * (1.0 + jax.lax.erf(g * _INV_SQRT2)) + g * pdf
    dg = gg * v * dact
    dproj = jnp.concatenate([dv, dg], axis=-1)

    dx = dproj @ kernel.astype(f32).T
    dw = jnp.einsum("...k,...n->kn", xk, dproj)
    db = None if bias is None else jnp.sum(dproj, axis=tuple(range(dproj.ndim - 1)))
    if xd is not None:
        dxd = dproj @ up.astype(f32).T
        dup = jnp.einsum("...r,...n->rn", xd.astype(f32), dproj)
        dxd = dxd.astype(xd.dtype)
        dup = dup.astype(up.dtype)
    else:
        dxd = None
        dup = None
    return (
        dx.astype(x.dtype),
        dw.astype(kernel.dtype),
        None if bias is None else db.astype(bias.dtype),
        dxd,
        dup,
    )


geglu_fused.defvjp(_geglu_fwd, _geglu_bwd)
