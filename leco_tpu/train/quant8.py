"""Blockwise dynamic 8-bit optimizer states (Adam8bit / Lion8bit).

The reference maps "adam8bit"/"lion8bit" to `bnb.optim.Adam8bit`/`Lion8bit`
(reference train_util.py:346-354) — bitsandbytes' CUDA optimizers that hold
the moment tensors in 8 bits via blockwise dynamic-tree quantization
(Dettmers et al., "8-bit Optimizers via Block-wise Quantization", ICLR
2022). This is the same scheme as pure JAX, sharding-friendly state:

- each moment leaf is stored flattened in blocks of `block_size` values as
  a uint8 code + one fp32 absmax per block;
- codes index a dynamic-tree codebook: 7 exponent levels (10^-6 .. 10^0),
  each with linearly spaced fractions in [0.1, 1) — twice the fraction
  resolution per level for the unsigned (second-moment) variant — plus
  exact 0 and 1. Quantization is nearest-codeword of value/absmax.

Not bit-identical to bitsandbytes (which is CUDA-only and unavailable
here); the codebook construction, storage layout and update math follow
the paper. At LoRA scale the states are tiny and this is about name/
semantics parity, but it is the real algorithm: states never exist in
fp32 between steps, so it also holds for full-model fine-tunes.

Dequantize -> fp32 update math (identical to optax.adam / optax.lion with
the torch defaults the reference gets) -> requantize, all inside jit.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def dynamic_codebook(signed: bool = True) -> np.ndarray:
    """256-entry dynamic-tree codebook in [-1, 1] (signed) or [0, 1]."""
    values = [0.0, 1.0]
    levels = 7
    for i in range(levels):
        n = 2**i if signed else 2 ** (i + 1)
        bounds = np.linspace(0.1, 1.0, n + 1)
        means = (bounds[:-1] + bounds[1:]) / 2.0
        scaled = means * 10.0 ** (i - (levels - 1))
        values.extend(scaled.tolist())
        if signed:
            values.extend((-scaled).tolist())
    out = np.sort(np.asarray(values, np.float32))
    assert out.shape == (256,), out.shape
    return out


_CODE_SIGNED = dynamic_codebook(signed=True)
_CODE_UNSIGNED = dynamic_codebook(signed=False)
# nearest-codeword via searchsorted over the decision boundaries
_MID_SIGNED = (_CODE_SIGNED[1:] + _CODE_SIGNED[:-1]) / 2.0
_MID_UNSIGNED = (_CODE_UNSIGNED[1:] + _CODE_UNSIGNED[:-1]) / 2.0


class QuantLeaf(NamedTuple):
    codes: jnp.ndarray  # uint8 (nblocks, block)
    absmax: jnp.ndarray  # f32 (nblocks, 1)


def quantize_blockwise(
    x: jnp.ndarray, signed: bool = True, block_size: int = 2048
) -> QuantLeaf:
    flat = x.astype(jnp.float32).reshape(-1)
    n = flat.shape[0]
    nblocks = -(-n // block_size)
    pad = nblocks * block_size - n
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(nblocks, block_size)
    absmax = jnp.max(jnp.abs(blocks), axis=-1, keepdims=True)
    normed = blocks / jnp.maximum(absmax, 1e-30)
    mids = jnp.asarray(_MID_SIGNED if signed else _MID_UNSIGNED)
    codes = jnp.searchsorted(mids, normed).astype(jnp.uint8)
    return QuantLeaf(codes=codes, absmax=absmax)


def dequantize_blockwise(
    q: QuantLeaf, shape, signed: bool = True
) -> jnp.ndarray:
    book = jnp.asarray(_CODE_SIGNED if signed else _CODE_UNSIGNED)
    vals = book[q.codes.astype(jnp.int32)] * q.absmax
    return vals.reshape(-1)[: int(np.prod(shape))].reshape(shape)


class Adam8bitState(NamedTuple):
    count: jnp.ndarray
    mu: Any  # tree of QuantLeaf (signed)
    nu: Any  # tree of QuantLeaf (unsigned)


class Lion8bitState(NamedTuple):
    count: jnp.ndarray
    mu: Any  # tree of QuantLeaf (signed)


def scale_by_adam8bit(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    block_size: int = 2048,
) -> optax.GradientTransformation:
    def init_fn(params):
        qz = lambda signed: jax.tree.map(
            lambda p: quantize_blockwise(jnp.zeros_like(p), signed, block_size),
            params,
        )
        return Adam8bitState(
            count=jnp.zeros([], jnp.int32), mu=qz(True), nu=qz(False)
        )

    def update_fn(grads, state, params=None):
        count = state.count + 1

        def upd(g, mq, nq):
            g32 = g.astype(jnp.float32)
            m = dequantize_blockwise(mq, g.shape, signed=True)
            v = dequantize_blockwise(nq, g.shape, signed=False)
            m = b1 * m + (1.0 - b1) * g32
            v = b2 * v + (1.0 - b2) * g32 * g32
            mhat = m / (1.0 - b1 ** count.astype(jnp.float32))
            vhat = v / (1.0 - b2 ** count.astype(jnp.float32))
            out = (mhat / (jnp.sqrt(vhat) + eps)).astype(g.dtype)
            return (
                out,
                quantize_blockwise(m, True, block_size),
                quantize_blockwise(v, False, block_size),
            )

        # QuantLeaf is itself a pytree, so map over the grads treedef
        flat_g, treedef = jax.tree.flatten(grads)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_n = treedef.flatten_up_to(state.nu)
        outs = [upd(g, m, n) for g, m, n in zip(flat_g, flat_m, flat_n)]
        updates = treedef.unflatten([o[0] for o in outs])
        new_mu = treedef.unflatten([o[1] for o in outs])
        new_nu = treedef.unflatten([o[2] for o in outs])
        return updates, Adam8bitState(count=count, mu=new_mu, nu=new_nu)

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_lion8bit(
    b1: float = 0.9,
    b2: float = 0.99,
    block_size: int = 2048,
) -> optax.GradientTransformation:
    def init_fn(params):
        mu = jax.tree.map(
            lambda p: quantize_blockwise(jnp.zeros_like(p), True, block_size),
            params,
        )
        return Lion8bitState(count=jnp.zeros([], jnp.int32), mu=mu)

    def update_fn(grads, state, params=None):
        flat_g, treedef = jax.tree.flatten(grads)
        flat_m = treedef.flatten_up_to(state.mu)
        updates, new_mu = [], []
        for g, mq in zip(flat_g, flat_m):
            g32 = g.astype(jnp.float32)
            m = dequantize_blockwise(mq, g.shape, signed=True)
            u = jnp.sign(b1 * m + (1.0 - b1) * g32).astype(g.dtype)
            m = b2 * m + (1.0 - b2) * g32
            updates.append(u)
            new_mu.append(quantize_blockwise(m, True, block_size))
        return (
            treedef.unflatten(updates),
            Lion8bitState(
                count=state.count + 1, mu=treedef.unflatten(new_mu)
            ),
        )

    return optax.GradientTransformation(init_fn, update_fn)


def adam8bit(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    block_size: int = 2048,
) -> optax.GradientTransformation:
    """bnb.optim.Adam8bit equivalent (torch Adam defaults; bnb accepts
    weight_decay and applies it decoupled — reference train_util.py:346-354
    forwards optimizer_args, so `weight_decay=...` must work here too)."""
    parts = [scale_by_adam8bit(b1, b2, eps, block_size)]
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def lion8bit(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.99,
    weight_decay: float = 0.0,
    block_size: int = 2048,
) -> optax.GradientTransformation:
    """bnb.optim.Lion8bit equivalent (decoupled weight decay like bnb/lion)."""
    parts = [scale_by_lion8bit(b1, b2, block_size)]
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)
