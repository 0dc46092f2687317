"""D-Adaptation Lion as an optax transform.

The reference maps optimizer name "dadaptlion" to `dadaptation.DAdaptLion`
(reference train_util.py:336-344). That package is torch-only; this is the
published algorithm (Defazio & Mishchenko, "Learning-Rate-Free Learning by
D-Adaptation", ICML 2023 — the Lion variant shipped in the dadaptation
repository) re-implemented as a pure optax GradientTransformation so it
jits into the train step like every other optimizer here.

Per step, with dlr = d * lr(t), sqb2 = sqrt(b2):

    u      = sign(b1 * m + (1 - b1) * dlr * g)      (the Lion update; both
                                                     terms on the dlr scale)
    p     -= dlr * u  (+ decoupled weight decay dlr * wd * p)
    m      = b2 * m + (1 - b2) * dlr * g            (lr-scaled momentum)
    num    = sqb2 * num + (1 - sqb2) * dlr * <u, s> (s from the PREVIOUS step)
    s      = sqb2 * s + (1 - sqb2) * dlr * u
    d      = max(d, num / ((1 - sqb2) * ||s||_1))   (the distance estimate)

d starts at d0 = 1e-6 and only grows; the lr schedule multiplies it, so
"learning-rate-free" here means lr=1.0 works (the reference passes the
config lr through unchanged, and so do we).
"""

from __future__ import annotations

from typing import NamedTuple, Any

import jax
import jax.numpy as jnp
import optax


class DAdaptLionState(NamedTuple):
    count: jnp.ndarray  # int32 step
    d: jnp.ndarray  # f32 scalar distance estimate
    numerator: jnp.ndarray  # f32 scalar weighted numerator
    exp_avg: Any  # momentum tree (lr-scaled, like the torch impl)
    s: Any  # sign-accumulator tree


def _tree_dot(a, b):
    leaves = jax.tree.leaves(
        jax.tree.map(
            lambda x, y: jnp.sum(x.astype(jnp.float32) * y.astype(jnp.float32)),
            a,
            b,
        )
    )
    return jnp.sum(jnp.stack(leaves)) if leaves else jnp.float32(0)


def _tree_l1(a):
    leaves = jax.tree.leaves(
        jax.tree.map(lambda x: jnp.sum(jnp.abs(x.astype(jnp.float32))), a)
    )
    return jnp.sum(jnp.stack(leaves)) if leaves else jnp.float32(0)


def dadapt_lion(
    learning_rate: optax.ScalarOrSchedule = 1.0,
    b1: float = 0.9,
    b2: float = 0.99,
    weight_decay: float = 0.0,
    d0: float = 1e-6,
) -> optax.GradientTransformation:
    sqb2 = b2**0.5

    def init_fn(params):
        z = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
        return DAdaptLionState(
            count=jnp.zeros([], jnp.int32),
            d=jnp.asarray(d0, jnp.float32),
            numerator=jnp.zeros([], jnp.float32),
            exp_avg=z,
            s=jax.tree.map(jnp.copy, z),
        )

    def update_fn(grads, state, params=None):
        lr = (
            learning_rate(state.count)
            if callable(learning_rate)
            else jnp.asarray(learning_rate)
        )
        lr = jnp.asarray(lr, jnp.float32)
        dlr = state.d * lr

        # exp_avg is dlr-scaled (see momentum update below), so the fresh
        # gradient must enter the blend on the same dlr scale — matching
        # dadaptation.DAdaptLion's `exp_avg*b1 + grad*(1-b1)*dlr`. Without
        # the dlr factor the g term dominates by ~1/dlr while d is small
        # and the update degenerates to plain sign(g).
        u = jax.tree.map(
            lambda m, g: jnp.sign(
                b1 * m + (1.0 - b1) * dlr * g.astype(jnp.float32)
            ),
            state.exp_avg,
            grads,
        )
        # <u, s> uses s from the previous step (torch impl: dot before s update)
        numerator_acc = dlr * _tree_dot(u, state.s)
        new_exp_avg = jax.tree.map(
            lambda m, g: b2 * m + (1.0 - b2) * dlr * g.astype(jnp.float32),
            state.exp_avg,
            grads,
        )
        new_s = jax.tree.map(
            lambda s, uu: sqb2 * s + (1.0 - sqb2) * dlr * uu, state.s, u
        )
        new_numerator = sqb2 * state.numerator + (1.0 - sqb2) * numerator_acc
        sk_l1 = _tree_l1(new_s)
        d_hat = new_numerator / ((1.0 - sqb2) * jnp.maximum(sk_l1, 1e-30))
        new_d = jnp.where(
            (sk_l1 > 0.0) & (lr > 0.0), jnp.maximum(state.d, d_hat), state.d
        )

        if weight_decay and params is not None:
            updates = jax.tree.map(
                lambda uu, p: (-dlr * (uu + weight_decay * p.astype(jnp.float32))).astype(
                    p.dtype
                ),
                u,
                params,
            )
        else:
            updates = jax.tree.map(
                lambda uu, g: (-dlr * uu).astype(g.dtype), u, grads
            )

        return updates, DAdaptLionState(
            count=state.count + 1,
            d=new_d,
            numerator=new_numerator,
            exp_avg=new_exp_avg,
            s=new_s,
        )

    return optax.GradientTransformation(init_fn, update_fn)
