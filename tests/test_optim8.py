"""8-bit optimizer states (train/quant8.py) and D-Adaptation Lion
(train/dadapt.py) — the two optimizer names whose semantics round 1 only
approximated (reference train_util.py:336-354)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from leco_tpu.train.dadapt import dadapt_lion
from leco_tpu.train.quant8 import (
    QuantLeaf,
    adam8bit,
    dequantize_blockwise,
    dynamic_codebook,
    lion8bit,
    quantize_blockwise,
)


class TestCodebook:
    @pytest.mark.parametrize("signed", [True, False])
    def test_structure(self, signed):
        book = dynamic_codebook(signed)
        assert book.shape == (256,)
        assert len(np.unique(book)) == 256
        assert 0.0 in book and 1.0 in book
        assert np.all(np.diff(book) > 0)
        if signed:
            assert book.min() < -0.9
        else:
            assert book.min() == 0.0

    def test_roundtrip_error_bounds(self):
        # dynamic-tree quantization: relative error per level is bounded by
        # half the fraction spacing at the densest level covering the value
        x = jax.random.normal(jax.random.PRNGKey(0), (5000,), jnp.float32)
        q = quantize_blockwise(x, signed=True, block_size=512)
        assert q.codes.dtype == jnp.uint8
        y = dequantize_blockwise(q, x.shape, signed=True)
        err = np.abs(np.asarray(y - x))
        scale = np.abs(np.asarray(x)).max()
        assert err.max() <= 0.02 * scale  # worst abs error ~ top-level spacing
        # signed top level: 64 fractions over [0.1, 1] -> spacing ~0.0143,
        # worst rel error at the 0.1 boundary = half-spacing/0.1 ~ 7.2%
        big = np.abs(np.asarray(x)) > 0.1 * scale
        rel = err[big] / np.abs(np.asarray(x))[big]
        assert rel.max() < 0.075

    def test_roundtrip_unsigned(self):
        x = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (300,))) + 1e-3
        q = quantize_blockwise(x, signed=False, block_size=128)
        y = dequantize_blockwise(q, x.shape, signed=False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0.05)

    def test_shapes_and_padding(self):
        x = jnp.arange(13.0).reshape(13)
        q = quantize_blockwise(x, block_size=8)
        assert q.codes.shape == (2, 8)
        y = dequantize_blockwise(q, (13,))
        assert y.shape == (13,)


def _quadratic_run(opt, steps=60, key=2):
    target = jax.random.normal(jax.random.PRNGKey(key), (16, 8))
    params = {"w": jnp.zeros((16, 8))}
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(
            lambda p: jnp.mean((p["w"] - target) ** 2)
        )(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    for _ in range(steps):
        params, state, loss = step(params, state)
    return params, float(loss)


class TestAdam8bit:
    def test_tracks_adam(self):
        p8, l8 = _quadratic_run(adam8bit(1e-2, block_size=64))
        p32, l32 = _quadratic_run(optax.adam(1e-2))
        # quantized states perturb the path but not the destination
        np.testing.assert_allclose(
            np.asarray(p8["w"]), np.asarray(p32["w"]), atol=0.05
        )
        assert l8 < l32 * 3 + 1e-4

    def test_states_are_uint8(self):
        opt = adam8bit(1e-3)
        state = opt.init({"w": jnp.zeros((300,))})
        leaves = [x for x in jax.tree.leaves(state[0].mu) if x.ndim == 2]
        assert any(l.dtype == jnp.uint8 for l in leaves)


class TestLion8bit:
    def test_tracks_lion(self):
        # sign updates make elementwise paths chaotic under tiny state
        # perturbations; the meaningful invariants are the loss trajectory
        # and the aggregate parameter distance
        p8, l8 = _quadratic_run(lion8bit(1e-2, block_size=64))
        p32, l32 = _quadratic_run(optax.lion(1e-2))
        assert abs(l8 - l32) < 0.05
        diff = np.abs(np.asarray(p8["w"]) - np.asarray(p32["w"]))
        assert diff.mean() < 0.02

    def test_update_is_sign(self):
        opt = lion8bit(1e-2)
        params = {"w": jnp.zeros((8, 8))}
        state = opt.init(params)
        grads = {"w": jax.random.normal(jax.random.PRNGKey(3), (8, 8))}
        updates, _ = opt.update(grads, state, params)
        mags = np.unique(np.round(np.abs(np.asarray(updates["w"])), 8))
        assert len(mags) <= 2  # {0, lr}


class TestDAdaptLion:
    def test_converges_without_lr_tuning(self):
        # schedule peaks at 1.0 — usable only because d adapts from d0=1e-6;
        # the cosine decay anneals the sign-update oscillation like any Lion
        sched = optax.cosine_decay_schedule(1.0, 300)
        params, loss = _quadratic_run(dadapt_lion(sched), steps=300)
        assert loss < 1e-3

    def test_d_grows_from_d0(self):
        opt = dadapt_lion(1.0, d0=1e-6)
        params = {"w": jnp.zeros((32,))}
        state = opt.init(params)
        g = {"w": jnp.ones((32,))}
        for _ in range(5):
            updates, state = opt.update(g, state, params)
            params = optax.apply_updates(params, updates)
        assert float(state.d) > 1e-6
        assert int(state.count) == 5

    def test_update_magnitude_is_dlr(self):
        opt = dadapt_lion(0.5, d0=1e-4, weight_decay=0.0)
        params = {"w": jnp.zeros((16,))}
        state = opt.init(params)
        g = {"w": jax.random.normal(jax.random.PRNGKey(4), (16,))}
        updates, state = opt.update(g, state, params)
        np.testing.assert_allclose(
            np.abs(np.asarray(updates["w"])), 1e-4 * 0.5, rtol=1e-5
        )

    def test_jits_and_scans(self):
        opt = dadapt_lion(1.0)
        params = {"w": jnp.zeros((8,))}
        state = opt.init(params)

        @jax.jit
        def step(carry, _):
            params, state = carry
            g = jax.tree.map(lambda p: p + 1.0, params)
            updates, state = opt.update(g, state, params)
            return (optax.apply_updates(params, updates), state), None

        (params, state), _ = jax.lax.scan(step, (params, state), None, length=3)
        assert np.isfinite(np.asarray(params["w"])).all()


class TestCheckpointable:
    """Optimizer states must survive the orbax save path (pure array trees)."""

    @pytest.mark.parametrize(
        "factory", [lambda: adam8bit(1e-3), lambda: lion8bit(1e-3),
                    lambda: dadapt_lion(1.0)]
    )
    def test_state_is_array_tree(self, factory):
        state = factory().init({"w": jnp.zeros((64,))})
        for leaf in jax.tree.leaves(state):
            assert hasattr(leaf, "dtype") and hasattr(leaf, "shape")
