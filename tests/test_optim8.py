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

    def test_weight_decay_accepted_and_applied(self):
        # bnb.optim.Adam8bit accepts weight_decay (reference
        # train_util.py:346-354 forwards optimizer_args); decoupled decay
        # must shrink params even with zero gradients
        opt = adam8bit(1e-1, weight_decay=0.5)
        params = {"w": jnp.ones((16,))}
        state = opt.init(params)
        grads = {"w": jnp.zeros((16,))}
        updates, _ = opt.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        assert float(jnp.max(new["w"])) < 1.0

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

    def test_matches_published_algorithm(self):
        """Step-by-step parity with a hand-rolled numpy transcription of
        dadaptation.DAdaptLion: both the update-blend terms carry the dlr
        scale (u = sign(b1*m + (1-b1)*dlr*g) with m the dlr-scaled
        momentum), and the d estimator follows num/((1-sqrt(b2))*||s||_1)."""
        lr, b1, b2, d0 = 1.0, 0.9, 0.99, 1e-2
        sqb2 = b2**0.5
        rng = np.random.default_rng(7)
        grads_seq = [rng.standard_normal(6).astype(np.float32) for _ in range(5)]

        # numpy reference
        p = np.zeros(6, np.float32)
        m = np.zeros(6, np.float64)
        s = np.zeros(6, np.float64)
        d, num = d0, 0.0
        ref = []
        for g in grads_seq:
            dlr = d * lr
            u = np.sign(b1 * m + (1 - b1) * dlr * g)
            num_acc = dlr * float(np.dot(u, s))
            m = b2 * m + (1 - b2) * dlr * g
            s = sqb2 * s + (1 - sqb2) * dlr * u
            num = sqb2 * num + (1 - sqb2) * num_acc
            sk_l1 = float(np.abs(s).sum())
            if sk_l1 > 0:
                d = max(d, num / ((1 - sqb2) * sk_l1))
            p = p - dlr * u
            ref.append((p.copy(), d))

        opt = dadapt_lion(lr, b1=b1, b2=b2, d0=d0)
        params = {"w": jnp.zeros(6, jnp.float32)}
        state = opt.init(params)
        for i, g in enumerate(grads_seq):
            updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
            params = optax.apply_updates(params, updates)
            np.testing.assert_allclose(
                np.asarray(params["w"]), ref[i][0], rtol=1e-5, atol=1e-7
            )
            np.testing.assert_allclose(float(state.d), ref[i][1], rtol=1e-5)

    def test_momentum_participates(self):
        """With constant gradients the blend b1*m + (1-b1)*dlr*g must keep
        the update sign aligned with -g even after many steps (momentum and
        fresh term agree); the round-2 bug made m negligible vs g."""
        opt = dadapt_lion(1.0, d0=1e-6)
        params = {"w": jnp.zeros(4)}
        state = opt.init(params)
        g = {"w": jnp.asarray([1.0, -2.0, 3.0, -4.0])}
        for _ in range(10):
            updates, state = opt.update(g, state, params)
            params = optax.apply_updates(params, updates)
        # m and (1-b1)*dlr*g now have comparable magnitude: both are
        # O(dlr*|g|); check the internal momentum is not being swamped
        m = np.asarray(state.exp_avg["w"])
        dlr = float(state.d) * 1.0
        fresh = 0.1 * dlr * np.asarray(g["w"])
        assert np.all(np.abs(m) > 0.1 * np.abs(fresh))

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
