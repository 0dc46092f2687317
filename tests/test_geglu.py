"""GEGLU backends (ops/geglu.py) and their wiring through LoRADense
(lora.py geglu=True): all backends must agree with the literal
single-GEMM reference, with and without the LoRA branch, in value and
gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from leco_tpu.ops.geglu import geglu_fused, geglu_reference, geglu_split


def _mats(key=0, m=128, k=64, n2=256, lora_r=4, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    x = jax.random.normal(ks[0], (m, k), dtype)
    w = jax.random.normal(ks[1], (k, n2), dtype) * 0.1
    b = jax.random.normal(ks[2], (n2,), dtype)
    xd = jax.random.normal(ks[3], (m, lora_r), dtype)
    up = jax.random.normal(ks[4], (lora_r, n2), dtype) * 0.1
    return x, w, b, xd, up


class TestSplitBackend:
    @pytest.mark.parametrize("with_lora", [False, True])
    @pytest.mark.parametrize("with_bias", [False, True])
    def test_matches_reference(self, with_lora, with_bias):
        x, w, b, xd, up = _mats()
        args = (
            x,
            w,
            b if with_bias else None,
            xd if with_lora else None,
            up if with_lora else None,
        )
        np.testing.assert_allclose(
            np.asarray(geglu_split(*args)),
            np.asarray(geglu_reference(*args)),
            atol=1e-5,
        )

    def test_grads_match_reference(self):
        x, w, b, xd, up = _mats()

        def loss(fn, x, w, xd, up):
            return jnp.sum(fn(x, w, b, xd, up) ** 2)

        g1 = jax.grad(lambda *a: loss(geglu_split, *a), argnums=(0, 1, 2, 3))(
            x, w, xd, up
        )
        g2 = jax.grad(
            lambda *a: loss(geglu_reference, *a), argnums=(0, 1, 2, 3)
        )(x, w, xd, up)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


class TestFusedBackend:
    @pytest.mark.parametrize("with_lora", [False, True])
    def test_matches_reference(self, with_lora):
        x, w, b, xd, up = _mats(m=256, k=128, n2=256)
        args = (x, w, b, xd if with_lora else None, up if with_lora else None)
        with pltpu.force_tpu_interpret_mode():
            got = geglu_fused(*args)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(geglu_reference(*args)), atol=2e-5
        )


class TestLoRADenseGEGLU:
    """The module-level wiring: backend dispatch and the ride-along fusion
    must not change the math."""

    def _apply(self, monkeypatch, backend=None, fuse=None):
        if backend is not None:
            monkeypatch.setenv("LECO_GEGLU", backend)
        if fuse is not None:
            monkeypatch.setenv("LECO_LORA_FUSE", fuse)
        import flax.linen as nn

        from leco_tpu.lora import LoRADense, LoRASpec

        spec = LoRASpec(rank=2, alpha=1.0)

        class Block(nn.Module):  # path must contain attentions_N (lierla)
            @nn.compact
            def __call__(self, x):
                return LoRADense(
                    64, geglu=True, lora_spec=spec, name="proj"
                )(x)

        class Outer(nn.Module):
            @nn.compact
            def __call__(self, x):
                return Block(name="attentions_0")(x)

        layer = Outer()
        x = jax.random.normal(jax.random.PRNGKey(7), (8, 16), jnp.float32)
        params = layer.init(jax.random.PRNGKey(8), x)["params"]
        inner = dict(params["attentions_0"]["proj"])
        assert "lora_down" in inner, "LoRA must be active in this test"
        # make the LoRA branch non-trivial (up is zeros at init)
        inner["lora_up"] = (
            jax.random.normal(jax.random.PRNGKey(9), inner["lora_up"].shape)
            * 0.1
        )
        params = {"attentions_0": {"proj": inner}}
        return np.asarray(layer.apply({"params": params}, x))

    def test_backends_and_ride_agree(self, monkeypatch):
        ref = self._apply(monkeypatch, backend="xla", fuse="0")
        for backend, fuse in [("split", "0"), ("xla", "1"), ("split", "1")]:
            got = self._apply(monkeypatch, backend=backend, fuse=fuse)
            np.testing.assert_allclose(got, ref, atol=1e-4)
