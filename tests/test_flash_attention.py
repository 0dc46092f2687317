"""Pallas flash-attention kernel: numerical parity with the XLA path and
gradient correctness (interpret mode on CPU; the real-TPU path is exercised
by bench.py and the TPU smoke script)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # Pallas interpret-mode kernels
from jax.experimental.pallas import tpu as pltpu

from leco_tpu.ops.attention import _xla_attention, multi_head_attention
from leco_tpu.ops.flash_attention import flash_attention, supports


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


class TestSupports:
    def test_sd_shapes(self):
        assert supports(4096, 4096)
        assert supports(1024, 1024)
        assert supports(256, 256)
        assert supports(3136, 3136)  # 448px bucket
        assert not supports(64, 64)  # tiny levels -> XLA
        assert not supports(4096, 77)  # cross-attn stays on XLA (measured)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("n,nk,heads,d", [(256, 256, 2, 40), (512, 512, 4, 64),
                                          (512, 77, 2, 40)])
def test_forward_matches_xla(n, nk, heads, d, dtype):
    q = _rand((1, n, heads, d), 0, dtype)
    k = _rand((1, nk, heads, d), 1, dtype)
    v = _rand((1, nk, heads, d), 2, dtype)
    scale = d**-0.5
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, scale)
    ref = _xla_attention(q, k, v, scale, upcast=True)
    atol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=atol
    )


@pytest.mark.parametrize("bwd", ["pallas", "xla"])
@pytest.mark.parametrize("n,nk,h,d", [(256, 256, 2, 32), (512, 77, 2, 40)])
def test_grad_matches_xla(n, nk, h, d, bwd, monkeypatch):
    """Both backward paths (Pallas kernels and the XLA recompute fallback)
    against autodiff through the reference attention."""
    monkeypatch.setenv("LECO_FLASH_BWD", bwd)
    if nk != n:
        monkeypatch.setenv("LECO_FLASH_CROSS", "1")
    q = _rand((1, n, h, d), 3)
    k = _rand((1, nk, h, d), 4)
    v = _rand((1, nk, h, d), 5)
    scale = d**-0.5

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale, upcast=True) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_multi_head_attention_backend_dispatch():
    """backend='flash' on unsupported shapes silently falls back to XLA."""
    q = _rand((2, 64, 2, 16), 6)
    k = _rand((2, 77, 2, 16), 7)
    v = _rand((2, 77, 2, 16), 8)
    out = multi_head_attention(
        q.reshape(2, 64, 32), k.reshape(2, 77, 32), v.reshape(2, 77, 32),
        num_heads=2, backend="flash",
    )
    ref = multi_head_attention(
        q.reshape(2, 64, 32), k.reshape(2, 77, 32), v.reshape(2, 77, 32),
        num_heads=2, backend="xla",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
