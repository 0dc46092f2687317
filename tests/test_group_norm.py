"""Fused GroupNorm(+SiLU) kernel: parity with flax nn.GroupNorm and the XLA
reference; gradient correctness of the custom VJP (interpret mode)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from leco_tpu.ops.group_norm import (
    fused_group_norm,
    group_norm_silu,
    group_norm_silu_ref,
    supports,
)


def _data(b=2, h=8, w=8, c=16, dtype=jnp.float32, seed=0):
    x = jax.random.normal(jax.random.PRNGKey(seed), (b, h, w, c), dtype)
    scale = jax.random.normal(jax.random.PRNGKey(seed + 1), (c,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(seed + 2), (c,)) * 0.1
    return x, scale, bias


class TestRefMatchesFlax:
    def test_matches_nn_groupnorm(self):
        x, scale, bias = _data()
        gn = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=jnp.float32)
        params = {"scale": scale, "bias": bias}
        expected = gn.apply({"params": params}, x)
        got = group_norm_silu_ref(x, scale, bias, 4, 1e-5, with_silu=False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=1e-5
        )

    def test_silu_applied(self):
        x, scale, bias = _data()
        plain = group_norm_silu_ref(x, scale, bias, 4, 1e-5, with_silu=False)
        silu = group_norm_silu_ref(x, scale, bias, 4, 1e-5, with_silu=True)
        np.testing.assert_allclose(
            np.asarray(silu),
            np.asarray(plain * jax.nn.sigmoid(plain.astype(jnp.float32))),
            atol=1e-5,
        )


class TestKernel:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    @pytest.mark.parametrize("with_silu", [False, True])
    def test_kernel_matches_ref(self, dtype, with_silu):
        x, scale, bias = _data(dtype=dtype)
        with pltpu.force_tpu_interpret_mode():
            got = group_norm_silu(x, scale, bias, 4, 1e-5, with_silu)
        ref = group_norm_silu_ref(x, scale, bias, 4, 1e-5, with_silu)
        atol = 1e-2 if dtype == jnp.bfloat16 else 1e-5
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=atol
        )

    def test_grad_matches_ref(self):
        x, scale, bias = _data()

        def f_fused(x, s, b):
            with pltpu.force_tpu_interpret_mode():
                return jnp.sum(fused_group_norm(x, s, b, 4, 1e-5, True) ** 2)

        def f_ref(x, s, b):
            return jnp.sum(group_norm_silu_ref(x, s, b, 4, 1e-5, True) ** 2)

        g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, scale, bias)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)

    def test_supports(self):
        assert supports((1, 64, 64, 320), jnp.bfloat16)
        assert supports((2, 16, 16, 1280), jnp.bfloat16)
        assert not supports((1, 128, 128, 640), jnp.bfloat16)  # > VMEM budget
        assert not supports((1, 64, 64), jnp.bfloat16)


class TestFastVariant:
    @pytest.mark.parametrize("with_silu", [False, True])
    def test_fast_matches_ref_bf16(self, with_silu):
        from leco_tpu.ops.group_norm import group_norm_silu_fast

        x, scale, bias = _data(dtype=jnp.bfloat16, seed=5)
        fast = group_norm_silu_fast(x, scale, bias, 4, 1e-5, with_silu)
        ref = group_norm_silu_ref(x, scale, bias, 4, 1e-5, with_silu)
        np.testing.assert_allclose(
            np.asarray(fast, np.float32), np.asarray(ref, np.float32), atol=2e-2
        )

    def test_fast_grad_finite(self):
        from leco_tpu.ops.group_norm import group_norm_silu_fast

        x, scale, bias = _data(seed=6)
        g = jax.grad(
            lambda x: jnp.sum(group_norm_silu_fast(x, scale, bias, 4, 1e-5) ** 2)
        )(x)
        assert np.isfinite(np.asarray(g)).all()


class TestMXUGroupNorm:
    """group_norm_silu_mxu: group sums via one-hot MXU matmul in the
    natural layout — must match the fp32 reference to ~1 output ulp."""

    @pytest.mark.parametrize("with_silu", [True, False])
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_matches_reference(self, dtype, with_silu):
        from leco_tpu.ops.group_norm import (
            group_norm_silu_mxu,
            group_norm_silu_ref,
        )

        # offset mean + scale stress the E[x^2]-mu^2 form
        x = (
            jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 64)) * 3 + 1.5
        ).astype(dtype)
        sc = jax.random.normal(jax.random.PRNGKey(1), (64,)) * 0.5 + 1.0
        bi = jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.2
        got = group_norm_silu_mxu(x, sc, bi, 8, 1e-5, with_silu)
        want = group_norm_silu_ref(x, sc, bi, 8, 1e-5, with_silu)
        atol = 4e-2 if dtype == jnp.bfloat16 else 1e-5  # ~1 ulp at |y|~4
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), atol=atol
        )

    def test_grads_flow(self):
        from leco_tpu.ops.group_norm import group_norm_silu_mxu

        x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 32))
        sc = jnp.ones((32,))
        bi = jnp.zeros((32,))
        g = jax.grad(
            lambda x: jnp.sum(group_norm_silu_mxu(x, sc, bi, 4, 1e-5) ** 2)
        )(x)
        assert np.isfinite(np.asarray(g)).all()


class TestSumGroupNorm:
    """group_norm_silu_sum: spatial fp32 reductions in the natural layout +
    tiny (b, c) group fold — must match the fp32 reference to ~1 ulp."""

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_matches_reference(self, dtype):
        from leco_tpu.ops.group_norm import (
            group_norm_silu_ref,
            group_norm_silu_sum,
        )

        x = (
            jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 64)) * 3 + 1.5
        ).astype(dtype)
        sc = jax.random.normal(jax.random.PRNGKey(1), (64,)) * 0.5 + 1.0
        bi = jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.2
        got = group_norm_silu_sum(x, sc, bi, 8, 1e-5)
        want = group_norm_silu_ref(x, sc, bi, 8, 1e-5)
        atol = 4e-2 if dtype == jnp.bfloat16 else 1e-5
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), atol=atol
        )
