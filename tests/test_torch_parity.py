"""Cross-validation against torch's CANONICAL ops (torch is CPU-only here).

These tests don't compare against our own reimplementations — they compare
our JAX ops + weight-conversion layout against torch.nn primitives, which is
what the reference model actually ran on. This pins down:
  * conv kernel layout/orientation (cross-correlation, (out,in,kh,kw) ->
    (kh,kw,in,out), NCHW -> NHWC),
  * linear transpose,
  * GroupNorm statistics/eps semantics,
  * exact (erf) GELU vs quick-GELU,
  * softmax attention math.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


class TestConvParity:
    def test_conv3x3_matches_torch(self):
        """lax conv with converted weights == torch F.conv2d."""
        from jax import lax

        rng = np.random.RandomState(0)
        x_nchw = rng.randn(2, 8, 16, 16).astype(np.float32)
        w_torch = rng.randn(12, 8, 3, 3).astype(np.float32)
        b = rng.randn(12).astype(np.float32)

        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x_nchw), torch.from_numpy(w_torch),
            torch.from_numpy(b), padding=1,
        ).numpy()

        x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
        w_flax = jnp.asarray(w_torch.transpose(2, 3, 1, 0))  # convert.py rule
        out = lax.conv_general_dilated(
            x_nhwc, w_flax, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(b)
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4
        )

    def test_strided_conv_matches_torch(self):
        """Downsample2D semantics: stride 2, pad 1."""
        from jax import lax

        rng = np.random.RandomState(1)
        x = rng.randn(1, 4, 8, 8).astype(np.float32)
        w = rng.randn(6, 4, 3, 3).astype(np.float32)
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1
        ).numpy()
        out = lax.conv_general_dilated(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(w.transpose(2, 3, 1, 0)),
            (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4
        )


class TestNormParity:
    def test_group_norm_matches_torch(self):
        from leco_tpu.ops.group_norm import group_norm_silu_ref

        rng = np.random.RandomState(2)
        x_nchw = rng.randn(2, 8, 4, 4).astype(np.float32)
        w = rng.randn(8).astype(np.float32)
        b = rng.randn(8).astype(np.float32)
        gn = torch.nn.GroupNorm(4, 8, eps=1e-5)
        with torch.no_grad():
            gn.weight.copy_(torch.from_numpy(w))
            gn.bias.copy_(torch.from_numpy(b))
        ref = gn(torch.from_numpy(x_nchw)).detach().numpy()

        out = group_norm_silu_ref(
            jnp.asarray(x_nchw.transpose(0, 2, 3, 1)),
            jnp.asarray(w), jnp.asarray(b), 4, 1e-5, with_silu=False,
        )
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5
        )

    def test_layer_norm_matches_torch(self):
        import flax.linen as nn

        rng = np.random.RandomState(3)
        x = rng.randn(2, 7, 16).astype(np.float32)
        ln_t = torch.nn.LayerNorm(16, eps=1e-5)
        ref = ln_t(torch.from_numpy(x)).detach().numpy()
        ln_j = nn.LayerNorm(epsilon=1e-5)
        params = {
            "scale": jnp.asarray(ln_t.weight.detach().numpy()),
            "bias": jnp.asarray(ln_t.bias.detach().numpy()),
        }
        out = ln_j.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


class TestActivationParity:
    def test_exact_gelu(self):
        """GEGLU uses erf GELU (torch default), NOT the tanh approximation."""
        import flax.linen as nn

        x = np.linspace(-4, 4, 101, dtype=np.float32)
        ref = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
        got = np.asarray(nn.gelu(jnp.asarray(x), approximate=False))
        np.testing.assert_allclose(got, ref, atol=1e-6)
        approx = np.asarray(nn.gelu(jnp.asarray(x), approximate=True))
        assert not np.allclose(approx, ref, atol=1e-6)  # they do differ

    def test_quick_gelu(self):
        """SD1 CLIP uses quick_gelu = x * sigmoid(1.702 x)."""
        from leco_tpu.models.clip import _act

        x = np.linspace(-4, 4, 101, dtype=np.float32)
        ref = (torch.from_numpy(x) * torch.sigmoid(1.702 * torch.from_numpy(x))).numpy()
        got = np.asarray(_act("quick_gelu")(jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_silu(self):
        import flax.linen as nn

        x = np.linspace(-4, 4, 101, dtype=np.float32)
        ref = torch.nn.functional.silu(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(
            np.asarray(nn.silu(jnp.asarray(x))), ref, atol=1e-6
        )


class TestAttentionParity:
    def test_sdpa_matches(self):
        """multi_head_attention == torch scaled_dot_product_attention."""
        from leco_tpu.ops.attention import multi_head_attention

        rng = np.random.RandomState(4)
        b, n, h, d = 2, 16, 2, 8
        q = rng.randn(b, n, h * d).astype(np.float32)
        k = rng.randn(b, n, h * d).astype(np.float32)
        v = rng.randn(b, n, h * d).astype(np.float32)

        def t(x):  # (B, N, H*D) -> (B, H, N, D)
            return torch.from_numpy(x).reshape(b, n, h, d).permute(0, 2, 1, 3)

        ref = (
            torch.nn.functional.scaled_dot_product_attention(t(q), t(k), t(v))
            .permute(0, 2, 1, 3)
            .reshape(b, n, h * d)
            .numpy()
        )
        got = np.asarray(
            multi_head_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), num_heads=h
            )
        )
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestLinearParity:
    def test_dense_transpose(self):
        import flax.linen as nn

        rng = np.random.RandomState(5)
        x = rng.randn(3, 8).astype(np.float32)
        lin = torch.nn.Linear(8, 16)
        ref = lin(torch.from_numpy(x)).detach().numpy()
        params = {
            "kernel": jnp.asarray(lin.weight.detach().numpy().T),
            "bias": jnp.asarray(lin.bias.detach().numpy()),
        }
        out = nn.Dense(16).apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
