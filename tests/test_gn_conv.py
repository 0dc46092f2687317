"""Fused GroupNorm+SiLU+conv3x3 kernel (ops/gn_conv.py) — the round-3
"padded-domain resnet" (VERDICT round-2 next-step 1). Kernels execute via
the Pallas interpreter on the CPU test mesh; numerics are pinned against
the unfused XLA composition the kernel replaces."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # Pallas interpret-mode kernels

from leco_tpu.ops import gn_conv


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("LECO_GNCONV_INTERPRET", "1")


def _inputs(b, h, w, cin, cout, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    return (
        jax.random.normal(ks[0], (b, h, w, cin), dtype),
        jax.random.normal(ks[1], (cin,), jnp.float32) * 0.1 + 1.0,
        jax.random.normal(ks[2], (cin,), jnp.float32) * 0.1,
        jax.random.normal(ks[3], (b, cin), jnp.float32),
        jax.random.normal(ks[4], (3, 3, cin, cout), dtype) * 0.05,
        jax.random.normal(ks[5], (cout,), jnp.float32) * 0.1,
    )


class TestKernel:
    @pytest.mark.parametrize(
        "b,h,w,cin,cout,groups",
        [
            (2, 8, 8, 128, 128, 32),
            (1, 16, 16, 128, 256, 32),
            (2, 8, 8, 384, 128, 32),  # non-128-multiple lane handling
            (1, 12, 8, 256, 128, 32),  # H != W
        ],
    )
    def test_matches_unfused_composition(self, b, h, w, cin, cout, groups):
        x, gs, gb, t, w_, b_ = _inputs(b, h, w, cin, cout)
        a, s = gn_conv.affine_from_gn(x, gs, gb, t, groups, 1e-5)
        got = gn_conv.affine_silu_conv(x, a, s, w_, b_)
        want = gn_conv._reference(x, gs, gb, t, w_, b_, groups, 1e-5, True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4
        )

    def test_channel_chunked_accumulation(self, monkeypatch):
        """Wide inputs stream through VMEM-sized weight blocks (nc > 1) —
        the up-block conv1 case the round-2 conv kernel couldn't cover."""
        monkeypatch.setattr(gn_conv, "_VMEM_BUDGET", 2 * 1024 * 1024)
        blocks = gn_conv._pick_blocks(2, 8, 8, 384, 128, 4)
        assert blocks is not None and blocks[1] < 384  # really chunked
        x, gs, gb, t, w_, b_ = _inputs(2, 8, 8, 384, 128)
        a, s = gn_conv.affine_from_gn(x, gs, gb, t, 32, 1e-5)
        got = gn_conv.affine_silu_conv(x, a, s, w_, b_)
        want = gn_conv._conv_reference(x, a, s, w_, b_, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def test_bf16_close_to_reference(self):
        x, gs, gb, t, w_, b_ = _inputs(2, 8, 8, 128, 128, dtype=jnp.bfloat16)
        a, s = gn_conv.affine_from_gn(x, gs, gb, t, 32, 1e-5)
        got = gn_conv.affine_silu_conv(x, a, s, w_, b_)
        want = gn_conv._reference(x, gs, gb, t, w_, b_, 32, 1e-5, True)
        # the fused path rounds at different points (temb folded in fp32 vs
        # the reference's bf16 add) — agreement to bf16 resolution
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(want, np.float32),
            atol=0.03,
            rtol=0.02,
        )

    def test_gradients_match_reference(self):
        x, gs, gb, t, w_, b_ = _inputs(2, 8, 8, 128, 128)

        def fused(x, gs, gb, t, w_, b_):
            a, s = gn_conv.affine_from_gn(x, gs, gb, t, 32, 1e-5)
            return jnp.sum(gn_conv.affine_silu_conv(x, a, s, w_, b_) ** 2)

        def ref(x, gs, gb, t, w_, b_):
            return jnp.sum(
                gn_conv._reference(x, gs, gb, t, w_, b_, 32, 1e-5, True) ** 2
            )

        gf = jax.grad(fused, argnums=(0, 3, 4))(x, gs, gb, t, w_, b_)
        gr = jax.grad(ref, argnums=(0, 3, 4))(x, gs, gb, t, w_, b_)
        for a_, b2 in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b2), atol=2e-4
            )

    def test_unsupported_shape_falls_back(self):
        # thin channels: must route to the XLA reference, same result
        x, gs, gb, t, w_, b_ = _inputs(1, 8, 8, 16, 16)
        assert not gn_conv.supports(x.shape, 16, x.dtype)
        a, s = gn_conv.affine_from_gn(x, gs, gb, t, 4, 1e-5)
        got = gn_conv.affine_silu_conv(x, a, s, w_, b_)
        want = gn_conv._conv_reference(x, a, s, w_, b_, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestResnetIntegration:
    def test_fused_resnet_matches_unfused(self, monkeypatch):
        """Whole tiny-UNet forward with LECO_RESNET_FUSED on vs off.

        The per-conv gate (ResnetBlock2D.fuses) only routes tuned-table
        winners through the kernel, so the tiny model's shapes would take
        the identical unfused composition in both runs — force supports()
        True (+ interpret mode) so the model-level affine-fold, temb-fold,
        and kernel paths are all exercised against the default
        composition."""
        from leco_tpu.lora import merge_params
        from leco_tpu.ops import gn_conv
        from leco_tpu.testing import make_random_bundle

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 32))
        t = jnp.float32(321.0)

        def fwd():
            bundle = make_random_bundle(seed=3)
            p = merge_params(bundle.base_params, bundle.lora_params)
            return bundle.unet.apply({"params": p}, x, t, ctx, None)

        monkeypatch.setenv("LECO_RESNET_FUSED", "0")
        ref = fwd()
        monkeypatch.setenv("LECO_RESNET_FUSED", "1")
        monkeypatch.setenv("LECO_GNCONV_INTERPRET", "1")
        monkeypatch.setattr(
            gn_conv, "supports", lambda shape, cout, dtype: True
        )
        got = fwd()
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4
        )

    def test_param_tree_identical(self, monkeypatch):
        from leco_tpu.testing import make_random_bundle
        from flax.traverse_util import flatten_dict

        monkeypatch.setenv("LECO_RESNET_FUSED", "0")
        b0 = make_random_bundle(seed=3)
        monkeypatch.setenv("LECO_RESNET_FUSED", "1")
        b1 = make_random_bundle(seed=3)
        assert set(flatten_dict(b0.base_params)) == set(
            flatten_dict(b1.base_params)
        )
        assert set(flatten_dict(b0.lora_params)) == set(
            flatten_dict(b1.lora_params)
        )
