"""LoRA overlay: targeting parity, init distributions, multiplier semantics,
and A1111-AddNet export layout (reference lora.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from leco_tpu.lora import (
    LoRASpec,
    count_lora_modules,
    export_lora_state,
    load_lora_weights,
    lora_module_names,
    merge_params,
    save_lora_weights,
    scale_lora_tree,
    split_lora_params,
)
from leco_tpu.models.unet import UNet2DConditionModel, sd15_config, tiny_unet_config


def init_tiny(spec):
    cfg = tiny_unet_config()
    model = UNet2DConditionModel(config=cfg, lora_spec=spec)
    sample = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
    variables = model.init(jax.random.PRNGKey(0), sample, 0, ctx)
    return model, variables["params"], sample, ctx


def _sd15_lora_count(spec):
    cfg = sd15_config()
    model = UNet2DConditionModel(config=cfg, lora_spec=spec)
    sample = jax.ShapeDtypeStruct((1, 8, 8, 4), jnp.float32)
    ctx = jax.ShapeDtypeStruct((1, 77, 768), jnp.float32)
    variables = jax.eval_shape(
        lambda s, c: model.init(jax.random.PRNGKey(0), s, 0, c), sample, ctx
    )
    _, lora = split_lora_params(variables["params"])
    return count_lora_modules(lora)


class TestTargeting:
    def test_sd15_lierla_full_count(self):
        """16 Transformer2DModels x (proj_in + proj_out + 4 attn1 + 4 attn2
        + 2 ff) = 192 modules — what the reference's
        'create LoRA for U-Net: N modules.' prints for SD1.5 lierla/full."""
        assert _sd15_lora_count(LoRASpec(network_type="lierla")) == 192

    def test_sd15_xattn_count(self):
        """xattn (ESD-x): only attn2 to_q/k/v/out -> 16 x 4 = 64 (the
        *intended* reference semantics; see docs/QUIRKS.md)."""
        assert _sd15_lora_count(LoRASpec(train_method="xattn")) == 64

    def test_sd15_selfattn_count(self):
        assert _sd15_lora_count(LoRASpec(train_method="selfattn")) == 64

    def test_sd15_noxattn_count(self):
        assert _sd15_lora_count(LoRASpec(train_method="noxattn")) == 192 - 64

    def test_sd15_c3lier_full_count(self):
        """+ 22 resnets x (conv1, conv2, time_emb_proj) + 14 conv_shortcuts
        + 3 downsamplers + 3 upsamplers = 278."""
        assert _sd15_lora_count(LoRASpec(network_type="c3lier")) == 278

    def test_matches_rules(self):
        spec = LoRASpec(network_type="lierla", train_method="full")
        yes = ("down_blocks_0", "attentions_0", "transformer_blocks_0", "attn1", "to_q")
        no = ("down_blocks_0", "resnets_0", "conv1")
        assert spec.matches(yes)
        assert not spec.matches(no)
        spec_c = LoRASpec(network_type="c3lier")
        assert spec_c.matches(no)
        assert spec_c.matches(("mid_block", "resnets_1", "time_emb_proj"))
        assert spec_c.matches(("up_blocks_0", "upsamplers_0", "conv"))
        assert not spec_c.matches(("time_embedding", "linear_1"))
        assert not spec_c.matches(("conv_in",))

    def test_xattn_excludes_attn1(self):
        spec = LoRASpec(train_method="xattn")
        attn1 = ("down_blocks_0", "attentions_0", "transformer_blocks_0", "attn1", "to_q")
        attn2 = ("down_blocks_0", "attentions_0", "transformer_blocks_0", "attn2", "to_q")
        ff = ("down_blocks_0", "attentions_0", "transformer_blocks_0", "ff", "net_2")
        assert not spec.matches(attn1)
        assert spec.matches(attn2)
        assert not spec.matches(ff)


class TestInitAndApply:
    def test_up_zero_init_means_identity(self):
        """With freshly-initialized LoRA (up == 0), base|lora apply must
        equal base-only apply — the reference's empty-LoRA-off semantics."""
        spec = LoRASpec(rank=4, alpha=1.0)
        model, params, sample, ctx = init_tiny(spec)
        base, lora = split_lora_params(params)
        assert count_lora_modules(lora) > 0
        out_base = model.apply({"params": base}, sample, 10, ctx)
        out_merged = model.apply({"params": merge_params(base, lora)}, sample, 10, ctx)
        # atol: the ride-along fusion (lora._lora_ride_along) widens the
        # base GEMM by r columns, which may retile/reassociate the fp32
        # reduction — identity holds to reassociation tolerance, not bitwise
        np.testing.assert_allclose(
            np.asarray(out_base), np.asarray(out_merged), atol=1e-4
        )

    def test_nonzero_up_changes_output(self):
        spec = LoRASpec(rank=4, alpha=1.0)
        model, params, sample, ctx = init_tiny(spec)
        base, lora = split_lora_params(params)
        lora = jax.tree.map(lambda x: jnp.ones_like(x) * 0.05, lora)
        out_base = model.apply({"params": base}, sample, 10, ctx)
        out_on = model.apply({"params": merge_params(base, lora)}, sample, 10, ctx)
        assert not np.allclose(np.asarray(out_base), np.asarray(out_on))

    def test_multiplier_zero_equals_off(self):
        """scale_lora_tree(lora, 0.0) == base-only (multiplier toggle,
        reference lora.py:231-237)."""
        spec = LoRASpec(rank=4, alpha=1.0)
        model, params, sample, ctx = init_tiny(spec)
        base, lora = split_lora_params(params)
        lora = jax.tree.map(lambda x: jnp.ones_like(x) * 0.05, lora)
        off = scale_lora_tree(lora, 0.0)
        out_base = model.apply({"params": base}, sample, 10, ctx)
        out_off = model.apply({"params": merge_params(base, off)}, sample, 10, ctx)
        # atol 1e-4: ride-along reassociation, see test_up_zero_init_means_identity
        np.testing.assert_allclose(
            np.asarray(out_base), np.asarray(out_off), atol=1e-4
        )

    def test_multiplier_linearity_single_layer(self):
        """Per-layer the contribution is linear in the multiplier (the
        reference's `lora_up(lora_down(x)) * multiplier * scale`,
        lora.py:102-106). End-to-end composition is NOT linear in a global
        multiplier — in either framework — so test one layer."""
        from leco_tpu.lora import LoRADense

        spec = LoRASpec(rank=2, alpha=1.0, train_method="full")
        layer = LoRADense(features=8, lora_spec=spec)
        x = jax.random.normal(jax.random.PRNGKey(0), (3, 8))
        # name the layer so its path matches the targeting rule
        import flax.linen as nn

        class Wrap(nn.Module):
            @nn.compact
            def __call__(self, x):
                return LoRADense(features=8, lora_spec=spec, name="attentions_0")(x)

        model = Wrap()
        params = model.init(jax.random.PRNGKey(1), x)["params"]
        base, lora = split_lora_params(params)
        lora = jax.tree.map(
            lambda v: jax.random.normal(jax.random.PRNGKey(2), v.shape) * 0.1, lora
        )
        out0 = np.asarray(model.apply({"params": base}, x))
        out1 = np.asarray(
            model.apply({"params": merge_params(base, scale_lora_tree(lora, 1.0))}, x)
        )
        out2 = np.asarray(
            model.apply({"params": merge_params(base, scale_lora_tree(lora, 2.0))}, x)
        )
        outm1 = np.asarray(
            model.apply({"params": merge_params(base, scale_lora_tree(lora, -1.0))}, x)
        )
        np.testing.assert_allclose(out2 - out0, 2 * (out1 - out0), atol=1e-5)
        np.testing.assert_allclose(outm1 - out0, -(out1 - out0), atol=1e-5)

    def test_kaiming_down_bounds(self):
        spec = LoRASpec(rank=4, alpha=1.0)
        _, params, _, _ = init_tiny(spec)
        _, lora = split_lora_params(params)
        for k, v in flatten_dict(lora).items():
            v = np.asarray(v)
            if k[-1] == "lora_down":
                fan_in = np.prod(v.shape[:-1])
                bound = 1.0 / np.sqrt(fan_in)
                assert np.abs(v).max() <= bound + 1e-7
                assert np.abs(v).std() > 0
            else:
                assert np.all(v == 0)


class TestExport:
    def _lora(self, spec):
        _, params, _, _ = init_tiny(spec)
        _, lora = split_lora_params(params)
        return lora

    def test_key_layout(self):
        spec = LoRASpec(rank=4, alpha=1.0)
        lora = self._lora(spec)
        state = export_lora_state(lora, spec)
        names = lora_module_names(lora)
        assert all(n.startswith("lora_unet_") for n in names)
        for n in names:
            assert f"{n}.lora_down.weight" in state
            assert f"{n}.lora_up.weight" in state
            assert f"{n}.alpha" in state
        # one known key, dense layout (out, in)/(in,) torch-style
        key = "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        down = state[f"{key}.lora_down.weight"]
        up = state[f"{key}.lora_up.weight"]
        assert down.shape == (4, 8)  # (rank, in_features)
        assert up.shape == (8, 4)  # (out_features, rank)
        assert float(state[f"{key}.alpha"]) == 1.0

    def test_conv_layout(self):
        spec = LoRASpec(rank=4, alpha=1.0, network_type="c3lier")
        lora = self._lora(spec)
        state = export_lora_state(lora, spec)
        key = "lora_unet_down_blocks_0_resnets_0_conv1"
        down = state[f"{key}.lora_down.weight"]
        up = state[f"{key}.lora_up.weight"]
        # rank clamped to min(4, in=8, out=8) = 4
        assert down.shape == (4, 8, 3, 3)  # (r, in, kh, kw)
        assert up.shape == (8, 4, 1, 1)  # (out, r, 1, 1)

    def test_alpha_fallback_to_rank(self):
        spec = LoRASpec(rank=4, alpha=0.0)
        lora = self._lora(spec)
        state = export_lora_state(lora, spec)
        key = next(iter(lora_module_names(lora)))
        assert float(state[f"{key}.alpha"]) == 4.0

    def test_save_load_roundtrip(self, tmp_path):
        spec = LoRASpec(rank=4, alpha=1.0)
        lora = self._lora(spec)
        lora = jax.tree.map(
            lambda x: jax.random.normal(jax.random.PRNGKey(3), x.shape), lora
        )
        f = tmp_path / "test.safetensors"
        save_lora_weights(f, lora, spec, metadata={"framework": "leco-tpu"})
        loaded = load_lora_weights(f, lora)
        for (k1, v1), (k2, v2) in zip(
            sorted(flatten_dict(lora).items()),
            sorted(flatten_dict(loaded).items()),
        ):
            assert k1 == k2
            np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)

    def test_save_dtype(self, tmp_path):
        spec = LoRASpec(rank=4, alpha=1.0)
        lora = self._lora(spec)
        state = export_lora_state(lora, spec, save_dtype=np.float16)
        assert all(v.dtype == np.float16 for v in state.values())


class TestGradientFlow:
    def test_grad_only_through_lora(self):
        spec = LoRASpec(rank=2, alpha=1.0)
        model, params, sample, ctx = init_tiny(spec)
        base, lora = split_lora_params(params)

        def loss_fn(lora_p):
            out = model.apply(
                {"params": merge_params(base, lora_p)}, sample, 10, ctx
            )
            return jnp.mean(out.astype(jnp.float32) ** 2)

        # jit: one compiled backward instead of op-by-op eager dispatch
        # (~85 s -> seconds on the CPU mesh)
        grads = jax.jit(jax.grad(loss_fn))(lora)
        flat = flatten_dict(grads)
        assert len(flat) > 0
        # down grads are zero at init (up == 0 blocks the path), up grads not
        up_norms = [
            float(jnp.abs(v).sum()) for k, v in flat.items() if k[-1] == "lora_up"
        ]
        assert any(n > 0 for n in up_norms)

    def test_ride_suspension_preserves_grads(self):
        """ride_along_suspended() must not change gradients — it only
        changes the GEMM form autodiff differentiates through (the concat
        form materializes a full-width cotangent GEMM; round-4 HLO comm
        extraction). fp32 grads must agree to float tolerance."""
        from leco_tpu.lora import ride_along_suspended

        spec = LoRASpec(rank=2, alpha=1.0)
        model, params, sample, ctx = init_tiny(spec)
        base, lora = split_lora_params(params)
        # randomize lora so both branches carry signal
        lora = jax.tree.map(
            lambda v: v + 0.05 * jax.random.normal(
                jax.random.PRNGKey(7), v.shape, v.dtype
            ),
            lora,
        )

        def loss_fn(lora_p, suspend):
            import contextlib

            cm = ride_along_suspended() if suspend else contextlib.nullcontext()
            with cm:
                out = model.apply(
                    {"params": merge_params(base, lora_p)}, sample, 10, ctx
                )
            return jnp.mean(out.astype(jnp.float32) ** 2)

        # suspend toggles a Python-level context read at trace time, so it
        # must stay a static (non-traced) argument of two separate jits
        g_ride = jax.jit(jax.grad(lambda p: loss_fn(p, False)))(lora)
        g_susp = jax.jit(jax.grad(lambda p: loss_fn(p, True)))(lora)
        for k in flatten_dict(g_ride):
            np.testing.assert_allclose(
                np.asarray(flatten_dict(g_ride)[k]),
                np.asarray(flatten_dict(g_susp)[k]),
                atol=1e-5, rtol=1e-4,
            )


class TestConsumerSemantics:
    """The exported tensors must produce the same math in external consumers
    (A1111 AddNet / kohya merge): effective delta_W = up @ down * alpha/rank
    in torch layout applied to the base weight."""

    def test_dense_export_matches_weight_merge(self):
        import flax.linen as nn

        from leco_tpu.lora import LoRADense

        spec = LoRASpec(rank=2, alpha=1.0, train_method="full")

        class Wrap(nn.Module):
            @nn.compact
            def __call__(self, x):
                return LoRADense(features=8, lora_spec=spec, name="attentions_0")(x)

        model = Wrap()
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
        params = model.init(jax.random.PRNGKey(1), x)["params"]
        base, lora = split_lora_params(params)
        lora = jax.tree.map(
            lambda v: jax.random.normal(jax.random.PRNGKey(2), v.shape) * 0.1, lora
        )
        out_lora = np.asarray(
            model.apply({"params": merge_params(base, lora)}, x)
        )

        # external-consumer math: W' = W + up @ down * alpha/rank (torch layout)
        state = export_lora_state(lora, spec)
        key = "lora_unet_attentions_0"
        up = state[f"{key}.lora_up.weight"]  # (out, r)
        down = state[f"{key}.lora_down.weight"]  # (r, in)
        alpha = float(state[f"{key}.alpha"])
        rank = down.shape[0]
        w_torch = np.asarray(base["attentions_0"]["kernel"]).T  # (out, in)
        w_merged = w_torch + up @ down * (alpha / rank)
        out_merged = np.asarray(x) @ w_merged.T + np.asarray(
            base["attentions_0"]["bias"]
        )
        np.testing.assert_allclose(out_lora, out_merged, atol=1e-5)

    def test_import_rescales_foreign_alpha(self, tmp_path):
        """A file exported with alpha=4 loaded into a spec with alpha=1 must
        reproduce the file's effective contribution (factor 4 on the ups)."""
        spec_export = LoRASpec(rank=4, alpha=4.0)
        spec_import = LoRASpec(rank=4, alpha=1.0)
        _, params, _, _ = init_tiny(spec_export)
        _, lora = split_lora_params(params)
        lora = jax.tree.map(
            lambda v: jax.random.normal(jax.random.PRNGKey(9), v.shape), lora
        )
        f = tmp_path / "foreign.safetensors"
        save_lora_weights(f, lora, spec_export)
        loaded = load_lora_weights(f, lora, spec=spec_import)
        for k, v in flatten_dict(loaded).items():
            orig = np.asarray(flatten_dict(lora)[k])
            got = np.asarray(v)
            if k[-1] == "lora_up":
                np.testing.assert_allclose(got, orig * 4.0, rtol=1e-5)
            else:
                np.testing.assert_allclose(got, orig, rtol=1e-5)


class TestPhaseConvUpsample:
    """Upsample2D's conv with pre_upsample=True must equal
    upsample2x_nearest followed by the plain 3x3 conv, exactly (the
    phase-conv form is a pure re-indexing; see LoRAConv._phase_conv_up2x)."""

    def test_matches_materialized_upsample(self):
        import jax
        import jax.numpy as jnp
        from leco_tpu.lora import LoRAConv, upsample2x_nearest

        for shape, co in [((2, 8, 8, 16), 24), ((1, 5, 7, 8), 8)]:
            x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
            ref = LoRAConv(co, (3, 3), padding=((1, 1), (1, 1)))
            params = ref.init(jax.random.PRNGKey(1), upsample2x_nearest(x))[
                "params"
            ]
            want = ref.apply({"params": params}, upsample2x_nearest(x))
            ph = LoRAConv(
                co, (3, 3), padding=((1, 1), (1, 1)), pre_upsample=True
            )
            got = ph.apply({"params": params}, x)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-5
            )


class TestFoldLora:
    """fold_lora_params (the per-iteration inner-loop merge) must equal the
    branch form through the real model, for both lierla (dense) and c3lier
    (conv + dense), with non-zero lora_up."""

    @pytest.mark.parametrize("network_type", ["lierla", "c3lier"])
    def test_matches_branch_form(self, network_type):
        import jax

        from leco_tpu.lora import fold_lora_params

        spec = LoRASpec(rank=2, alpha=1.0, network_type=network_type)
        model, params, sample, ctx = init_tiny(spec)
        base, lora = split_lora_params(params)
        # non-trivial branch: randomize every lora_up
        from flax.traverse_util import flatten_dict, unflatten_dict

        flat = flatten_dict(lora)
        keys = jax.random.split(jax.random.PRNGKey(3), len(flat))
        flat = {
            k: (
                jax.random.normal(kk, v.shape, v.dtype) * 0.05
                if k[-1] == "lora_up"
                else v
            )
            for kk, (k, v) in zip(keys, sorted(flat.items()))
        }
        lora = unflatten_dict(flat)

        sample = jax.random.normal(jax.random.PRNGKey(4), sample.shape)
        branch = model.apply({"params": merge_params(base, lora)}, sample, 10, ctx)
        folded_tree = fold_lora_params(base, lora, spec)
        # folded tree has base structure only (no lora leaves)
        assert not any(
            k[-1].startswith("lora_") for k in flatten_dict(folded_tree)
        )
        folded = model.apply({"params": folded_tree}, sample, 10, ctx)
        np.testing.assert_allclose(
            np.asarray(folded), np.asarray(branch), atol=2e-4
        )
