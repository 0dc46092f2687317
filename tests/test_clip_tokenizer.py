"""CLIP text encoder + BPE tokenizer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leco_tpu.models.clip import (
    CLIPTextModel,
    sd1_text_config,
    sd2_text_config,
    sdxl_text2_config,
    tiny_text_config,
)
from leco_tpu.models.tokenizer import CLIPTokenizer, make_tiny_tokenizer


class TestCLIPModel:
    def _run(self, cfg, ids=None):
        model = CLIPTextModel(config=cfg)
        ids = (
            jnp.asarray(ids)
            if ids is not None
            else jnp.full((2, 77), 5, jnp.int32).at[:, 0].set(1)
        )
        params = model.init(jax.random.PRNGKey(0), ids)["params"]
        return model, params, ids

    def test_shapes(self):
        cfg = tiny_text_config()
        model, params, ids = self._run(cfg)
        last, pooled, hidden = model.apply({"params": params}, ids)
        assert last.shape == (2, 77, cfg.hidden_size)
        assert pooled.shape == (2, cfg.hidden_size)
        assert len(hidden) == cfg.num_hidden_layers + 1

    def test_projection(self):
        cfg = tiny_text_config(projection_dim=16)
        model, params, ids = self._run(cfg)
        _, pooled, _ = model.apply({"params": params}, ids)
        assert pooled.shape == (2, 16)

    def test_causal_mask(self):
        """Changing a later token must not affect earlier positions."""
        cfg = tiny_text_config()
        model, params, ids = self._run(cfg)
        ids2 = ids.at[:, 50].set(7)
        h1, _, _ = model.apply({"params": params}, ids)
        h2, _, _ = model.apply({"params": params}, ids2)
        np.testing.assert_allclose(
            np.asarray(h1[:, :50]), np.asarray(h2[:, :50]), atol=1e-5
        )
        assert not np.allclose(np.asarray(h1[:, 50:]), np.asarray(h2[:, 50:]))

    def test_eos_pooling(self):
        """pooled output must come from the first EOS position."""
        cfg = tiny_text_config()
        model = CLIPTextModel(config=cfg)
        ids = jnp.full((1, 77), 5, jnp.int32)
        ids = ids.at[0, 9].set(cfg.eos_token_id)
        params = model.init(jax.random.PRNGKey(0), ids)["params"]
        last, pooled, _ = model.apply({"params": params}, ids)
        np.testing.assert_allclose(
            np.asarray(pooled[0]), np.asarray(last[0, 9]), atol=1e-6
        )

    def test_param_counts_sd1(self):
        """123M params for the SD1.x text encoder (CLIP ViT-L/14 text)."""
        cfg = sd1_text_config()
        model = CLIPTextModel(config=cfg)
        ids = jax.ShapeDtypeStruct((1, 77), jnp.int32)
        variables = jax.eval_shape(
            lambda i: model.init(jax.random.PRNGKey(0), i), ids
        )
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"]))
        assert n == 123_060_480, f"got {n:,}"

    def test_configs(self):
        assert sd2_text_config().num_hidden_layers == 23
        assert sd2_text_config().hidden_size == 1024
        assert sdxl_text2_config().projection_dim == 1280
        assert sdxl_text2_config().num_hidden_layers == 32

    def test_clip_skip_arithmetic(self):
        # model_util.py:48,62: num_hidden_layers = N - (clip_skip - 1)
        assert sd2_text_config(24 - (2 - 1)).num_hidden_layers == 23
        assert sd1_text_config(12 - (2 - 1)).num_hidden_layers == 11


class TestTokenizer:
    def test_tiny_vocab_roundtrip(self):
        tok = make_tiny_tokenizer(["van", "gogh", "cat", "ears"])
        ids = tok(["van gogh"])
        assert ids.shape == (1, 77)
        assert ids[0, 0] == tok.bos_token_id
        # two word tokens then eos
        assert ids[0, 3] == tok.eos_token_id
        assert ids[0, 4] == tok.pad_token_id  # pad == eos by default

    def test_batch_and_truncation(self):
        tok = make_tiny_tokenizer(["a", "b"])
        long_prompt = " ".join(["a"] * 200)
        ids = tok([long_prompt, "b"])
        assert ids.shape == (2, 77)
        assert ids[0, -1] == tok.eos_token_id  # truncated: eos still present
        assert ids[0, 76] == tok.eos_token_id

    def test_pad_token_override(self):
        """SDXL tokenizer_2 pads with id 0 (model_util.py:150)."""
        tok = make_tiny_tokenizer(["x"])
        tok.pad_token_id = 0
        ids = tok(["x"])
        assert ids[0, 3] == 0

    def test_lowercase_and_whitespace(self):
        tok = make_tiny_tokenizer(["van", "gogh"])
        a = tok(["Van   Gogh"])
        b = tok(["van gogh"])
        np.testing.assert_array_equal(a, b)

    def test_from_pretrained(self, tmp_path):
        import json

        tok0 = make_tiny_tokenizer(["hello", "world"])
        d = tmp_path / "tokenizer"
        d.mkdir()
        (d / "vocab.json").write_text(json.dumps(tok0.vocab))
        merges = [" ".join(m) for m in sorted(tok0.bpe_ranks, key=tok0.bpe_ranks.get)]
        (d / "merges.txt").write_text("#version\n" + "\n".join(merges))
        tok = CLIPTokenizer.from_pretrained(str(tmp_path))
        np.testing.assert_array_equal(tok(["hello world"]), tok0(["hello world"]))
