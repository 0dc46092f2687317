"""Forward-parity of our Flax CLIP text encoder against the REAL HuggingFace
`transformers` implementation — the exact model class the reference runs
(/root/reference/model_util.py:44-66 loads transformers.CLIPTextModel /
CLIPTextModelWithProjection).

Round-1 verification relied on torch reimplementations written alongside the
Flax code, which cannot catch a shared misunderstanding. Here the weights are
random-initialized by HF itself, converted with `convert.torch_clip_to_flax`,
and last-hidden / hidden_states / pooled / projected outputs must match HF's
to fp32 tolerance (VERDICT round 1, item 2i).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # instantiates HF torch CLIP models

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from leco_tpu.models import convert
from leco_tpu.models.clip import CLIPTextConfig, CLIPTextModel


def _hf_config(**kw):
    base = dict(
        vocab_size=99,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        max_position_embeddings=77,
        hidden_act="quick_gelu",
        # eos != 2 selects HF's first-eos pooling branch — the semantics of
        # every SD-family tokenizer output (pad==eos for SD1, eos unique
        # otherwise). eos==2 (HF legacy argmax pooling) is covered separately.
        eos_token_id=98,
        bos_token_id=97,
        pad_token_id=0,
        projection_dim=24,
        attn_implementation="eager",
    )
    base.update(kw)
    return transformers.CLIPTextConfig(**base)


def _flax_config(hf_cfg, projection_dim=None, num_hidden_layers=None):
    return CLIPTextConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_hidden_layers=(
            hf_cfg.num_hidden_layers
            if num_hidden_layers is None
            else num_hidden_layers
        ),
        num_attention_heads=hf_cfg.num_attention_heads,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        hidden_act=hf_cfg.hidden_act,
        projection_dim=projection_dim,
        eos_token_id=hf_cfg.eos_token_id,
    )


def _ids(hf_cfg, batch=2, seq=77):
    """[BOS] tokens... [EOS] pad... — the shape text_tokenize produces."""
    rng = np.random.default_rng(0)
    ids = np.full((batch, seq), hf_cfg.pad_token_id, dtype=np.int64)
    for b in range(batch):
        n = 5 + 3 * b
        ids[b, 0] = hf_cfg.bos_token_id
        ids[b, 1 : 1 + n] = rng.integers(1, 90, size=n)
        ids[b, 1 + n] = hf_cfg.eos_token_id
    return ids


def _flax_outputs(hf_model, flax_cfg, ids):
    params = convert.torch_clip_to_flax(
        {k: v.numpy() for k, v in hf_model.state_dict().items()},
        num_hidden_layers=flax_cfg.num_hidden_layers,
    )
    model = CLIPTextModel(config=flax_cfg)
    return model.apply({"params": params}, jnp.asarray(ids))


@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_text_model_forward_parity(act):
    hf_cfg = _hf_config(hidden_act=act)
    hf = transformers.CLIPTextModel(hf_cfg).eval()
    ids = _ids(hf_cfg)
    with torch.no_grad():
        out = hf(torch.from_numpy(ids), output_hidden_states=True)

    last, pooled, hidden = _flax_outputs(hf, _flax_config(hf_cfg), ids)

    np.testing.assert_allclose(
        np.asarray(last), out.last_hidden_state.numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), atol=2e-5, rtol=1e-4
    )
    assert len(hidden) == len(out.hidden_states)
    for ours, theirs in zip(hidden, out.hidden_states):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), atol=2e-5, rtol=1e-4
        )


def test_text_model_with_projection_parity():
    """SDXL text_encoder_2 semantics: projected EOS pooled state
    (train_util.py:89-104 uses text_embeds) + penultimate hidden state."""
    hf_cfg = _hf_config(hidden_act="gelu")
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
    ids = _ids(hf_cfg)
    with torch.no_grad():
        out = hf(torch.from_numpy(ids), output_hidden_states=True)

    flax_cfg = _flax_config(hf_cfg, projection_dim=hf_cfg.projection_dim)
    last, pooled, hidden = _flax_outputs(hf, flax_cfg, ids)

    np.testing.assert_allclose(
        np.asarray(pooled), out.text_embeds.numpy(), atol=2e-5, rtol=1e-4
    )
    # SDXL's sequence embedding is the penultimate hidden state
    np.testing.assert_allclose(
        np.asarray(hidden[-2]), out.hidden_states[-2].numpy(), atol=2e-5, rtol=1e-4
    )


def test_clip_skip_truncated_stack_parity():
    """The reference's clip-skip: CLIPTextModel.from_pretrained(...,
    num_hidden_layers=N-(clip_skip-1)) (model_util.py:48). Parity target: an
    HF model actually built with fewer layers carrying the same weights."""
    hf_cfg = _hf_config()
    hf_full = transformers.CLIPTextModel(hf_cfg).eval()

    hf_cfg3 = _hf_config(num_hidden_layers=3)
    hf_trunc = transformers.CLIPTextModel(hf_cfg3).eval()
    # load the first 3 layers (+ embeddings + final LN) of the full model
    sd = {
        k: v
        for k, v in hf_full.state_dict().items()
        if "encoder.layers.3." not in k
    }
    hf_trunc.load_state_dict(sd, strict=True)

    ids = _ids(hf_cfg)
    with torch.no_grad():
        want = hf_trunc(torch.from_numpy(ids))

    flax_cfg = _flax_config(hf_cfg, num_hidden_layers=3)
    last, pooled, _ = _flax_outputs(hf_full, flax_cfg, ids)

    np.testing.assert_allclose(
        np.asarray(last), want.last_hidden_state.numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pooled), want.pooler_output.numpy(), atol=2e-5, rtol=1e-4
    )


def test_legacy_eos2_pooling_equivalence():
    """Real SD1.x text encoders ship eos_token_id=2 (HF's legacy default),
    which routes HF into argmax(input_ids) pooling. With SD tokenizer output
    (pad == eos == highest id) that equals first-eos pooling — prove our
    first-eos rule matches HF's legacy branch on such inputs."""
    hf_cfg = _hf_config(eos_token_id=2)
    hf = transformers.CLIPTextModel(hf_cfg).eval()
    # pad with id 98 (the highest id in the vocab), eos at the same id:
    # mirrors CLIPTokenizer output where pad token == <|endoftext|>
    rng = np.random.default_rng(1)
    ids = np.full((2, 77), 98, dtype=np.int64)
    ids[:, 0] = 97
    ids[0, 1:6] = rng.integers(3, 90, size=5)
    ids[1, 1:10] = rng.integers(3, 90, size=9)
    with torch.no_grad():
        out = hf(torch.from_numpy(ids))

    flax_cfg = _flax_config(hf_cfg)
    flax_cfg = type(flax_cfg)(**{**flax_cfg.__dict__, "eos_token_id": 98})
    _, pooled, _ = _flax_outputs(hf, flax_cfg, ids)
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), atol=2e-5, rtol=1e-4
    )
