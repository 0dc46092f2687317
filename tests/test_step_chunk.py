"""Device-side step chunking (train.step_chunk): K consecutive train steps
run as ONE jitted lax.scan so the host dispatches once per chunk.

The contract under test: at ANY chunk size the training run is equivalent
to the reference-shaped per-step host loop (train_lora.py:141-302) — same
host RNG stream (pair/timestep/bucket draws), same device PRNG stream (the
key splits ride inside the scan in host order), same losses, same metrics
labels, same save cadence and bytes, same EMA, and exact resume."""

import json

import numpy as np
import pytest
from flax.traverse_util import flatten_dict

pytestmark = pytest.mark.slow  # runs real train() loops

from leco_tpu.config import (
    LoggingConfig,
    NetworkConfig,
    OtherConfig,
    PretrainedModelConfig,
    RootConfig,
    SaveConfig,
    TrainConfig,
)
from leco_tpu.prompts import PromptSettings
from leco_tpu.testing import make_random_bundle
from leco_tpu.train.trainer import train


def cfg(tmp_path, iterations, per_steps=100, **train_kw):
    train_kw.setdefault("seed", 0)
    return RootConfig(
        prompts_file="unused.yaml",
        pretrained_model=PretrainedModelConfig(name_or_path="random://tiny"),
        network=NetworkConfig(rank=4, alpha=1.0),
        train=TrainConfig(
            iterations=iterations,
            max_denoising_steps=3,
            lr=1e-3,
            precision="float32",
            **train_kw,
        ),
        save=SaveConfig(name="tiny", path=str(tmp_path), per_steps=per_steps),
        logging=LoggingConfig(),
        other=OtherConfig(),
    )


def read_metrics(tmp_path):
    lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
    return [json.loads(l) for l in lines]


def assert_trees_close(a, b, **kw):
    fa, fb = flatten_dict(a), flatten_dict(b)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_allclose(
            np.asarray(fa[k]), np.asarray(fb[k]), err_msg=str(k), **kw
        )


class TestChunkEquivalence:
    def run_pair(self, tmp_path, iterations, chunk, prompts=None, **kw):
        """One unchunked + one chunked run from identical seeds."""
        prompts = prompts or [
            PromptSettings(target="van gogh", resolution=64, batch_size=1)
        ]
        out = {}
        for label, c in (("ref", 1), ("chunk", chunk)):
            d = tmp_path / label
            bundle = make_random_bundle()
            config = cfg(d, iterations, step_chunk=c, **kw)
            out[label] = (train(config, prompts, bundle), d)
        return out

    def test_single_pair_matches_unchunked(self, tmp_path):
        """chunk=3 over 7 iterations: two scan-3 chunks + a single tail.
        Same losses, labels, and final weights as the per-step loop."""
        out = self.run_pair(tmp_path, iterations=7, chunk=3)
        ref, chunked = out["ref"][0], out["chunk"][0]
        assert len(chunked["losses"]) == 7
        np.testing.assert_allclose(
            chunked["losses"], ref["losses"], rtol=1e-4, atol=1e-6
        )
        assert_trees_close(ref["lora"], chunked["lora"], rtol=1e-4, atol=1e-5)
        m_ref, m_ch = read_metrics(out["ref"][1]), read_metrics(out["chunk"][1])
        assert [r["iteration"] for r in m_ch] == [r["iteration"] for r in m_ref]
        assert [r["timesteps_to"] for r in m_ch] == [
            r["timesteps_to"] for r in m_ref
        ]
        assert [r["lr"] for r in m_ch] == [r["lr"] for r in m_ref]

    def test_save_boundary_split(self, tmp_path):
        """per_steps=3 with chunk=4: chunks must end exactly at iteration 3
        so the periodic save observes the same tree as the per-step loop."""
        from safetensors.numpy import load_file

        out = self.run_pair(tmp_path, iterations=7, chunk=4, per_steps=3)
        ref_d, ch_d = out["ref"][1], out["chunk"][1]
        for d in (ref_d, ch_d):
            assert (d / "tiny_3steps.safetensors").exists()
        a = load_file(ref_d / "tiny_3steps.safetensors")
        b = load_file(ch_d / "tiny_3steps.safetensors")
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_allclose(
                a[k], b[k], rtol=1e-4, atol=1e-5, err_msg=k
            )

    def test_ema_rides_in_scan(self, tmp_path):
        out = self.run_pair(tmp_path, iterations=5, chunk=2, ema_decay=0.9)
        ref, chunked = out["ref"][0], out["chunk"][0]
        assert chunked["ema"] is not None
        assert_trees_close(ref["ema"], chunked["ema"], rtol=1e-4, atol=1e-5)

    def test_multi_pair_dynamic_fallback(self, tmp_path):
        """Mixed pairs + dynamic resolution: chunks form only over matching
        runs, everything else falls back to per-step dispatch — and the
        result still matches the per-step loop exactly (the lookahead
        consumes the host RNG in reference order)."""
        prompts = [
            PromptSettings(target="a", resolution=64, batch_size=1),
            PromptSettings(
                target="b", resolution=128, dynamic_resolution=True, batch_size=1
            ),
        ]
        out = self.run_pair(tmp_path, iterations=8, chunk=3, prompts=prompts)
        ref, chunked = out["ref"][0], out["chunk"][0]
        np.testing.assert_allclose(
            chunked["losses"], ref["losses"], rtol=1e-4, atol=1e-6
        )
        m_ref, m_ch = read_metrics(out["ref"][1]), read_metrics(out["chunk"][1])
        assert [r["timesteps_to"] for r in m_ch] == [
            r["timesteps_to"] for r in m_ref
        ]
        assert [r["resolution"] for r in m_ch] == [
            r["resolution"] for r in m_ref
        ]
        assert_trees_close(ref["lora"], chunked["lora"], rtol=1e-4, atol=1e-5)

    def test_logging_interval_async_drain(self, tmp_path):
        """interval > 1 with chunking: groups drain in order, every record
        keeps its own iteration's labels."""
        bundle = make_random_bundle()
        config = cfg(tmp_path, 7, step_chunk=3)
        config.logging.interval = 4
        result = train(
            config,
            [PromptSettings(target="x", resolution=64, batch_size=1)],
            bundle,
        )
        assert len(result["losses"]) == 7
        m = read_metrics(tmp_path)
        assert [r["iteration"] for r in m] == list(range(7))

    def test_resume_with_lookahead(self, tmp_path):
        """Multi-pair chunked run with snapshots: the lookahead may draw
        past the snapshot boundary, but the stored rng state must replay
        those draws — resumed training reproduces the uninterrupted run."""
        prompts = [
            PromptSettings(target="a", resolution=64, batch_size=1),
            PromptSettings(target="b", resolution=64, batch_size=1),
        ]

        d_full = tmp_path / "full"
        bundle = make_random_bundle()
        full = train(
            cfg(d_full, 8, per_steps=3, step_chunk=3), prompts, bundle
        )

        d_res = tmp_path / "resumed"
        bundle = make_random_bundle()
        train(
            cfg(d_res, 5, per_steps=3, step_chunk=3, save_state=True),
            prompts,
            bundle,
        )  # snapshot lands at iteration 3
        bundle = make_random_bundle()
        resumed = train(
            cfg(
                d_res,
                8,
                per_steps=3,
                step_chunk=3,
                save_state=True,
                resume=True,
            ),
            prompts,
            bundle,
        )
        assert_trees_close(full["lora"], resumed["lora"], rtol=1e-4, atol=1e-5)
        # iterations 4..7 of the resumed run replay the full run's stream
        np.testing.assert_allclose(
            resumed["losses"], full["losses"][4:], rtol=1e-4, atol=1e-6
        )
