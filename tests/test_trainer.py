"""End-to-end training loop on the tiny UNet (CPU): the SURVEY.md section 4
"fake model" strategy. Covers: full train() with save cadence, loss
finiteness, LoRA actually updating, erase vs enhance signs, every scheduler
kind through the fori_loop sampler, and optimizer/LR factories."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # runs real train() loops
from flax.traverse_util import flatten_dict

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
from leco_tpu.train.optim import get_lr_schedule, get_optimizer, parse_optimizer_args
from leco_tpu.train.trainer import build_pack, encode_prompt_pairs, train


def tiny_config(tmp_path, iterations=3, **train_kw):
    return RootConfig(
        prompts_file="unused.yaml",
        pretrained_model=PretrainedModelConfig(name_or_path="random://tiny"),
        network=NetworkConfig(rank=4, alpha=1.0),
        train=TrainConfig(
            iterations=iterations,
            max_denoising_steps=3,
            lr=1e-3,
            seed=0,
            precision="float32",
            **train_kw,
        ),
        save=SaveConfig(name="tiny", path=str(tmp_path), per_steps=2),
        logging=LoggingConfig(),
        other=OtherConfig(),
    )


def tiny_prompts(**kw):
    defaults = dict(target="van gogh", resolution=64, batch_size=1)
    defaults.update(kw)
    return [PromptSettings(**defaults)]


class TestEndToEnd:
    def test_train_runs_and_saves(self, tmp_path):
        bundle = make_random_bundle()
        config = tiny_config(tmp_path, iterations=3)
        result = train(config, tiny_prompts(), bundle)
        assert len(result["losses"]) == 3
        assert all(np.isfinite(l) for l in result["losses"])
        # periodic save at i==2? per_steps=2 -> i=2 == iterations-1 so only last
        final = tmp_path / "tiny_last.safetensors"
        assert final.exists()
        # the export is loadable and has the right key layout
        from safetensors.numpy import load_file

        state = load_file(final)
        assert any(k.endswith(".lora_down.weight") for k in state)
        assert any(k.endswith(".alpha") for k in state)

    def test_lora_params_change(self, tmp_path):
        bundle = make_random_bundle()
        before = jax.tree.map(np.asarray, bundle.lora_params)
        config = tiny_config(tmp_path, iterations=2)
        result = train(config, tiny_prompts(), bundle)
        after = result["lora"]
        changed = False
        for (k, b), (_, a) in zip(
            sorted(flatten_dict(before).items()),
            sorted(flatten_dict(after).items()),
        ):
            if not np.allclose(np.asarray(b), np.asarray(a)):
                changed = True
        assert changed, "training did not update LoRA params"

    def test_enhance_action(self, tmp_path):
        bundle = make_random_bundle()
        config = tiny_config(tmp_path, iterations=2)
        prompts = tiny_prompts(action="enhance", positive="van gogh, oil")
        result = train(config, prompts, bundle)
        assert all(np.isfinite(l) for l in result["losses"])

    def test_multi_prompt_dynamic_resolution(self, tmp_path):
        bundle = make_random_bundle()
        config = tiny_config(tmp_path, iterations=3)
        prompts = [
            PromptSettings(target="a", resolution=64, batch_size=1),
            PromptSettings(
                target="b", resolution=128, dynamic_resolution=True, batch_size=1
            ),
        ]
        result = train(config, prompts, bundle)
        assert len(result["losses"]) == 3

    @pytest.mark.parametrize("kind", ["ddim", "ddpm", "euler_a", "lms"])
    def test_all_schedulers(self, kind, tmp_path):
        bundle = make_random_bundle(scheduler_kind=kind)
        config = tiny_config(tmp_path, iterations=2, noise_scheduler=kind)
        result = train(config, tiny_prompts(), bundle)
        assert all(np.isfinite(l) for l in result["losses"])

    def test_v_prediction(self, tmp_path):
        bundle = make_random_bundle(prediction_type="v_prediction")
        config = tiny_config(tmp_path, iterations=2)
        result = train(config, tiny_prompts(), bundle)
        assert all(np.isfinite(l) for l in result["losses"])

    def test_metrics_labels_survive_async_interval(self, tmp_path):
        """metrics.jsonl must label each record with its OWN iteration's
        sampled timesteps_to/resolution, regardless of logging.interval
        (round-2 verdict: the drain loop wrote the current iteration's
        metadata against the lagged record, and the final drain skipped
        metrics.jsonl entirely)."""
        import json

        def run(interval, sub):
            d = tmp_path / sub
            d.mkdir()
            bundle = make_random_bundle()
            config = tiny_config(d, iterations=6)
            config.train.max_denoising_steps = 5  # timesteps_to varies 1..4
            config.logging.interval = interval
            train(config, tiny_prompts(), bundle)
            with open(d / "metrics.jsonl") as f:
                return [json.loads(l) for l in f if l.strip()]

        sync = run(1, "sync")
        lagged = run(3, "async")
        # every iteration reaches metrics.jsonl, including the tail drain
        assert [r["iteration"] for r in sync] == list(range(6))
        assert [r["iteration"] for r in lagged] == list(range(6))
        # same seed -> same per-iteration samples; labels must agree exactly
        for a, b in zip(sync, lagged):
            assert a["timesteps_to"] == b["timesteps_to"]
            assert a["resolution"] == b["resolution"]

    def test_async_saves_match_inline_saves(self, tmp_path):
        """save.async_write (default on) must be a pure timing change: the
        background writer snapshots the tree on-device BEFORE the next step
        donates the lora buffers, so every periodic file must be
        byte-identical to a run with inline (reference-semantics) saves,
        and all files must be durable when train() returns."""

        def run(async_write, sub):
            d = tmp_path / sub
            d.mkdir()
            bundle = make_random_bundle()
            config = tiny_config(d, iterations=7, ema_decay=0.5)
            config.save.per_steps = 2  # periodic saves at i=2 and i=4
            config.save.async_write = async_write
            result = train(config, tiny_prompts(), bundle)
            return d, result

        d_async, r_async = run(True, "bg")
        d_sync, r_sync = run(False, "inline")
        names = sorted(p.name for p in r_async["saved"])
        assert names == sorted(p.name for p in r_sync["saved"])
        # periodic + ema + last + last_ema all landed
        assert "tiny_2steps.safetensors" in names
        assert "tiny_4steps_ema.safetensors" in names
        # tensor-exact equality (raw bytes differ only in the embedded
        # config metadata, which records each run's own save.path/knob)
        from safetensors.numpy import load_file

        for n in names:
            a, b = load_file(d_async / n), load_file(d_sync / n)
            assert sorted(a) == sorted(b), f"{n} key sets differ"
            for k in a:
                assert a[k].dtype == b[k].dtype and np.array_equal(
                    a[k], b[k]
                ), f"{n}:{k} differs between async and inline saves"

    def test_per_steps_zero_disables_periodic_saves(self, tmp_path):
        """save.per_steps = 0 means "final save only". The reference crashes
        with ZeroDivisionError at its first save check (train_lora.py:292);
        this framework documents 0 as a first-class off switch (round-4
        advisor finding: the chunk-limit code already treated <= 0 as
        no-periodic-saves while the save check divided by it unguarded)."""
        bundle = make_random_bundle()
        config = tiny_config(tmp_path, iterations=4)
        config.save.per_steps = 0
        result = train(config, tiny_prompts(), bundle)
        assert len(result["losses"]) == 4
        names = sorted(p.name for p in result["saved"])
        assert names == ["tiny_last.safetensors"]
        assert (tmp_path / "tiny_last.safetensors").exists()

    def test_async_save_failure_fails_fast_and_rescues(
        self, tmp_path, monkeypatch
    ):
        """A failed background periodic write must (a) abort the loop at the
        next iteration instead of training on for the rest of the run, and
        (b) still preserve the in-memory weights under a distinct rescue
        path before surfacing the writer's error (round-4 advisor finding:
        the error used to surface only at the pre-final-save join, AND the
        raise discarded the final weights)."""
        from leco_tpu.train import trainer as trainer_mod

        real_save = trainer_mod.save_lora_weights
        calls = []

        def failing_save(path, *a, **kw):
            calls.append(str(path))
            if "steps.safetensors" in str(path):  # periodic writes only
                raise OSError("disk full (injected)")
            return real_save(path, *a, **kw)

        monkeypatch.setattr(trainer_mod, "save_lora_weights", failing_save)
        bundle = make_random_bundle()
        config = tiny_config(tmp_path, iterations=50)
        config.save.per_steps = 2  # first periodic save at i=2
        with pytest.raises(OSError, match="disk full"):
            train(config, tiny_prompts(), bundle)
        # fail-fast: nowhere near the 50 configured iterations ran after
        # the i=2 writer died (the thread races the loop; allow a few)
        metrics = (tmp_path / "metrics.jsonl").read_text().splitlines()
        assert len(metrics) < 20, "loop kept training long after the failure"
        # the rescue file landed with the live weights
        rescue = tmp_path / "tiny_rescue.safetensors"
        assert rescue.exists()
        from safetensors.numpy import load_file

        state = load_file(rescue)
        assert any(k.endswith(".lora_down.weight") for k in state)
        # and no `_last` was written (the run did not complete)
        assert not (tmp_path / "tiny_last.safetensors").exists()


class TestPackBuilding:
    def test_pack_shapes(self):
        bundle = make_random_bundle()
        pairs = encode_prompt_pairs(
            tiny_prompts(batch_size=2), bundle.encode_fn
        )
        pack = build_pack(pairs[0], is_xl=False, height=64, width=64)
        d = bundle.unet.config.cross_attention_dim
        assert pack["inner_embeds"].shape == (4, 77, d)
        assert pack["ref_embeds"].shape == (6, 77, d)
        assert pack["target_embeds"].shape == (2, 77, d)

    def test_unique_prompts_encoded_once(self):
        calls = []
        bundle = make_random_bundle()
        inner = bundle.encode_fn

        def counting(p):
            calls.append(p)
            return inner(p)

        bundle.encode_fn = counting
        prompts = [
            PromptSettings(target="x"),  # positive=x, uncond="", neutral=""
            PromptSettings(target="x", positive="y"),
        ]
        encode_prompt_pairs(prompts, bundle.encode_fn)
        assert sorted(calls) == ["", "x", "y"]


class TestOptimFactories:
    def test_parse_optimizer_args(self):
        assert parse_optimizer_args("weight_decay=0.1 betas=(0.9,0.95)") == {
            "weight_decay": 0.1,
            "betas": (0.9, 0.95),
        }
        assert parse_optimizer_args("") == {}

    @pytest.mark.parametrize(
        "name", ["adam", "adamw", "lion", "adam8bit", "lion8bit", "prodigy",
                 "dadaptadam", "dadaptlion"]
    )
    def test_optimizers_step(self, name):
        opt = get_optimizer(name, lambda i: 1e-3)
        params = {"w": jnp.ones((4, 4))}
        state = opt.init(params)
        grads = {"w": jnp.ones((4, 4)) * 0.1}
        updates, state = opt.update(grads, state, params)
        new = jax.tree.map(lambda p, u: p + u, params, updates)
        assert np.isfinite(np.asarray(new["w"])).all()

    def test_unknown_optimizer(self):
        with pytest.raises(ValueError):
            get_optimizer("sgd", lambda i: 1e-3)

    def test_lr_schedules(self):
        lr, iters = 1e-4, 1000
        cosine = get_lr_schedule("cosine", lr, iters)
        assert float(cosine(0)) == pytest.approx(lr)
        assert float(cosine(iters)) == pytest.approx(lr / 100)
        assert float(cosine(iters // 2)) == pytest.approx(
            (lr + lr / 100) / 2, rel=1e-3
        )

        const = get_lr_schedule("constant", lr, iters)
        assert float(const(500)) == pytest.approx(lr)

        step = get_lr_schedule("step", lr, iters)
        assert float(step(0)) == pytest.approx(lr)
        assert float(step(iters)) == pytest.approx(lr * 0.999**100, rel=1e-4)

        linear = get_lr_schedule("linear", lr, iters)
        assert float(linear(0)) == pytest.approx(0.5 * lr)
        assert float(linear(10)) == pytest.approx(lr)

        restarts = get_lr_schedule("cosine_with_restarts", lr, iters)
        assert float(restarts(jnp.float32(0))) == pytest.approx(lr, rel=1e-3)
        # at the first restart boundary (t=T_0=100) lr resets to max
        assert float(restarts(jnp.float32(100))) == pytest.approx(lr, rel=1e-3)

        with pytest.raises(ValueError):
            get_lr_schedule("warmup", lr, iters)


class TestNetworkVariants:
    @pytest.mark.parametrize(
        "method", ["xattn", "selfattn", "noxattn", "innoxattn"]
    )
    def test_training_methods_end_to_end(self, method, tmp_path):
        from leco_tpu.lora import LoRASpec

        bundle = make_random_bundle(spec=LoRASpec(rank=2, train_method=method))
        config = tiny_config(tmp_path, iterations=2)
        result = train(config, tiny_prompts(), bundle)
        assert all(np.isfinite(l) for l in result["losses"])

    def test_c3lier_end_to_end(self, tmp_path):
        from flax.traverse_util import flatten_dict

        from leco_tpu.lora import LoRASpec

        bundle = make_random_bundle(
            spec=LoRASpec(rank=4, network_type="c3lier")
        )
        # conv lora leaves exist (4-dim down kernels)
        has_conv_lora = any(
            v.ndim == 4
            for k, v in flatten_dict(bundle.lora_params).items()
            if k[-1] == "lora_down"
        )
        assert has_conv_lora
        config = tiny_config(tmp_path, iterations=2)
        result = train(config, tiny_prompts(), bundle)
        assert all(np.isfinite(l) for l in result["losses"])
