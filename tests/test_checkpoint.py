"""Full-state checkpoint/resume (orbax): save -> restore -> identical
continuation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leco_tpu.train import checkpoint as ckpt


class TestStateRoundtrip:
    def test_save_restore(self, tmp_path):
        lora = {"layer": {"lora_down": jnp.ones((4, 2)), "lora_up": jnp.zeros((2, 4))}}
        opt_state = {"mu": {"layer": jnp.full((4, 2), 0.5)}}
        key = jax.random.PRNGKey(42)
        rng = np.random.default_rng(7)
        _ = rng.integers(0, 100, size=5)  # advance it

        d = tmp_path / "state"
        ckpt.save_train_state(
            d, lora=lora, opt_state=opt_state, iteration=10, key=key, rng=rng
        )
        # the restored host RNG must continue the same stream
        expected_next = rng.integers(0, 1000, size=4)

        restored = ckpt.restore_train_state(d)
        assert restored is not None
        assert restored["iteration"] == 10
        np.testing.assert_array_equal(
            np.asarray(restored["key"]), np.asarray(key)
        )
        np.testing.assert_allclose(
            np.asarray(restored["lora"]["layer"]["lora_down"]), np.ones((4, 2))
        )
        got_next = restored["rng"].integers(0, 1000, size=4)
        np.testing.assert_array_equal(got_next, expected_next)

    def test_latest_step(self, tmp_path):
        d = tmp_path / "state"
        assert ckpt.latest_step(d) is None
        lora = {"w": jnp.zeros(2)}
        for i in (5, 20, 10):
            ckpt.save_train_state(
                d,
                lora=lora,
                opt_state={},
                iteration=i,
                key=jax.random.PRNGKey(0),
                rng=np.random.default_rng(0),
            )
        assert ckpt.latest_step(d) == 20

    def test_trainer_resume(self, tmp_path):
        """Train 4 iters with snapshots, resume from the snapshot, and the
        loop must start at the snapshot iteration + 1."""
        from leco_tpu.config import (
            NetworkConfig,
            PretrainedModelConfig,
            RootConfig,
            SaveConfig,
            TrainConfig,
        )
        from leco_tpu.prompts import PromptSettings
        from leco_tpu.testing import make_random_bundle
        from leco_tpu.train.trainer import train

        def cfg(resume):
            return RootConfig(
                prompts_file="u.yaml",
                pretrained_model=PretrainedModelConfig(name_or_path="r://t"),
                network=NetworkConfig(rank=4),
                train=TrainConfig(
                    iterations=4,
                    max_denoising_steps=3,
                    seed=0,
                    precision="float32",
                    save_state=True,
                    resume=resume,
                ),
                save=SaveConfig(name="t", path=str(tmp_path), per_steps=2),
            )

        bundle = make_random_bundle()
        r1 = train(cfg(False), [PromptSettings(target="x", resolution=64)], bundle)
        assert len(r1["losses"]) == 4
        # snapshot exists at iteration 2
        assert ckpt.latest_step(tmp_path / "state") == 2

        bundle2 = make_random_bundle()
        r2 = train(cfg(True), [PromptSettings(target="x", resolution=64)], bundle2)
        # resumed at iteration 3 -> exactly 1 more loss
        assert len(r2["losses"]) == 1


class TestSnapshotGC:
    def test_keeps_newest_n(self, tmp_path, monkeypatch):
        from leco_tpu.train.checkpoint import gc_snapshots, latest_step

        for s in (10, 20, 30, 40, 50):
            d = tmp_path / f"step_{s}"
            d.mkdir()
            (tmp_path / f"step_{s}.rng.json").write_text("{}")
        gc_snapshots(tmp_path, keep_last=2)
        left = sorted(p.name for p in tmp_path.iterdir())
        assert left == [
            "step_40", "step_40.rng.json", "step_50", "step_50.rng.json"
        ]
        assert latest_step(tmp_path) == 50

    def test_protect_survives_reset_counter(self, tmp_path, monkeypatch):
        """Restarting with a reset iteration counter into a directory that
        holds older higher-numbered snapshots must not GC the snapshot that
        was just written (advisor round-2 finding)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from leco_tpu.train.checkpoint import save_train_state

        monkeypatch.setenv("LECO_KEEP_SNAPSHOTS", "2")
        for s in (100, 200, 300):
            (tmp_path / f"step_{s}").mkdir()
            (tmp_path / f"step_{s}.rng.json").write_text("{}")
        save_train_state(
            tmp_path,
            lora={"w": jnp.ones((2,))},
            opt_state={"m": jnp.zeros((2,))},
            iteration=5,
            key=jax.random.PRNGKey(0),
            rng=np.random.default_rng(0),
        )
        left = sorted(p.name for p in tmp_path.iterdir() if p.is_dir())
        assert "step_5" in left

    def test_disabled_by_zero(self, tmp_path):
        from leco_tpu.train.checkpoint import gc_snapshots

        for s in (1, 2):
            (tmp_path / f"step_{s}").mkdir()
        gc_snapshots(tmp_path, keep_last=0)
        assert len(list(tmp_path.iterdir())) == 2

    def test_save_applies_gc(self, tmp_path, monkeypatch):
        """save_train_state garbage-collects beyond LECO_KEEP_SNAPSHOTS."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from leco_tpu.train.checkpoint import save_train_state

        monkeypatch.setenv("LECO_KEEP_SNAPSHOTS", "2")
        for it in (1, 2, 3):
            save_train_state(
                tmp_path,
                lora={"w": jnp.ones((2,))},
                opt_state={"m": jnp.zeros((2,))},
                iteration=it,
                key=jax.random.PRNGKey(0),
                rng=np.random.default_rng(0),
            )
        steps = sorted(
            p.name for p in tmp_path.iterdir() if p.is_dir()
        )
        assert steps == ["step_2", "step_3"]
