"""Data-parallel tests on the virtual 8-device CPU mesh (SURVEY.md section 4
item d): sharded vs single-device equivalence, and the full dryrun path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leco_tpu.parallel.mesh import (
    batch_sharding,
    constrain_batch,
    get_mesh,
    shardable_batch,
)
from leco_tpu.prompts import PromptSettings
from leco_tpu.testing import make_random_bundle
from leco_tpu.train.optim import get_lr_schedule, get_optimizer
from leco_tpu.train.trainer import build_pack, encode_prompt_pairs, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _run_step(mesh, shard, batch=8, seed=0):
    bundle = make_random_bundle(seed=3)
    pairs = encode_prompt_pairs(
        [PromptSettings(target="van gogh", resolution=64, batch_size=batch)],
        bundle.encode_fn,
    )
    pack = build_pack(pairs[0], is_xl=False, height=64, width=64)
    optimizer = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10))
    lora = bundle.lora_params
    opt_state = optimizer.init(lora)
    step = make_train_step(bundle, optimizer, max_denoising_steps=3, mesh=mesh)
    ctx = mesh if mesh is not None else _nullcontext()
    with ctx:
        lora, opt_state, loss = step(
            bundle.base_params,
            lora,
            opt_state,
            jax.random.PRNGKey(seed),
            pack,
            jnp.float32(1.0),
            jnp.float32(1.0),
            jnp.int32(2),
            height=64,
            width=64,
            shard_batch=shard,
        )
    return float(loss), lora


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class TestMeshHelpers:
    def test_mesh_shape(self):
        mesh = get_mesh()
        assert mesh.devices.size == len(jax.devices())
        assert mesh.axis_names == ("dp",)

    def test_shardable(self):
        mesh = get_mesh()
        n = mesh.devices.size
        assert shardable_batch(n, mesh)
        assert shardable_batch(2 * n, mesh)
        assert not shardable_batch(n - 1, mesh)
        assert not shardable_batch(1, mesh)
        assert not shardable_batch(4, None)

    def test_constrain_batch_sharding(self):
        mesh = get_mesh()
        x = jnp.zeros((8, 4, 4, 4))

        @jax.jit
        def f(x):
            return constrain_batch(x * 2, mesh, True)

        with mesh:
            y = f(x)
        assert y.sharding.num_devices == 8


class TestDPEquivalence:
    def test_sharded_matches_replicated(self):
        """Same key, same batch: the dp-sharded step must produce the same
        loss and updated LoRA as the unsharded one (GSPMD inserts the
        all-reduce; math is identical)."""
        mesh = get_mesh()
        loss_r, lora_r = _run_step(mesh, shard=False)
        loss_s, lora_s = _run_step(mesh, shard=True)
        assert loss_r == pytest.approx(loss_s, rel=2e-4)
        from flax.traverse_util import flatten_dict

        f_r, f_s = flatten_dict(lora_r), flatten_dict(lora_s)
        assert set(f_r) == set(f_s)
        for k in f_r:
            np.testing.assert_allclose(
                np.asarray(f_r[k]), np.asarray(f_s[k]), atol=1e-5, err_msg=str(k)
            )

    def test_dryrun_multichip(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)
