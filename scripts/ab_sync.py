"""A/B the bench's sync discipline on the real chip.

The official bench fetches the loss after EVERY iteration (`float(loss)`),
which drains the dispatch pipeline and pays one tunnel round-trip per step.
The real trainer (trainer.py async loss drain, logging.interval) does not:
it enqueues steps and fetches losses late. This script measures, in one
warm process, the same seeded 12-iteration workload under

  A. per_iter  — float(loss) each step (current bench convention)
  B. deferred  — enqueue all steps, then fetch every loss at the end
                 (elapsed INCLUDES the fetches, so all device work and all
                 transfers are counted — unlike the round-1 bogus
                 async-only timing, nothing is left un-synced)

Run: python scripts/ab_sync.py  (uses the persistent compilation cache)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from leco_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from leco_tpu.lora import LoRASpec
    from leco_tpu.models.unet import sd15_config
    from leco_tpu.ops.attention import default_backend
    from leco_tpu.prompts import PromptSettings
    from leco_tpu.testing import make_random_bundle
    from leco_tpu.train.optim import get_lr_schedule, get_optimizer
    from leco_tpu.train.trainer import build_pack, encode_prompt_pairs, make_train_step

    t0 = time.perf_counter()

    def stage(msg):
        print(f"[ab +{time.perf_counter() - t0:6.1f}s] {msg}", flush=True)

    stage(f"platform={jax.devices()[0].platform}")
    res = 512
    bundle = make_random_bundle(
        config=sd15_config(),
        spec=LoRASpec(rank=4, alpha=1.0),
        scheduler_kind="ddim",
        dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16,
        attn_backend=default_backend(),
        remat=False,
    )
    prompts = [PromptSettings(target="van gogh", resolution=res, batch_size=1)]
    pair = encode_prompt_pairs(prompts, bundle.encode_fn)[0]
    pack = build_pack(pair, is_xl=False, height=res, width=res)
    lr_schedule = get_lr_schedule("constant", 1e-4, 500)
    optimizer = get_optimizer("adamw", lr_schedule)
    lora = bundle.lora_params
    opt_state = optimizer.init(lora)
    step_fn = make_train_step(bundle, optimizer, 50)
    stage("built")

    key = jax.random.PRNGKey(0)

    def run_iter(lora, opt_state, key, t_to):
        key, sub = jax.random.split(key)
        lora, opt_state, loss = step_fn(
            bundle.base_params, lora, opt_state, sub, pack,
            jnp.float32(pair.guidance_scale), jnp.float32(pair.erase_sign),
            jnp.int32(t_to), height=res, width=res, shard_batch=False,
        )
        return lora, opt_state, loss, key

    lora, opt_state, loss, key = run_iter(lora, opt_state, key, 25)
    jax.block_until_ready(loss)
    stage(f"warm (TTFI {time.perf_counter() - t0:.1f}s)")

    t_tos = np.random.default_rng(0).integers(1, 50, size=12)

    def measure(mode):
        nonlocal lora, opt_state, key
        start = time.perf_counter()
        pending = []
        for t_to in t_tos:
            lora, opt_state, loss, key = run_iter(lora, opt_state, key, int(t_to))
            if mode == "per_iter":
                float(loss)
            else:
                pending.append(loss)
        for p in pending:
            float(p)  # deferred: fetch every loss; elapsed includes it
        elapsed = time.perf_counter() - start
        stage(f"{mode}: {len(t_tos)} iters in {elapsed:.2f}s "
              f"= {len(t_tos) / elapsed:.4f} it/s")
        return len(t_tos) / elapsed

    # interleave to cancel drift; first pass of each mode warms nothing new
    results = {"per_iter": [], "deferred": []}
    for _ in range(3):
        for mode in ("per_iter", "deferred"):
            results[mode].append(measure(mode))
    for mode, vals in results.items():
        stage(f"{mode}: best {max(vals):.4f} median {sorted(vals)[1]:.4f} it/s")


if __name__ == "__main__":
    main()
