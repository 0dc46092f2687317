"""SDXL training throughput (optional; the driver's headline bench is
bench.py / SD1.5). Random-weight SDXL UNet, 1024px, batch 1, bf16, rank-4
LoRA, DDIM — the train_lora_xl.py recipe."""

import json
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
    from leco_tpu.models.unet import sdxl_config
    from leco_tpu.ops.attention import default_backend
    from leco_tpu.prompts import PromptSettings
    from leco_tpu.testing import make_random_bundle
    from leco_tpu.train.optim import get_lr_schedule, get_optimizer
    from leco_tpu.train.trainer import build_pack, encode_prompt_pairs, make_train_step

    res = int(os.environ.get("LECO_BENCH_RES", "1024"))
    platform = jax.devices()[0].platform
    t0 = time.perf_counter()

    def stage(msg):
        print(f"[bench-xl +{time.perf_counter() - t0:6.1f}s] {msg}", flush=True)

    bundle = make_random_bundle(
        config=sdxl_config(),
        spec=LoRASpec(rank=4, alpha=1.0),
        dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16,
        attn_backend=default_backend(),
        remat=False,
    )
    stage("bundle built (SDXL 2.6B)")

    prompts = [PromptSettings(target="van gogh", resolution=res, batch_size=1)]
    pairs = encode_prompt_pairs(prompts, bundle.encode_fn)
    pack = build_pack(pairs[0], is_xl=True, height=res, width=res)

    optimizer = get_optimizer("adamw", get_lr_schedule("constant", 1e-4, 500))
    lora = bundle.lora_params
    opt_state = optimizer.init(lora)
    step_fn = make_train_step(bundle, optimizer, 50)
    stage("step built")

    key = jax.random.PRNGKey(0)

    def it(lora, opt_state, key, t_to):
        key, sub = jax.random.split(key)
        lora, opt_state, loss = step_fn(
            bundle.base_params, lora, opt_state, sub, pack,
            jnp.float32(1.0), jnp.float32(1.0), jnp.int32(t_to),
            height=res, width=res, shard_batch=False,
        )
        return lora, opt_state, loss, key

    lora, opt_state, loss, key = it(lora, opt_state, key, 25)
    print("warm loss", float(loss))
    time_to_first_iter = time.perf_counter() - t0
    stage("compiled + warm")

    rng = np.random.default_rng(0)
    t_tos = rng.integers(1, 50, size=6)
    start = time.perf_counter()
    for t_to in t_tos:
        lora, opt_state, loss, key = it(lora, opt_state, key, int(t_to))
        float(loss)
    per_iter_elapsed = time.perf_counter() - start
    stage(f"timed {len(t_tos)} iters (per-iter sync) in {per_iter_elapsed:.1f}s")

    # deferred fetch: every loss is materialized inside the timed window —
    # fully synced, but without a tunnel round-trip per step (see bench.py)
    start = time.perf_counter()
    pending = []
    for t_to in t_tos:
        lora, opt_state, loss, key = it(lora, opt_state, key, int(t_to))
        pending.append(loss)
    for p in pending:
        float(p)
    elapsed = time.perf_counter() - start
    stage(f"timed {len(t_tos)} iters (deferred fetch) in {elapsed:.1f}s")
    result = {
        "metric": f"SDXL LoRA train iters/sec/chip, {res}px bf16 rank4 ddim",
        "value": round(len(t_tos) / elapsed, 4),
        "unit": "it/s",
        "platform": platform,
        "sync": "deferred_fetch_all",
        "per_iter_its_per_sec": round(len(t_tos) / per_iter_elapsed, 4),
        "mean_inner_steps": float(np.mean(t_tos)),
        "time_to_first_iter_s": round(time_to_first_iter, 1),
        "knobs": {
            k: v for k, v in sorted(os.environ.items())
            if k.startswith("LECO_")
        },
    }
    print(json.dumps(result))
    try:  # same cross-round history file the SD1.5 bench appends to
        hist = os.path.join(os.path.dirname(__file__), "..", "bench_history.jsonl")
        with open(hist, "a") as f:
            f.write(json.dumps({**result, "ts": time.time()}) + "\n")
    except OSError:
        pass


if __name__ == "__main__":
    main()
