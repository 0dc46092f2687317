"""Decompose warm time-to-first-iteration (round-3 verdict, Weak #2 /
Next #2: "cut warm TTFI below 60 s — or prove the floor").

Round-3 warm breakdown: build 30.5 s, compile-or-load 76.5 s, first exec
14.2 s (121.2 s total). Hypothesis from cache forensics: the serialized
step executable is ~181 MB ZSTD-COMPRESSED on disk (cache entries carry
the zstd magic 28 b5 2f fd), and a warm "load" must deserialize it and
push it to the REMOTE TPU runtime through the axon tunnel — i.e. the load
is tunnel-bandwidth-bound, not CPU-bound. This probe measures each piece:

  1. tunnel data bandwidth (device_put of a large host array, blocked);
  2. disk read + zstd decompress time of the real step cache entry;
  3. the AOT pipeline on the REAL sd15 step at 512 px, staged:
     trace -> lower -> compile(cached) -> first execution,
     each timed separately (jax .trace/.lower/.compile AOT API);
  4. the resulting floor arithmetic: executable bytes / tunnel MB/s.

Run on the TPU host with the cache warm (after bench.py):
  python scripts/probe_ttfi.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from leco_tpu.utils import benchkit
    from leco_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.perf_counter()

    def stage(msg):
        print(f"[probe +{time.perf_counter() - t0:6.1f}s] {msg}", flush=True)

    dev = jax.devices()[0]
    stage(f"platform={dev.platform}")
    report = {}

    # --- 1. tunnel bandwidth: 128 MB up, then fetch back down
    mb = 128
    host = np.ones((mb, 1024, 1024), np.uint8)
    t = time.perf_counter()
    dx = jax.device_put(host)
    jax.block_until_ready(dx)
    up_s = time.perf_counter() - t
    t = time.perf_counter()
    _ = np.asarray(dx)
    down_s = time.perf_counter() - t
    report["tunnel_up_mb_s"] = round(mb / up_s, 1)
    report["tunnel_down_mb_s"] = round(mb / down_s, 1)
    stage(f"device_put {mb} MB: up {up_s:.1f}s ({mb/up_s:.1f} MB/s), "
          f"fetch {down_s:.1f}s ({mb/down_s:.1f} MB/s)")
    del dx, host

    # --- 2. the on-disk step entry: read + decompress cost (host side)
    cache_dir = benchkit.cache_dir()
    step_entries = sorted(
        (f for f in os.listdir(cache_dir) if f.startswith("jit_step-")),
        key=lambda f: os.path.getmtime(os.path.join(cache_dir, f)),
    )
    if step_entries:
        p = os.path.join(cache_dir, step_entries[-1])
        size = os.path.getsize(p)
        t = time.perf_counter()
        blob = open(p, "rb").read()
        read_s = time.perf_counter() - t
        dec_s = None
        raw_mb = None
        try:
            import zstandard as zstd

            t = time.perf_counter()
            raw = zstd.ZstdDecompressor().decompress(
                blob, max_output_size=2_000_000_000
            )
            dec_s = time.perf_counter() - t
            raw_mb = len(raw) / 1e6
            del raw
        except Exception as e:  # entry layout may not be bare zstd
            stage(f"decompress probe failed ({e}) — entry may be framed")
        report["step_entry_mb"] = round(size / 1e6, 1)
        report["step_entry_read_s"] = round(read_s, 2)
        report["step_entry_decompress_s"] = (
            round(dec_s, 2) if dec_s is not None else None
        )
        report["step_executable_raw_mb"] = (
            round(raw_mb, 1) if raw_mb is not None else None
        )
        stage(
            f"step entry {size/1e6:.0f} MB on disk: read {read_s:.2f}s"
            + (f", zstd decompress {dec_s:.2f}s -> {raw_mb:.0f} MB raw"
               if dec_s is not None else "")
        )
    else:
        stage("no jit_step cache entry found — run bench.py first")

    # --- 3. staged AOT pipeline on the real step
    from leco_tpu.lora import LoRASpec
    from leco_tpu.models.unet import sd15_config
    from leco_tpu.ops.attention import default_backend
    from leco_tpu.prompts import PromptSettings
    from leco_tpu.testing import make_random_bundle
    from leco_tpu.train.optim import get_lr_schedule, get_optimizer
    from leco_tpu.train.trainer import (
        build_pack, encode_prompt_pairs, make_train_step,
    )

    t = time.perf_counter()
    bundle = make_random_bundle(
        config=sd15_config(), spec=LoRASpec(rank=4, alpha=1.0),
        dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
        attn_backend=default_backend(),
    )
    report["bundle_build_s"] = round(time.perf_counter() - t, 1)
    stage(f"bundle built in {report['bundle_build_s']}s")

    prompts = [PromptSettings(target="van gogh", resolution=512, batch_size=1)]
    pair = encode_prompt_pairs(prompts, bundle.encode_fn)[0]
    pack = build_pack(pair, is_xl=False, height=512, width=512)
    optimizer = get_optimizer("adamw", get_lr_schedule("constant", 1e-4, 500))
    opt_state = optimizer.init(bundle.lora_params)
    step_fn = make_train_step(bundle, optimizer, 50)

    args = (
        bundle.base_params, bundle.lora_params, opt_state,
        jax.random.PRNGKey(0), pack, jnp.float32(1.0), jnp.float32(1.0),
        jnp.int32(25),
    )
    kwargs = dict(height=512, width=512, shard_batch=False)

    t = time.perf_counter()
    traced = step_fn.trace(*args, **kwargs)
    report["aot_trace_s"] = round(time.perf_counter() - t, 1)
    stage(f"trace {report['aot_trace_s']}s")

    t = time.perf_counter()
    lowered = traced.lower()
    report["aot_lower_s"] = round(time.perf_counter() - t, 1)
    stage(f"lower {report['aot_lower_s']}s")

    t = time.perf_counter()
    compiled = lowered.compile()
    report["aot_compile_or_load_s"] = round(time.perf_counter() - t, 1)
    stage(f"compile-or-load {report['aot_compile_or_load_s']}s")

    t = time.perf_counter()
    out = compiled(*args, **kwargs)
    jax.block_until_ready(out[2])
    report["first_exec_s"] = round(time.perf_counter() - t, 1)
    stage(f"first exec {report['first_exec_s']}s")

    # --- 4. floor arithmetic
    if step_entries and report["tunnel_up_mb_s"]:
        floor = report["step_entry_mb"] / report["tunnel_up_mb_s"]
        report["implied_load_floor_s"] = round(floor, 1)
        stage(
            f"floor: pushing the {report['step_entry_mb']:.0f} MB entry at "
            f"{report['tunnel_up_mb_s']:.1f} MB/s (up) = {floor:.0f}s "
            "minimum if the executable crosses the tunnel once"
        )

    print(json.dumps(report))
    benchkit.append_history(
        {"metric": "ttfi_probe", **report},
        os.path.join(os.path.dirname(__file__), "..", "bench_history.jsonl"),
    )


if __name__ == "__main__":
    main()
