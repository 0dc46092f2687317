"""Decompose warm time-to-first-iteration (round-3 verdict, Weak #2 /
Next #2: "cut warm TTFI below 60 s — or prove the floor").

Round-3 warm breakdown: build 30.5 s, compile-or-load 76.5 s, first exec
14.2 s (121.2 s total). Hypothesis from cache forensics: the serialized
step executable is ~181 MB ZSTD-COMPRESSED on disk (cache entries carry
the zstd magic 28 b5 2f fd), and a warm "load" must deserialize it and
push it to the REMOTE TPU runtime through the axon tunnel — i.e. the load
is tunnel-bandwidth-bound, not CPU-bound. Measured pieces:

  phase aot — the staged AOT pipeline on the REAL sd15 step at 512 px:
    trace -> lower -> compile(cached) -> first execution, each timed
    separately (jax .trace/.lower/.compile API), plus disk-read/decompress
    cost of the step's cache entry;
  phase bandwidth — host->device and device->host transfer rate
    (16 MB; a 128 MB probe wedged the tunnel for >13 min on 2026-08-19,
    which is itself recorded evidence that bulk transfers crawl).

Each phase runs in its own child process with a hard timeout so a wedged
tunnel transfer cannot block the probe (observed). Run on the TPU host
with the cache warm (after bench.py):  python scripts/probe_ttfi.py
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def phase_bandwidth(report: dict):
    import jax
    import numpy as np

    mb = int(os.environ.get("LECO_PROBE_MB", "16"))
    host = np.ones((mb, 1024, 1024), np.uint8)
    t = time.perf_counter()
    dx = jax.device_put(host)
    jax.block_until_ready(dx)
    up_s = time.perf_counter() - t
    t = time.perf_counter()
    _ = np.asarray(dx)
    down_s = time.perf_counter() - t
    report["probe_mb"] = mb
    report["tunnel_up_mb_s"] = round(mb / up_s, 2)
    report["tunnel_down_mb_s"] = round(mb / down_s, 2)
    report["tunnel_up_s"] = round(up_s, 1)
    report["tunnel_down_s"] = round(down_s, 1)


def phase_aot(report: dict):
    from leco_tpu.utils import benchkit
    from leco_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()

    def stage(msg):
        print(f"[probe +{time.perf_counter() - t0:6.1f}s] {msg}", flush=True)

    # --- the on-disk step entry: read + decompress cost (host side)
    cache_dir = benchkit.cache_dir()
    step_entries = sorted(
        (f for f in os.listdir(cache_dir) if f.startswith("jit_step-")
         and os.path.getsize(os.path.join(cache_dir, f)) > 50e6),
        key=lambda f: os.path.getmtime(os.path.join(cache_dir, f)),
    )
    if step_entries:
        p = os.path.join(cache_dir, step_entries[-1])
        size = os.path.getsize(p)
        t = time.perf_counter()
        blob = open(p, "rb").read()
        read_s = time.perf_counter() - t
        report["step_entry_mb"] = round(size / 1e6, 1)
        report["step_entry_read_s"] = round(read_s, 2)
        try:
            import zstandard as zstd

            t = time.perf_counter()
            raw = zstd.ZstdDecompressor().decompress(
                blob, max_output_size=2_000_000_000
            )
            report["step_entry_decompress_s"] = round(time.perf_counter() - t, 2)
            report["step_executable_raw_mb"] = round(len(raw) / 1e6, 1)
            del raw
        except Exception as e:
            stage(f"decompress probe failed ({e}) — entry may be framed")
        stage(f"step entry {size/1e6:.0f} MB: read {read_s:.2f}s, "
              f"decompress {report.get('step_entry_decompress_s')}s -> "
              f"{report.get('step_executable_raw_mb')} MB raw")
        del blob

    # --- staged AOT pipeline on the real step
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
    out = compiled(*args)  # statics are baked into the compiled object
    jax.block_until_ready(out[2])
    report["first_exec_s"] = round(time.perf_counter() - t, 1)
    stage(f"first exec {report['first_exec_s']}s")


def child(phase_name: str):
    report = {}
    t0 = time.perf_counter()
    {"aot": phase_aot, "bandwidth": phase_bandwidth}[phase_name](report)
    report[f"{phase_name}_total_s"] = round(time.perf_counter() - t0, 1)
    with open(os.environ["LECO_PROBE_OUT"], "w") as f:
        json.dump(report, f)


def main():
    from leco_tpu.utils import benchkit

    merged = {"metric": "ttfi_probe"}
    for phase_name, budget in (("aot", 1800), ("bandwidth", 600)):
        out = f"/tmp/leco_probe_{phase_name}.json"
        env = dict(os.environ, LECO_PROBE_PHASE=phase_name,
                   LECO_PROBE_OUT=out)
        try:
            os.remove(out)
        except OSError:
            pass
        t = time.perf_counter()
        try:
            rc = subprocess.call(
                [sys.executable, os.path.abspath(__file__)], env=env,
                timeout=budget,
            )
        except subprocess.TimeoutExpired:
            merged[f"{phase_name}_TIMED_OUT_after_s"] = budget
            print(f"[probe] phase {phase_name} TIMED OUT after {budget}s "
                  "(wedged tunnel transfer?)", flush=True)
            continue
        if rc != 0:
            merged[f"{phase_name}_failed_rc"] = rc
            continue
        try:
            with open(out) as f:
                merged.update(json.load(f))
        except OSError:
            pass
        print(f"[probe] phase {phase_name} done in "
              f"{time.perf_counter() - t:.0f}s", flush=True)

    if "step_entry_mb" in merged and merged.get("tunnel_up_mb_s"):
        merged["implied_load_floor_s"] = round(
            merged["step_entry_mb"] / merged["tunnel_up_mb_s"], 1
        )
    print(json.dumps(merged))
    benchkit.append_history(
        merged,
        os.path.join(os.path.dirname(__file__), "..", "bench_history.jsonl"),
    )


if __name__ == "__main__":
    if os.environ.get("LECO_PROBE_PHASE"):
        child(os.environ["LECO_PROBE_PHASE"])
    else:
        main()
