"""Trace the bare UNet forward (the inner-denoise body, 86% of the train
step) and print a clean per-op breakdown: async -start/-done ops excluded
from the total (they overlap compute), per-exec averages shown.

Usage: python scripts/profile_fwd.py [--res 512] [--batch 2] [--attn flash]
"""

import argparse
import collections
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def capture(logdir: str, res: int, batch: int, attn: str, n_calls: int = 4,
            model: str = "sd15"):
    from leco_tpu.lora import LoRASpec, merge_params
    from leco_tpu.models.unet import sd15_config, sdxl_config
    from leco_tpu.testing import make_random_bundle

    cfg = sdxl_config() if model == "sdxl" else sd15_config()
    bundle = make_random_bundle(
        config=cfg,
        spec=LoRASpec(rank=4),
        dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16,
        attn_backend=attn,
        remat=False,
    )
    params = merge_params(bundle.base_params, bundle.lora_params)
    unet = bundle.unet
    h = res // 8
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, h, h, 4), jnp.bfloat16)
    ctx = jax.random.normal(
        jax.random.PRNGKey(1), (batch, 77, cfg.cross_attention_dim), jnp.bfloat16
    )
    added = None
    if model == "sdxl":
        pooled = (cfg.projection_class_embeddings_input_dim
                  - 6 * cfg.addition_time_embed_dim)
        added = {
            "text_embeds": jnp.zeros((batch, pooled), jnp.bfloat16),
            "time_ids": jnp.tile(
                jnp.asarray([[res, res, 0, 0, res, res]], jnp.bfloat16),
                (batch, 1),
            ),
        }

    fwd = jax.jit(lambda p, x, c: unet.apply({"params": p}, x, 500.0, c, added))
    out = fwd(params, x, ctx)
    jax.block_until_ready(out)

    import time

    t0 = time.perf_counter()
    o = x
    for _ in range(10):
        o = fwd(params, o, ctx)
    jax.block_until_ready(o)
    per_call = (time.perf_counter() - t0) / 10
    print(f"fwd wall: {per_call*1e3:.2f} ms/call (batch={batch}, {res}px, attn={attn})")

    with jax.profiler.trace(logdir):
        o = x
        for _ in range(n_calls):
            o = fwd(params, o, ctx)
        jax.block_until_ready(o)
    return n_calls, per_call


def analyze(logdir: str, n_calls: int, top: int = 45):
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    assert paths, f"no xplane.pb under {logdir}"
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    cat_time = collections.Counter()
    op_time = collections.Counter()
    op_count = collections.Counter()
    total = 0.0
    async_time = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {k: v for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                meta = ev_meta[ev.metadata_id]
                dur = ev.duration_ps / 1e12
                name = meta.name.lstrip("%")
                base = name.split(" ")[0].split("(")[0]
                stem = base.split(".")[0]
                if stem.endswith("-start") or stem.endswith("-done"):
                    async_time += dur
                    continue
                total += dur
                cat_time[stem] += dur
                op_time[base] += dur
                op_count[base] += 1
    per_call = total / n_calls
    print(f"\nsync XLA-op device time: {per_call*1e3:.2f} ms/call "
          f"(async copy/slice excluded: {async_time/n_calls*1e3:.1f} ms/call overlapped)")
    print("\n== by op category (per call) ==")
    for cat, t in cat_time.most_common(22):
        print(f"{t/n_calls*1e3:9.3f} ms  {100*t/total:5.1f}%  {cat}")
    print(f"\n== top {top} individual ops (per call) ==")
    for name, t in op_time.most_common(top):
        n = op_count[name] // n_calls
        print(f"{t/n_calls*1e3:8.3f} ms  {100*t/total:4.1f}%  x{n:<3d} {name[:100]}")
    dump = os.environ.get("LECO_PROFILE_DUMP")
    if dump:
        import json

        with open(dump, "w") as f:
            json.dump(
                {k: v / n_calls * 1e3 for k, v in op_time.items()}, f
            )
        print(f"per-op times written to {dump}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--attn", default="flash")
    ap.add_argument("--logdir", default="/tmp/leco_fwd_trace")
    ap.add_argument("--model", choices=["sd15", "sdxl"], default="sd15")
    args = ap.parse_args()

    shutil.rmtree(args.logdir, ignore_errors=True)
    n, _ = capture(args.logdir, args.res, args.batch, args.attn,
                   model=args.model)
    analyze(args.logdir, n)
