"""Trace one full train step on the real chip and print a per-HLO-op-category
time breakdown (parsed from the xplane proto via xprof/tensorboard tooling).

Usage: python scripts/profile_step.py [--t_to 25] [--res 512] [--logdir /tmp/leco_trace]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def capture(logdir: str, t_to: int, res: int, attn: str, remat: bool):
    from leco_tpu.lora import LoRASpec
    from leco_tpu.models.unet import sd15_config
    from leco_tpu.prompts import PromptSettings
    from leco_tpu.testing import make_random_bundle
    from leco_tpu.train.optim import get_lr_schedule, get_optimizer
    from leco_tpu.train.trainer import build_pack, encode_prompt_pairs, make_train_step

    bundle = make_random_bundle(
        config=sd15_config(),
        spec=LoRASpec(rank=4, alpha=1.0),
        scheduler_kind="ddim",
        dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16,
        attn_backend=attn,
        remat=remat,
    )
    prompts = [PromptSettings(target="van gogh", resolution=res, batch_size=1)]
    pairs = encode_prompt_pairs(prompts, bundle.encode_fn)
    pair = pairs[0]
    pack = build_pack(pair, is_xl=False, height=res, width=res)
    optimizer = get_optimizer("adamw", get_lr_schedule("constant", 1e-4, 500))
    lora = bundle.lora_params
    opt_state = optimizer.init(lora)
    step_fn = make_train_step(bundle, optimizer, 50)

    key = jax.random.PRNGKey(0)

    def run(lora, opt_state, key):
        key, sub = jax.random.split(key)
        lora, opt_state, loss = step_fn(
            bundle.base_params, lora, opt_state, sub, pack,
            jnp.float32(pair.guidance_scale), jnp.float32(pair.erase_sign),
            jnp.int32(t_to), height=res, width=res, shard_batch=False,
        )
        return lora, opt_state, loss, key

    lora, opt_state, loss, key = run(lora, opt_state, key)  # compile
    jax.block_until_ready(loss)

    with jax.profiler.trace(logdir):
        for _ in range(2):
            lora, opt_state, loss, key = run(lora, opt_state, key)
        jax.block_until_ready(loss)


def analyze(logdir: str, top: int = 40):
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    assert paths, f"no xplane.pb under {logdir}"
    path = paths[-1]
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([path], "framework_op_stats", {})
    # data is CSV-ish or JSON depending on version; try json first
    try:
        parsed = json.loads(data)
    except Exception:
        parsed = None
    if parsed is None:
        print(data[:5000])
        return
    print(json.dumps(parsed, indent=1)[:5000])


def analyze_hlo(logdir: str, top: int = 50):
    """Direct xplane parse: per-HLO-op self time on the TPU device plane."""
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    assert paths, f"no xplane.pb under {logdir}"
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    import collections

    cat_time = collections.Counter()
    op_time = collections.Counter()
    total = 0
    for plane in xs.planes:
        if "TPU" not in plane.name or "device" not in plane.name.lower():
            continue
        stat_meta = {k: v.name for k, v in plane.stat_metadata.items()}
        ev_meta = {k: v for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                meta = ev_meta[ev.metadata_id]
                dur = ev.duration_ps / 1e12
                total += dur
                name = meta.name
                cat = name.split(".")[0].split("(")[0]
                # strip numeric suffixes: fusion.123 -> fusion
                cat = "".join(c for c in cat if not c.isdigit()).rstrip("._-")
                cat_time[cat] += dur
                op_time[name] += dur
    print(f"\ntotal XLA-op device time: {total*1e3:.1f} ms (over traced region)")
    print("\n== by op category ==")
    for cat, t in cat_time.most_common(25):
        print(f"{t*1e3:9.2f} ms  {100*t/total:5.1f}%  {cat}")
    print(f"\n== top {top} individual ops ==")
    for name, t in op_time.most_common(top):
        print(f"{t*1e3:9.2f} ms  {100*t/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--t_to", type=int, default=25)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--attn", default=None)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--logdir", default="/tmp/leco_trace")
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()

    if not args.analyze_only:
        from leco_tpu.ops.attention import default_backend

        attn = args.attn or default_backend()
        import shutil

        shutil.rmtree(args.logdir, ignore_errors=True)
        capture(args.logdir, args.t_to, args.res, attn, args.remat)
    analyze_hlo(args.logdir)
