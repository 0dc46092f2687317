"""Autotune ops/gn_conv.py block configs per SD resnet conv shape on the
real chip (trace-based device timing; wall-clock through the axon tunnel
is useless — every dispatch pays a host round-trip). Writes
/tmp/gnconv_tune.json; the blessed results live in
docs/data/gnconv_tune_v5e.json and are embedded as gn_conv._TUNED.

Each shape also measures the XLA reference composition
(apply_affine_silu + lax.conv — the exact fallback path) so the table
decides fused-vs-XLA per shape, not just the best kernel config."""
import collections
import glob
import itertools
import json
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from leco_tpu.ops import gn_conv

N = 8
SHAPES = [
    (2, 64, 320, 320), (2, 64, 960, 320), (2, 64, 640, 320),
    (2, 32, 320, 640), (2, 32, 640, 640), (2, 32, 1920, 640),
    (2, 32, 1280, 640), (2, 32, 960, 640),
    (2, 16, 640, 1280), (2, 16, 1280, 1280), (2, 16, 2560, 1280),
    (2, 16, 1920, 1280),
    (2, 8, 1280, 1280), (2, 8, 2560, 1280), (2, 8, 1920, 1280),
]


def device_ms(logdir, n):
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    total = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {k: v for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                meta = ev_meta[ev.metadata_id]
                stem = meta.name.lstrip("%").split(" ")[0].split("(")[0] \
                    .split(".")[0]
                if stem.endswith("-start") or stem.endswith("-done"):
                    continue
                total += ev.duration_ps / 1e12
    return total / n * 1e3


def measure(f, x, args):
    jf = jax.jit(f)
    r = jf(x, *args)
    jax.block_until_ready(r)
    logdir = "/tmp/at_trace"
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        o = x
        for _ in range(N):
            r = jf(o, *args)
            o = x + r[0, 0, 0, 0].astype(x.dtype) * 0
        jax.block_until_ready(r)
    return device_ms(logdir, N)


def candidates(b, h, cin, cout):
    cp = gn_conv._padded_cin(cin)
    cop = gn_conv._padded_cin(cout)
    cbs = sorted({d for d in (128, 256, 384, 512) if cp % d == 0} | {cp}
                 if cp <= 512 else
                 {d for d in (128, 256, 384, 512) if cp % d == 0})
    if cout % 128:
        cobs = [cop]
    else:
        cobs = sorted({d for d in (384, 512, 640, 1280) if cout % d == 0}
                      | {cout})
    bhs = [d for d in (h, h // 2, h // 4, h // 8) if d and h % d == 0]
    out = []
    for bh, cb, cob in itertools.product(bhs, cbs, cobs):
        if gn_conv._vmem_bytes(b, bh, h, cb, cob, 2) > 11 * 1024 * 1024:
            continue
        out.append((bh, cb, cob))
    return out[:10]


def main():
    results = {}
    rng = np.random.default_rng(0)
    for b, h, cin, cout in SHAPES:
        w = h
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.bfloat16)
        a = jnp.asarray(rng.standard_normal((b, cin)), jnp.float32)
        s = jnp.asarray(rng.standard_normal((b, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                        jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        flops = 2 * b * h * w * 9 * cin * cout
        hbm = (b * h * w * cin + 9 * cin * cout + b * h * w * cout) * 2
        floor = max(flops / 197e12, hbm / 819e9) * 1e3
        t_xla = measure(lambda x, a, s, k, b_: gn_conv._conv_reference(
            x, a, s, k, b_, True), x, (a, s, k, bias))
        entry = {"floor_ms": floor, "xla_ms": t_xla, "configs": {}}
        cp = gn_conv._padded_cin(cin)
        for bh, cb, cob in candidates(b, h, cin, cout):
            pc = cp - cin
            po = cob * max(1, cout // cob) - cout

            def f(x, a, s, k2, b2, bh=bh, cb=cb, cob=cob, pc=pc, po=po):
                xp = jnp.pad(x, ((0, 0), (1, 2), (0, 0), (0, pc)))
                wf = jnp.pad(k2.astype(x.dtype),
                             ((0, 0), (0, 0), (0, pc), (0, po))).reshape(
                                 9, cp, cout + po)
                af = jnp.pad(a, ((0, 0), (0, pc)))
                sf = jnp.pad(s, ((0, 0), (0, pc)))
                bf = jnp.pad(b2, (0, po)).reshape(1, cout + po).astype(
                    jnp.float32)
                return gn_conv._gnconv_call(
                    xp, af[:, None, :], sf[:, None, :], wf, bf,
                    h=h, w=w, cout=cout, bh=bh, cb=cb, cob=cob,
                    with_silu=True)

            key = f"{bh},{cb},{cob}"
            try:
                entry["configs"][key] = measure(f, x, (a, s, k, bias))
            except Exception:
                entry["configs"][key] = None
        good = {k: v for k, v in entry["configs"].items() if v}
        best = min(good, key=good.get) if good else None
        entry["best"] = best
        entry["best_ms"] = good.get(best)
        results[f"{b}x{h}x{h}x{cin}->{cout}"] = entry
        print(f"{b}x{h}x{h} {cin}->{cout}: floor {floor:.3f} xla {t_xla:.3f}"
              f" best {entry['best_ms']} @ {best}", flush=True)
        with open("/tmp/gnconv_tune.json", "w") as fo:
            json.dump(results, fo, indent=1)


if __name__ == "__main__":
    main()
