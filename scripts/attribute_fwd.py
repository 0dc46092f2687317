"""Join a per-op trace dump (LECO_PROFILE_DUMP from profile_fwd.py) with the
optimized HLO text (dump_fwd_hlo.py) and attribute device time to model
components — the module path in each op's metadata tells us which layer the
fused op belongs to.

Usage:
  LECO_PROFILE_DUMP=/tmp/fwd_ops.json python scripts/profile_fwd.py ...
  python scripts/dump_fwd_hlo.py --out /tmp/fwd_hlo.txt
  python scripts/attribute_fwd.py /tmp/fwd_ops.json /tmp/fwd_hlo.txt
"""

import collections
import json
import re
import sys


def component_of(op_path: str) -> str:
    """'...UNet2DConditionModel/up_blocks_1/resnets_0/conv1/...' -> a
    coarse component bucket."""
    if "attn1" in op_path or "attn2" in op_path:
        which = "attn1(self)" if "attn1" in op_path else "attn2(cross)"
        for proj in ("to_q", "to_k", "to_v", "to_out"):
            if f"/{proj}" in op_path:
                return f"{which}/{proj}"
        return f"{which}/core"
    for name, pat in [
        ("resnet/conv1", "/conv1/"),
        ("resnet/conv2", "/conv2/"),
        ("resnet/shortcut", "conv_shortcut"),
        ("resnet/time_emb", "time_emb_proj"),
        ("resnet/norm", "/norm1/"),
        ("resnet/norm", "/norm2/"),
        ("updown/sample", "upsamplers"),
        ("updown/sample", "downsamplers"),
        ("transformer/ff", "/ff/"),
        ("transformer/proj", "proj_in"),
        ("transformer/proj", "proj_out"),
        ("transformer/norm", "/norm/"),
        ("transformer/ln", "norm1"),
        ("transformer/ln", "norm2"),
        ("transformer/ln", "norm3"),
        ("conv_in/out", "conv_in"),
        ("conv_in/out", "conv_out"),
        ("conv_in/out", "conv_norm_out"),
        ("time_embedding", "time_embedding"),
    ]:
        if pat in op_path:
            return name
    return "other"


def level_of(op_path: str) -> str:
    m = re.search(r"(down_blocks|up_blocks)_(\d)", op_path)
    if m:
        return f"{m.group(1)}_{m.group(2)}"
    if "mid_block" in op_path:
        return "mid_block"
    return "top"


def main(ops_json: str, hlo_txt: str):
    with open(ops_json) as f:
        op_ms = json.load(f)
    text = open(hlo_txt).read()

    # map HLO instruction name -> jax op path
    meta = {}
    for m in re.finditer(
        r"%([\w.\-]+) = [^\n]*?op_name=\"([^\"]+)\"", text
    ):
        meta[m.group(1)] = m.group(2)

    by_comp = collections.Counter()
    by_level = collections.Counter()
    by_comp_level = collections.Counter()
    unattributed = 0.0
    total = 0.0
    for name, ms in op_ms.items():
        total += ms
        path = meta.get(name)
        if path is None:
            unattributed += ms
            continue
        comp = component_of(path)
        by_comp[comp] += ms
        by_level[level_of(path)] += ms
        by_comp_level[(comp, level_of(path))] += ms

    print(f"total {total:.2f} ms/call, unattributed {unattributed:.2f} ms")
    print("\n== by component ==")
    for comp, ms in by_comp.most_common():
        print(f"{ms:8.3f} ms  {100*ms/total:5.1f}%  {comp}")
    print("\n== by unet level ==")
    for lvl, ms in by_level.most_common():
        print(f"{ms:8.3f} ms  {100*ms/total:5.1f}%  {lvl}")
    print("\n== top component x level ==")
    for (comp, lvl), ms in by_comp_level.most_common(25):
        print(f"{ms:8.3f} ms  {100*ms/total:5.1f}%  {comp:22s} {lvl}")


if __name__ == "__main__":
    main(*sys.argv[1:3])
