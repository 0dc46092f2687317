"""Shape-aware roofline model of the SD1.5 / SDXL UNet forward on TPU.

For every MXU-bound component this computes the FLOPs and the *attainable*
ceiling given its GEMM shapes — the MXU is 128 lanes wide, so a GEMM whose
contraction or output dim is 40 can never exceed 40/128 of peak no matter
how good the kernel is (level-0 self-attention, head_dim 40, is the big
example). Bandwidth-bound components (norms, samplers) get a bytes/BW
floor instead. Optionally joins the measured per-component times from an
attribute_fwd dump to print measured/attainable fractions.

Usage:
  python scripts/roofline.py [--batch 2] [--res 512] [--model sd15|sdxl]
  python scripts/roofline.py /tmp/fwd_ops.json /tmp/fwd_hlo.txt   # + measured

The peak numbers default to TPU v5e: 197 TFLOP/s bf16, 819 GB/s HBM.
"""

from __future__ import annotations

import argparse
import collections
import sys

PEAK_FLOPS = 197e12  # bf16
PEAK_BW = 819e9
PEAK_VPU = 3.9e12  # ~8x128 lanes x 4 ALUs x ~950 MHz, fp32 elementwise/s

# UNet configs (diffusers unet/config.json of each)
SD15 = dict(
    channels=[320, 640, 1280, 1280],
    heads=8,  # attention_head_dim=8 means 8 heads (diffusers quirk), d=C/8
    head_dim=None,
    tx_layers=[1, 1, 1, 0],  # transformer layers per attn block, per level
    ctx=(77, 768),
)
SDXL = dict(
    channels=[320, 640, 1280],
    heads=None,
    head_dim=64,  # attention_head_dim=64 -> heads = C/64
    tx_layers=[0, 2, 10],  # level 0 has no attention in SDXL
    ctx=(77, 2048),
)
CFG = SD15


def _ceil(x, m):
    return -(-x // m) * m


def gemm_eff(m, k, n):
    """Fraction of MXU peak attainable for a (m,k)@(k,n) bf16 GEMM: padding
    of the contraction dim to 128 and the output dim to 128 lanes (m is the
    streaming dim, effectively unpadded at our sizes)."""
    return (k / _ceil(k, 128)) * (n / _ceil(n, 128)) * min(m / _ceil(m, 8), 1.0)


class Sheet:
    def __init__(self):
        self.rows = collections.defaultdict(lambda: [0.0, 0.0, 0.0])

    def gemm(self, bucket, m, k, n, in_vmem=False):
        """Accumulate an (m,k)@(k,n) GEMM: flops, attainable-floor seconds.
        in_vmem: operands/results stay in VMEM (flash-attention core) — no
        HBM charge for the (m,n) product."""
        fl = 2.0 * m * k * n
        attain = PEAK_FLOPS * gemm_eff(m, k, n)
        by = 0.0 if in_vmem else 2.0 * (m * k + k * n + m * n)
        r = self.rows[bucket]
        r[0] += fl
        r[1] += max(fl / attain, by / PEAK_BW)
        r[2] += by

    def vpu(self, bucket, elems, passes):
        self.rows[bucket][1] += elems * passes / PEAK_VPU

    def bw(self, bucket, nbytes, flops=0.0):
        r = self.rows[bucket]
        r[0] += flops
        r[1] += nbytes / PEAK_BW
        r[2] += nbytes


def conv3x3(sheet, bucket, b, hw, cin, cout):
    # implicit GEMM: M = b*H*W, K = 9*cin, N = cout
    sheet.gemm(bucket, b * hw, 9 * cin, cout)


def attn_block(sheet, b, hw, c, layers):
    n = hw
    heads = CFG["heads"] or c // CFG["head_dim"]
    d = c // heads
    CTX = CFG["ctx"]
    sheet.bw(f"transformer/norm", 2 * 2 * b * hw * c)
    sheet.gemm("transformer/proj", b * n, c, c)  # proj_in
    for _layer in range(layers):
      for which, (nk, kdim) in (("attn1", (n, c)), ("attn2", CTX)):
          sheet.gemm(f"{which}/to_q", b * n, c, c)
          sheet.gemm(f"{which}/to_kv", b * nk, kdim, 2 * c)
        # core: per head (n,d)@(d,nk) and (n,nk)@(nk,d), all in VMEM;
        # softmax = ~2 fp32 VPU passes over N^2 (max + exp; the scale and
        # the denominator are folded into the (n,d) tensors — see
        # ops/flash_attention.py). exp throughput is approximated at one
        # VPU op/element.
          sheet.gemm(f"{which}/core", b * heads * n, d, _ceil(nk, 128), in_vmem=True)
          sheet.gemm(f"{which}/core", b * heads * n, _ceil(nk, 128), d, in_vmem=True)
          sheet.vpu(f"{which}/core", b * heads * n * _ceil(nk, 128), 2)
          sheet.bw(f"{which}/core", 4 * 2 * b * n * c)  # q/k/v/o round-trip
          sheet.gemm(f"{which}/to_out", b * n, c, c)
      for _ in range(3):
          sheet.bw("transformer/ln", 2 * 2 * b * n * c)
      sheet.gemm("transformer/ff", b * n, c, 8 * c)  # GEGLU proj
      sheet.bw("transformer/ff", 2 * 2 * b * n * 4 * c)  # gelu*mul pass
      sheet.gemm("transformer/ff", b * n, 4 * c, c)  # net_2
    sheet.gemm("transformer/proj", b * n, c, c)  # proj_out


def resnet(sheet, b, hw, cin, cout):
    sheet.bw("resnet/norm", 2 * 2 * b * hw * cin)
    conv3x3(sheet, "resnet/conv1", b, hw, cin, cout)
    sheet.gemm("resnet/time_emb", b, 1280, cout)
    sheet.bw("resnet/norm", 2 * 2 * b * hw * cout)
    conv3x3(sheet, "resnet/conv2", b, hw, cout, cout)
    if cin != cout:
        sheet.gemm("resnet/shortcut", b * hw, cin, cout)


def build(b, res):
    chans = CFG["channels"]
    tx = CFG["tx_layers"]
    nlvl = len(chans)
    hw0 = (res // 8) ** 2
    s = Sheet()
    conv3x3(s, "conv_in/out", b, hw0, 4, chans[0])
    s.gemm("time_embedding", b, 320, 1280)
    s.gemm("time_embedding", b, 1280, 1280)

    skips = [(chans[0], hw0)]
    cin = chans[0]
    hw = hw0
    for lvl, c in enumerate(chans):
        for i in range(2):
            resnet(s, b, hw, cin if i == 0 else c, c)
            if tx[lvl]:
                attn_block(s, b, hw, c, tx[lvl])
            skips.append((c, hw))
            cin = c
        if lvl < nlvl - 1:
            conv3x3(s, "updown/sample", b, hw // 4, c, c)  # stride-2 conv
            hw //= 4
            skips.append((c, hw))

    resnet(s, b, hw, chans[-1], chans[-1])  # mid
    attn_block(s, b, hw, chans[-1], tx[-1] or 1)
    resnet(s, b, hw, chans[-1], chans[-1])

    cin = chans[-1]
    for lvl in range(nlvl - 1, -1, -1):
        c = chans[lvl]
        for i in range(3):
            skip_c, _ = skips.pop()
            resnet(s, b, hw, cin + skip_c, c)
            if tx[lvl]:
                attn_block(s, b, hw, c, tx[lvl])
            cin = c
        if lvl > 0:
            # phase-conv upsampler: 2.25x fewer flops than conv-after-2x
            s.gemm("updown/sample", b * hw, 4 * c, 4 * c)
            hw *= 4
    s.bw("conv_in/out", 2 * 2 * b * hw0 * chans[0])  # conv_norm_out
    conv3x3(s, "conv_in/out", b, hw0, chans[0], 4)
    return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dumps", nargs="*", help="ops.json hlo.txt (optional)")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--model", choices=["sd15", "sdxl"], default="sd15")
    args = ap.parse_args()

    global CFG
    CFG = SDXL if args.model == "sdxl" else SD15

    sheet = build(args.batch, args.res)

    measured = {}
    if len(args.dumps) == 2:
        sys.path.insert(0, "scripts")
        import json
        import re

        from attribute_fwd import component_of

        op_ms = json.load(open(args.dumps[0]))
        text = open(args.dumps[1]).read()
        meta = {
            m.group(1): m.group(2)
            for m in re.finditer(r"%([\w.\-]+) = [^\n]*?op_name=\"([^\"]+)\"", text)
        }
        for name, ms in op_ms.items():
            path = meta.get(name)
            comp = component_of(path) if path else "other"
            # attribute_fwd uses attn1(self)/attn2(cross); the sheet doesn't
            comp = comp.replace("(self)", "").replace("(cross)", "")
            measured[comp] = measured.get(comp, 0.0) + ms

    total_fl = sum(r[0] for r in sheet.rows.values())
    total_floor = sum(r[1] for r in sheet.rows.values())
    total_by = sum(r[2] for r in sheet.rows.values())
    print(
        f"{args.model} @{args.res} batch {args.batch}: {total_fl/1e9:.0f} GFLOP, "
        f"{total_by/1e6:.0f} MB min HBM traffic"
    )
    print(
        f"attainable floor {total_floor*1e3:.2f} ms "
        f"(naive 100%-MXU floor {total_fl/PEAK_FLOPS*1e3:.2f} ms)"
    )
    print(f"\n{'component':24s} {'GFLOP':>8s} {'floor ms':>9s} {'meas ms':>8s} {'of attainable':>13s}")
    for name, (fl, floor, by) in sorted(
        sheet.rows.items(), key=lambda kv: -kv[1][1]
    ):
        ms = measured.get(name)
        frac = f"{100*floor*1e3/ms:.0f}%" if ms else ""
        print(
            f"{name:24s} {fl/1e9:8.1f} {floor*1e3:9.3f} "
            f"{ms if ms is not None else float('nan'):8.2f} {frac:>13s}"
        )
    extra = {k: v for k, v in measured.items() if k not in sheet.rows}
    if extra:
        print("\nmeasured-only buckets (not in the model):")
        for k, v in sorted(extra.items(), key=lambda kv: -kv[1]):
            if v > 0.02:
                print(f"{v:8.3f} ms  {k}")


if __name__ == "__main__":
    main()
