"""Dump the optimized HLO of the UNet forward and print what the named
fusions actually compute (match against profile_fwd's per-op trace)."""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--attn", default="flash")
    p.add_argument("--conv", default="xla")
    p.add_argument("--out", default="/tmp/fwd_hlo.txt")
    p.add_argument("--ops", nargs="*", default=[])
    p.add_argument("--model", choices=["sd15", "sdxl"], default="sd15")
    args = p.parse_args()
    os.environ["LECO_CONV_BACKEND"] = args.conv

    from leco_tpu.lora import LoRASpec, merge_params
    from leco_tpu.models.unet import sd15_config, sdxl_config
    from leco_tpu.testing import make_random_bundle

    cfg = sdxl_config() if args.model == "sdxl" else sd15_config()
    bundle = make_random_bundle(
        config=cfg,
        spec=LoRASpec(rank=4),
        dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16,
        attn_backend=args.attn,
        remat=False,
    )
    params = merge_params(bundle.base_params, bundle.lora_params)
    unet = bundle.unet
    h = args.res // 8
    x = jax.ShapeDtypeStruct((args.batch, h, h, 4), jnp.bfloat16)
    ctx = jax.ShapeDtypeStruct(
        (args.batch, 77, cfg.cross_attention_dim), jnp.bfloat16
    )
    added = None
    if args.model == "sdxl":
        pooled = (cfg.projection_class_embeddings_input_dim
                  - 6 * cfg.addition_time_embed_dim)
        added = {
            "text_embeds": jnp.zeros((args.batch, pooled), jnp.bfloat16),
            "time_ids": jnp.zeros((args.batch, 6), jnp.bfloat16),
        }

    fwd = jax.jit(lambda p, x, c: unet.apply({"params": p}, x, 500.0, c, added))
    compiled = fwd.lower(jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params), x, ctx).compile()
    text = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(text)
    print(f"wrote {len(text)/1e6:.1f} MB to {args.out}")

    for op in args.ops:
        # print the fusion definition line and its computation root
        m = re.search(rf"^\s*%?{re.escape(op)} = .*$", text, re.M)
        if m:
            print(f"\n=== {op} ===\n{m.group(0)[:600]}")
            cm = re.search(r"calls=([%\w.\-]+)", m.group(0))
            if cm:
                comp = cm.group(1).lstrip("%")
                cdef = re.search(
                    rf"^%?{re.escape(comp)} .*?^\}}", text, re.M | re.S
                )
                if cdef:
                    body = cdef.group(0)
                    roots = [
                        ln.strip()[:300]
                        for ln in body.splitlines()
                        if ("dot(" in ln or "convolution(" in ln or "ROOT" in ln)
                    ]
                    print("  " + "\n  ".join(roots[:8]))


if __name__ == "__main__":
    main()
