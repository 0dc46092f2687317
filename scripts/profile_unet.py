"""UNet micro-profile on the real chip: fwd and fwd+bwd wall-time, derived
MFU, across attention backends and remat settings.

Usage: python scripts/profile_unet.py [--res 512] [--batch 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def unet_flops(res: int, batch: int) -> float:
    """Rough analytic FLOPs for one SD1.5 UNet forward (batch item @res).
    Counted from conv/matmul dims; good to ~5%."""
    h = res // 8
    # per level: (channels, spatial, n_resnet_convs, attn tokens)
    total = 0.0
    ch = [320, 640, 1280, 1280]
    sp = [h, h // 2, h // 4, h // 8]
    # conv_in/out
    total += 2 * (h * h) * 9 * 4 * 320 * 2
    for i in range(4):
        c, s = ch[i], sp[i]
        n_res = 2 * 3 + 3 * 3  # down 2 + up 3 resnets, ~3 convs each
        total += n_res * 2 * (s * s) * 9 * c * c
        if i < 3:
            n_tf = 5  # 2 down + 3 up transformers
            seq = s * s
            # qkv+out (4 c^2) + ff (8 c^2) per token + attn (2 seq^2 c)
            total += n_tf * (2 * seq * 12 * c * c + 2 * 2 * seq * seq * c)
    # mid block
    c, s = 1280, sp[3]
    total += 2 * 2 * (s * s) * 9 * c * c * 3
    total += 2 * (s * s) * 12 * c * c + 2 * 2 * (s * s) ** 2 * c
    return total * batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from leco_tpu.lora import LoRASpec, merge_params
    from leco_tpu.models.unet import sd15_config
    from leco_tpu.testing import make_random_bundle

    res, batch = args.res, args.batch
    h = res // 8
    flops = unet_flops(res, 1)
    print(f"analytic SD1.5 fwd GFLOPs/img @ {res}px: {flops/1e9:.0f}")

    results = {}
    for backend in ("flash", "xla"):
        for remat in (False, True):
            bundle = make_random_bundle(
                config=sd15_config(),
                spec=LoRASpec(rank=4),
                dtype=jnp.bfloat16,
                param_dtype=jnp.bfloat16,
                attn_backend=backend,
                remat=remat,
            )
            params = merge_params(bundle.base_params, bundle.lora_params)
            unet = bundle.unet
            x = jnp.zeros((batch, h, h, 4), jnp.bfloat16)
            ctx = jnp.zeros((batch, 77, 768), jnp.bfloat16)

            fwd = jax.jit(
                lambda p, x, c: unet.apply({"params": p}, x, 500.0, c)
            )

            def loss(p, x, c):
                return jnp.mean(
                    unet.apply({"params": p}, x, 500.0, c).astype(jnp.float32) ** 2
                )

            bwd = jax.jit(jax.grad(loss))

            # chain outputs into inputs so every call is a REAL execution
            # (identical repeated calls can be deduped by the runtime)
            out = fwd(params, x, ctx)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fwd(params, out, ctx)
            jax.block_until_ready(out)
            t_fwd = (time.perf_counter() - t0) / args.iters

            g = bwd(params, x, ctx)
            jax.block_until_ready(g)
            xg = x
            t0 = time.perf_counter()
            for _ in range(args.iters // 2):
                g = bwd(params, xg, ctx)
                xg = x + g["conv_in"]["bias"][:4].sum()  # data dependence
            jax.block_until_ready(g)
            t_bwd = (time.perf_counter() - t0) / (args.iters // 2)

            mfu_fwd = flops * batch / t_fwd / 197e12 * 100
            key = f"{backend},remat={remat}"
            results[key] = (t_fwd, t_bwd, mfu_fwd)
            print(
                f"{key:18s} fwd {t_fwd*1e3:7.2f}ms ({mfu_fwd:4.1f}% MFU)  "
                f"fwd+bwd {t_bwd*1e3:7.2f}ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
