"""Generate the full `model.diffusion_model.*` key+shape inventory for
SD1.5 / SD2.1 / SDXL-base single-file checkpoints, as fixture files.

The inventory is derived from the structure of the ORIGINAL LDM/SGM
`UNetModel` (CompVis ldm/modules/diffusionmodules/openaimodel.py and
Stability sgm equivalents): the nn.Module layout — TimestepEmbedSequential
lists of ResBlock / SpatialTransformer / Down-/Upsample — determines the
key names, and the architecture hyperparameters determine the shapes.
This derivation is deliberately independent of the diffusers-side mapping
in `leco_tpu/models/convert.py` (which the reference gets from diffusers'
`from_single_file`, /root/reference/model_util.py:77-101), so
tests/test_ldm_inventory.py catches any disagreement between the two.

Usage: python scripts/gen_ldm_inventory.py   # rewrites tests/fixtures/
"""

import os

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def _norm(prefix, c):
    return {f"{prefix}.weight": (c,), f"{prefix}.bias": (c,)}


def _conv(prefix, cin, cout, k):
    return {f"{prefix}.weight": (cout, cin, k, k), f"{prefix}.bias": (cout,)}


def _linear(prefix, cin, cout, bias=True):
    d = {f"{prefix}.weight": (cout, cin)}
    if bias:
        d[f"{prefix}.bias"] = (cout,)
    return d


def _resblock(prefix, cin, cout, emb_dim):
    """openaimodel.ResBlock: in_layers = [GroupNorm, SiLU, conv],
    emb_layers = [SiLU, Linear], out_layers = [GroupNorm, SiLU, Dropout, conv],
    skip_connection (1x1 conv) only when channels change."""
    d = {}
    d.update(_norm(f"{prefix}.in_layers.0", cin))
    d.update(_conv(f"{prefix}.in_layers.2", cin, cout, 3))
    d.update(_linear(f"{prefix}.emb_layers.1", emb_dim, cout))
    d.update(_norm(f"{prefix}.out_layers.0", cout))
    d.update(_conv(f"{prefix}.out_layers.3", cout, cout, 3))
    if cin != cout:
        d.update(_conv(f"{prefix}.skip_connection", cin, cout, 1))
    return d


def _spatial_transformer(prefix, c, depth, ctx, linear_proj):
    """attention.SpatialTransformer: norm, proj_in, depth x
    BasicTransformerBlock (attn1 self, attn2 cross, GEGLU ff), proj_out."""
    d = {}
    d.update(_norm(f"{prefix}.norm", c))
    if linear_proj:
        d.update(_linear(f"{prefix}.proj_in", c, c))
        d.update(_linear(f"{prefix}.proj_out", c, c))
    else:
        d.update(_conv(f"{prefix}.proj_in", c, c, 1))
        d.update(_conv(f"{prefix}.proj_out", c, c, 1))
    for i in range(depth):
        b = f"{prefix}.transformer_blocks.{i}"
        for attn, kv in (("attn1", c), ("attn2", ctx)):
            d.update(_linear(f"{b}.{attn}.to_q", c, c, bias=False))
            d.update(_linear(f"{b}.{attn}.to_k", kv, c, bias=False))
            d.update(_linear(f"{b}.{attn}.to_v", kv, c, bias=False))
            d.update(_linear(f"{b}.{attn}.to_out.0", c, c))
        d.update(_linear(f"{b}.ff.net.0.proj", c, c * 8))  # GEGLU: 2 x 4c
        d.update(_linear(f"{b}.ff.net.2", c * 4, c))
        for n in ("norm1", "norm2", "norm3"):
            d.update(_norm(f"{b}.{n}", c))
    return d


def ldm_unet_inventory(
    model_channels=320,
    channel_mult=(1, 2, 4, 4),
    num_res_blocks=2,
    attn_levels=(0, 1, 2),
    transformer_depth=(1, 1, 1, 1),
    context_dim=768,
    in_channels=4,
    out_channels=4,
    adm_in_channels=None,
    linear_proj=False,
):
    """Enumerate every parameter key of openaimodel.UNetModel for the given
    hyperparameters, with its torch shape."""
    emb = model_channels * 4
    d = {}
    d.update(_linear("time_embed.0", model_channels, emb))
    d.update(_linear("time_embed.2", emb, emb))
    if adm_in_channels is not None:  # SDXL: num_classes="sequential"
        d.update(_linear("label_emb.0.0", adm_in_channels, emb))
        d.update(_linear("label_emb.0.2", emb, emb))
    d.update(_conv("input_blocks.0.0", in_channels, model_channels, 3))

    # --- input blocks; record the skip-connection channel stack as we go
    skip_chans = [model_channels]
    ch = model_channels
    idx = 1
    for level, mult in enumerate(channel_mult):
        cout = model_channels * mult
        for _ in range(num_res_blocks):
            d.update(_resblock(f"input_blocks.{idx}.0", ch, cout, emb))
            ch = cout
            if level in attn_levels:
                d.update(
                    _spatial_transformer(
                        f"input_blocks.{idx}.1",
                        ch,
                        transformer_depth[level],
                        context_dim,
                        linear_proj,
                    )
                )
            skip_chans.append(ch)
            idx += 1
        if level != len(channel_mult) - 1:
            d.update(_conv(f"input_blocks.{idx}.0.op", ch, ch, 3))
            skip_chans.append(ch)
            idx += 1

    # --- middle
    mid_depth = transformer_depth[len(channel_mult) - 1]
    d.update(_resblock("middle_block.0", ch, ch, emb))
    d.update(
        _spatial_transformer("middle_block.1", ch, mid_depth, context_dim, linear_proj)
    )
    d.update(_resblock("middle_block.2", ch, ch, emb))

    # --- output blocks (reversed levels; skip channels popped from the stack)
    idx = 0
    for level in reversed(range(len(channel_mult))):
        cout = model_channels * channel_mult[level]
        for i in range(num_res_blocks + 1):
            skip = skip_chans.pop()
            d.update(_resblock(f"output_blocks.{idx}.0", ch + skip, cout, emb))
            ch = cout
            sub = 1
            if level in attn_levels:
                d.update(
                    _spatial_transformer(
                        f"output_blocks.{idx}.{sub}",
                        ch,
                        transformer_depth[level],
                        context_dim,
                        linear_proj,
                    )
                )
                sub += 1
            if level != 0 and i == num_res_blocks:
                d.update(_conv(f"output_blocks.{idx}.{sub}.conv", ch, ch, 3))
            idx += 1

    d.update(_norm("out.0", model_channels))
    d.update(_conv("out.2", model_channels, out_channels, 3))
    return {f"model.diffusion_model.{k}": v for k, v in d.items()}


INVENTORIES = {
    "sd15": dict(context_dim=768),
    "sd21": dict(context_dim=1024, linear_proj=True),
    "sdxl": dict(
        channel_mult=(1, 2, 4),
        attn_levels=(1, 2),
        transformer_depth=(0, 2, 10),
        context_dim=2048,
        adm_in_channels=2816,
        linear_proj=True,
    ),
}


def main():
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for name, kw in INVENTORIES.items():
        inv = ldm_unet_inventory(**kw)
        path = os.path.join(FIXTURE_DIR, f"ldm_unet_keys_{name}.txt")
        with open(path, "w") as f:
            for k in sorted(inv):
                f.write(f"{k} {','.join(map(str, inv[k]))}\n")
        total = 0
        for shape in inv.values():
            n = 1
            for s in shape:
                n *= s
            total += n
        print(f"{name}: {len(inv)} keys, {total:,} params -> {path}")


if __name__ == "__main__":
    main()
