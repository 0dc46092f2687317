"""A/B: batch-2 3x3 conv vs batch-1 "H-fold" form on the real chip.

Round-3's attribution left resnet conv1/conv2 at 70-75% of their shape-aware
floor, and the HLO showed XLA picking the batch-in-sublanes output emitter
(EmitOutputBatchInSublanes) for batch-2 NHWC convs. Hypothesis (round-3
verdict, weak #1): folding the batch dimension into H — stacking the two
samples along H with a 2-row zero seam so each 3x3/stride-1 window never
crosses samples — presents XLA a batch-1 conv with twice the rows, which
uses the ordinary row-major emitter and may tile better.

Exactness: with SAME padding the seam's two zero rows reproduce each
sample's own zero boundary, so rows 0..H-1 and H+2..2H+1 of the folded
output equal the two per-sample outputs bit-for-bit; the two seam rows are
garbage and are sliced away. The fold (pad+reshape) and unfold (slice) ride
inside the timed jit, so the comparison charges the bookkeeping to B.

Run on the chip: python scripts/ab_convfold.py
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax


def bench_fn(fn, x, iters=64):
    def body(c, _):
        return fn(c), None

    run = jax.jit(lambda x: lax.scan(body, x, None, length=iters)[0])
    out = run(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _renorm(y, cin, dtype):
    cout = y.shape[-1]
    if cout >= cin:
        return y[..., :cin] * jnp.asarray(0.999, dtype)
    return jnp.pad(y, [(0, 0), (0, 0), (0, 0), (0, cin - cout)])


def plain_case(h, cin, cout, dtype=jnp.bfloat16):
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), dtype) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(0), (2, h, h, cin), dtype)

    def conv(x):
        y = lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return _renorm(y, cin, dtype)

    return bench_fn(conv, x)


def folded_case(h, cin, cout, dtype=jnp.bfloat16):
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), dtype) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(0), (2, h, h, cin), dtype)

    def conv(x):
        # (2,H,W,C) -> (1, 2H+2, W, C): [sample0, 2 zero rows, sample1]
        xf = jnp.concatenate(
            [x[0], jnp.zeros((2, h, cin), dtype), x[1]], axis=0
        )[None]
        yf = lax.conv_general_dilated(
            xf, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]
        y = jnp.stack([yf[:h], yf[h + 2:]], axis=0)
        return _renorm(y, cin, dtype)

    return bench_fn(conv, x)


SDXL_CASES = [
    # SDXL @1024px batch-2 resnet conv shapes (levels 128/64/32; no 8x8)
    (128, 320, 320),
    (128, 640, 320),
    (128, 960, 320),
    (64, 640, 640),
    (64, 960, 640),
    (64, 1280, 640),
    (32, 1280, 1280),
    (32, 1920, 1280),
    (32, 2560, 1280),
]

CASES = [
    # (spatial, cin, cout) — SD1.5 @512px batch-2 resnet conv shapes
    (64, 320, 320),
    (64, 640, 320),   # up-block concat-widened conv1
    (64, 960, 320),
    (32, 640, 640),
    (32, 960, 640),
    (32, 1280, 640),
    (16, 1280, 1280),
    (16, 1920, 1280),
    (16, 2560, 1280),
    (8, 1280, 1280),
    (8, 2560, 1280),
]


def main():
    dev = jax.devices()[0]
    cases = SDXL_CASES if "--xl" in sys.argv else CASES
    print(f"platform={dev.platform} device={dev} cases={'xl' if cases is SDXL_CASES else 'sd'}", flush=True)
    # correctness pin once (CPU-exact check is in tests; this guards the chip)
    h, cin, cout = 16, 64, 64
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, h, h, cin), jnp.float32)
    ya = lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xf = jnp.concatenate([x[0], jnp.zeros((2, h, cin)), x[1]], axis=0)[None]
    yf = lax.conv_general_dilated(
        xf, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    yb = jnp.stack([yf[:h], yf[h + 2:]], axis=0)
    err = float(jnp.abs(ya - yb).max())
    print(f"fold exactness max|diff| = {err:.3e}")
    assert err == 0.0, "H-fold must be exact"

    tot_a = tot_b = 0.0
    print(f"{'shape':>22} {'plain ms':>9} {'folded ms':>10} {'fold/plain':>10}")
    for h, cin, cout in cases:
        ta = plain_case(h, cin, cout) * 1e3
        tb = folded_case(h, cin, cout) * 1e3
        tot_a += ta
        tot_b += tb
        print(f"(2,{h:3d},{h:3d},{cin:4d})->{cout:4d} {ta:9.3f} {tb:10.3f} {tb / ta:10.2f}")
    print(f"{'TOTAL':>22} {tot_a:9.3f} {tot_b:10.3f} {tot_b / tot_a:10.2f}")


if __name__ == "__main__":
    sys.exit(main())
