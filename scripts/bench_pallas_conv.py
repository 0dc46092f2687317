"""Pallas implicit-GEMM conv vs XLA conv on the hot SD shapes (real chip).

Same chained-scan methodology as bench_convs.py, plus a calibration case
(trivial op) measuring the harness' fixed per-step cost so the table shows
both raw and overhead-corrected MFU.
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from leco_tpu.ops.conv import conv3x3_gemm  # noqa: E402

PEAK = 197e12


def bench_fn(fn, x, iters=64):
    def body(c, _):
        return fn(c), None

    run = jax.jit(lambda x: lax.scan(body, x, None, length=iters)[0])
    out = run(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def make_case(b, h, cin, cout, impl):
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.bfloat16) * 0.02
    bias = jnp.zeros((cout,), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, h, cin), jnp.bfloat16)

    def conv(x):
        if impl == "pallas":
            y = conv3x3_gemm(x, k, bias)
        else:
            y = lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias.astype(x.dtype)
        if cout >= cin:
            return y[..., :cin] * jnp.bfloat16(0.999)
        return jnp.pad(y, [(0, 0), (0, 0), (0, 0), (0, cin - cout)])

    dt = bench_fn(conv, x)
    flops = 2 * b * h * h * 9 * cin * cout
    return dt, flops


CASES = [
    (2, 64, 320, 320),
    (2, 64, 640, 320),
    (2, 64, 960, 320),
    (2, 32, 640, 640),
    (2, 32, 960, 640),
    (2, 32, 1280, 640),
    (2, 16, 1280, 1280),
    (2, 16, 1920, 1280),
    (2, 16, 2560, 1280),
    (2, 8, 1280, 1280),
    (2, 8, 2560, 1280),
]


def main():
    # calibration: trivial elementwise op through the same harness
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 320), jnp.bfloat16)
    floor = bench_fn(lambda c: c * jnp.bfloat16(0.999), x)
    print(f"harness floor (trivial op): {floor*1e3:.3f} ms/step")
    hdr = f"{'case':26s} {'xla ms':>8s} {'mfu':>6s} {'adj':>6s} {'pallas ms':>10s} {'mfu':>6s} {'adj':>6s} {'speedup':>8s}"
    print(hdr)
    for b, h, cin, cout in CASES:
        dx, fl = make_case(b, h, cin, cout, "xla")
        dp, _ = make_case(b, h, cin, cout, "pallas")
        adjx = fl / max(dx - floor, 1e-9) / PEAK * 100
        adjp = fl / max(dp - floor, 1e-9) / PEAK * 100
        print(
            f"b{b} {h}x{h} {cin}->{cout}".ljust(26)
            + f" {dx*1e3:8.3f} {fl/dx/PEAK*100:5.1f}% {adjx:5.1f}%"
            + f" {dp*1e3:10.3f} {fl/dp/PEAK*100:5.1f}% {adjp:5.1f}%"
            + f" {dx/dp:7.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
