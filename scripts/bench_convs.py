"""Microbenchmark the hot SD1.5 conv shapes on the real chip: XLA conv vs
im2col-GEMM formulation, reporting achieved TFLOP/s and MFU.

Chained inside one jit (lax.scan carry) so the remote-TPU tunnel cannot
dedupe repeated executions.
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

PEAK = 197e12  # v5e bf16 peak


def bench_fn(fn, x, iters=64):
    def body(c, _):
        return fn(c), None

    run = jax.jit(lambda x: lax.scan(body, x, None, length=iters)[0])
    out = run(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return dt


def conv_case(b, h, cin, cout, stride=1, dtype=jnp.bfloat16):
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), dtype) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, h, cin), dtype)

    def conv(x):
        y = lax.conv_general_dilated(
            x, k, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # keep carry shape: slice/pad back to input shape
        if stride == 2:
            y = jnp.tile(y, (1, 2, 2, 1))
        y = y[:, :h, :h, :]
        if cout >= cin:
            return y[..., :cin] * jnp.bfloat16(0.999) if dtype == jnp.bfloat16 else y[..., :cin] * 0.999
        return jnp.pad(y, [(0, 0), (0, 0), (0, 0), (0, cin - cout)])

    dt = bench_fn(conv, x)
    ho = h // stride
    flops = 2 * b * ho * ho * 9 * cin * cout
    return dt, flops


def im2col_case(b, h, cin, cout, dtype=jnp.bfloat16):
    k = jax.random.normal(jax.random.PRNGKey(1), (9 * cin, cout), dtype) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, h, cin), dtype)

    def conv(x):
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
        cols = [xp[:, i:i + h, j:j + h, :] for i in range(3) for j in range(3)]
        patches = jnp.concatenate(cols, axis=-1).reshape(b * h * h, 9 * cin)
        y = patches @ k
        y = y.reshape(b, h, h, cout)
        if cout >= cin:
            return y[..., :cin] * jnp.bfloat16(0.999)
        return jnp.pad(y, [(0, 0), (0, 0), (0, 0), (0, cin - cout)])

    dt = bench_fn(conv, x)
    flops = 2 * b * h * h * 9 * cin * cout
    return dt, flops


CASES = [
    # (batch, spatial, cin, cout, stride)  — SD1.5 @512px hot convs
    (2, 64, 320, 320, 1),
    (2, 64, 640, 320, 1),
    (2, 64, 960, 320, 1),
    (2, 64, 320, 320, 2),   # downsample
    (2, 32, 640, 640, 1),
    (2, 32, 960, 640, 1),
    (2, 32, 1280, 640, 1),
    (2, 32, 640, 640, 2),
    (2, 16, 1280, 1280, 1),
    (2, 16, 1920, 1280, 1),
    (2, 16, 2560, 1280, 1),
    (2, 16, 1280, 1280, 2),
    (2, 8, 1280, 1280, 1),
    (2, 8, 2560, 1280, 1),
]


def matmul_case(m, kdim, n, dtype=jnp.bfloat16):
    w = jax.random.normal(jax.random.PRNGKey(1), (kdim, n), dtype) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(0), (m, kdim), dtype)

    def mm(x):
        y = x @ w
        if n >= kdim:
            return y[:, :kdim] * jnp.bfloat16(0.999)
        return jnp.pad(y, [(0, 0), (0, kdim - n)])

    dt = bench_fn(mm, x)
    return dt, 2 * m * kdim * n


def main():
    if "--matmul" in sys.argv:
        print(f"{'GEMM case':32s} {'ms':>8s} {'MFU':>8s}")
        for m, kdim, n in [
            (8192, 2880, 320), (8192, 320, 320), (8192, 5760, 320),
            (8192, 8640, 320), (2048, 5760, 640), (2048, 11520, 640),
            (512, 11520, 1280), (512, 23040, 1280), (128, 23040, 1280),
            (8192, 2880, 384), (8192, 2880, 512), (8192, 2880, 128),
            (8192, 2880, 2880), (8192, 320, 2560),
        ]:
            dt, fl = matmul_case(m, kdim, n)
            print(f"{m}x{kdim}x{n}".ljust(32) + f" {dt*1e3:8.3f} {fl/dt/PEAK*100:7.1f}%", flush=True)
        return
    print(f"{'case':32s} {'xla ms':>8s} {'xla MFU':>8s} {'im2col ms':>10s} {'i2c MFU':>8s}")
    for b, h, cin, cout, stride in CASES:
        dt, fl = conv_case(b, h, cin, cout, stride)
        label = f"b{b} {h}x{h} {cin}->{cout} s{stride}"
        if stride == 1:
            dti, fli = im2col_case(b, h, cin, cout)
            print(f"{label:32s} {dt*1e3:8.3f} {fl/dt/PEAK*100:7.1f}% {dti*1e3:10.3f} {fli/dti/PEAK*100:7.1f}%", flush=True)
        else:
            print(f"{label:32s} {dt*1e3:8.3f} {fl/dt/PEAK*100:7.1f}% {'-':>10s} {'-':>8s}", flush=True)


if __name__ == "__main__":
    main()
