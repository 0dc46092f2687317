"""Characterize the persistent-compilation-cache deadlock on this runtime.

Round-1 finding: enabling jax's persistent cache deadlocks at executable
LOAD time on the tunneled axon TPU runtime (utils/cache.py keeps it opt-in
off). This probe narrows WHERE: it compiles programs of increasing size /
kind (plain GEMM chain, conv stack, pallas kernel) with the cache enabled,
then re-runs itself in a fresh subprocess to exercise the cache-hit path,
each phase bounded by a timeout so a deadlock is recorded, not suffered.

Usage:  python scripts/probe_cache.py           # orchestrates both runs
        python scripts/probe_cache.py --child N # one phase, in-process
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CACHE_DIR = "/tmp/leco_cache_probe"


def phase(n: int):
    import jax
    import jax.numpy as jnp

    os.makedirs(CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    if n == 0:  # small GEMM chain
        @jax.jit
        def f(x):
            for _ in range(4):
                x = jnp.tanh(x @ x)
            return x

        x = jnp.ones((256, 256), jnp.bfloat16)
        f(x).block_until_ready()
    elif n == 1:  # conv stack (closer to the UNet's op mix)
        @jax.jit
        def f(x, w):
            for _ in range(6):
                x = jax.nn.silu(
                    jax.lax.conv_general_dilated(
                        x, w, (1, 1), ((1, 1), (1, 1)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                )
            return x

        f(
            jnp.ones((1, 64, 64, 128), jnp.bfloat16),
            jnp.ones((3, 3, 128, 128), jnp.bfloat16),
        ).block_until_ready()
    elif n == 2:  # pallas kernel inside
        from leco_tpu.ops.flash_attention import flash_attention

        q = jnp.ones((1, 512, 4, 64), jnp.bfloat16)
        jax.jit(lambda q: flash_attention(q, q, q, 0.125))(q).block_until_ready()
    print(f"phase {n} ok")


def main():
    if "--child" in sys.argv:
        phase(int(sys.argv[sys.argv.index("--child") + 1]))
        return
    for n in (0, 1, 2):
        for attempt in ("cold", "warm"):
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable, __file__, "--child", str(n)],
                    timeout=240,
                    capture_output=True,
                    text=True,
                )
                ok = f"rc={r.returncode}"
                if r.returncode:
                    ok += " " + (r.stderr or "").strip()[-200:]
            except subprocess.TimeoutExpired:
                ok = "TIMEOUT (deadlock)"
            print(f"phase {n} {attempt}: {ok} ({time.time()-t0:.0f}s)", flush=True)
    files = sum(len(fs) for _, _, fs in os.walk(CACHE_DIR))
    print(f"cache dir entries: {files}")


if __name__ == "__main__":
    main()
