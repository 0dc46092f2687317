"""Persistent XLA compilation cache.

The ESD train step is one large program (inner-denoise loop + batched
references + differentiated target); first compilation on TPU takes
minutes (5-28 min observed through the tunneled runtime, load-dependent).
With the persistent cache a second process reaches iteration 1 in ~4.5 min
instead — most of the remainder is executable fetch/deserialize plus the
model-build itself, not recompilation.

History: in round 1 enabling this cache deadlocked at executable-LOAD time
on the tunneled `axon` PJRT runtime, so it shipped opt-in-off. Round 2
re-characterized it (scripts/probe_cache.py: GEMM/conv/Pallas programs,
cold and warm, all clean) and ran the full train step twice cache-enabled
(cold 1676 s -> warm 272 s to iteration 1, identical bench value), so the
default is now ON. LECO_TPU_CACHE=0 opts out if a runtime regresses."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    env = os.environ.get("LECO_TPU_CACHE")
    if env == "0":
        return
    path = path or (env if env not in (None, "0", "1") else None) or os.path.expanduser(
        "~/.cache/leco_tpu_xla"
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover
        print(f"[leco-tpu] compilation cache unavailable: {e}")
