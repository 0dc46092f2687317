"""Persistent XLA compilation cache.

The ESD train step is one large program (inner-denoise loop + batched
references + differentiated target); first compilation on TPU takes minutes.
Enabling JAX's persistent cache makes every later process start warm."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    env = os.environ.get("LECO_TPU_CACHE")
    # Opt-in: on tunneled/proxied TPU runtimes (the `axon` PJRT plugin)
    # enabling the persistent cache deadlocks compilation, so the default is
    # off unless the caller/environment explicitly requests it.
    if path is None and (env is None or env == "0"):
        return
    path = path or (env if env not in ("0", "1") else None) or os.path.expanduser(
        "~/.cache/leco_tpu_xla"
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover
        print(f"[leco-tpu] compilation cache unavailable: {e}")
