"""Multi-host initialization (DCN) plumbing.

Single-host multi-chip needs nothing (jax.devices() sees the whole slice).
For multi-host slices (v5e-16+ pods), call `maybe_initialize_distributed()`
before any jax device use: it runs `jax.distributed.initialize()` when the
standard TPU pod env vars (or explicit coordinator settings) are present,
and is a no-op otherwise. Collectives then ride ICI within a slice and DCN
across hosts — still zero hand-written communication code (SURVEY.md 5.8).
"""

from __future__ import annotations

import os


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when a multi-host environment is detected.
    Returns True if initialization happened."""
    already = os.environ.get("LECO_TPU_DISTRIBUTED_DONE")
    if already:
        return False
    multi_host_markers = (
        "COORDINATOR_ADDRESS",
        "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
        "TPU_WORKER_HOSTNAMES",
    )
    if not any(os.environ.get(k) for k in multi_host_markers):
        return False
    import jax

    try:
        jax.distributed.initialize()
        os.environ["LECO_TPU_DISTRIBUTED_DONE"] = "1"
        print(
            f"[leco-tpu] distributed: process {jax.process_index()} of "
            f"{jax.process_count()}, {jax.local_device_count()} local / "
            f"{jax.device_count()} global devices"
        )
        return True
    except Exception as e:  # pragma: no cover
        print(f"[leco-tpu] jax.distributed.initialize failed: {e}")
        return False
