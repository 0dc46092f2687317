"""Platform selection workaround for the tunneled `axon` TPU plugin.

The axon PJRT plugin ignores the standard JAX_PLATFORMS env var, so
`JAX_PLATFORMS=cpu python train_lora.py ...` would silently round-trip
through the single tunneled TPU chip (and deadlock against any concurrent
TPU process — the tunnel admits one client). Calling this before any
device use makes the env var behave as documented. tests/conftest.py does
the equivalent for the test suite."""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
