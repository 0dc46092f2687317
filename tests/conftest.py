"""Test harness: run everything on a virtual 8-device CPU mesh.

The XLA flag must be set before jax initializes its backends, hence the
environment mutation at import time (standard JAX fake-multi-device trick —
the TPU analog of a fake NCCL backend; see SURVEY.md section 4).

NOTE: in this environment the `axon` TPU plugin ignores the JAX_PLATFORMS
env var, so the platform is forced via jax.config instead — otherwise every
"CPU" test silently round-trips through the single tunneled TPU chip and
concurrent test processes deadlock on it."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# tests that drive the CLI in-process hit enable_compilation_cache(); keep
# their CPU executables out of the TPU benches' persistent cache (listing
# diffs there are the benches' warm/cold proof)
os.environ.setdefault("LECO_TPU_CACHE", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
