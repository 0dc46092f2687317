"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes its backends, hence the
environment mutation at import time (standard JAX fake-multi-device trick —
the TPU analog of a fake NCCL backend; see SURVEY.md section 4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
