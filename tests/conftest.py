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
# Tests get their OWN persistent compilation cache, separate from the TPU
# benches' ~/.cache/leco_tpu_xla (listing diffs there are the benches'
# warm/cold proof, so CPU executables must not land in it). A shared dir —
# rather than LECO_TPU_CACHE=0 — lets identical step programs compile once:
# the resume test's second train() call, the NaN-guard test, and repeat
# suite runs all load instead of recompiling (~60-100 s per step compile
# on the CPU mesh).
os.environ.setdefault("LECO_TPU_CACHE", os.path.expanduser("~/.cache/leco_tpu_xla_cputests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from leco_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
