"""Real-architecture output pin: one fp32 forward of the FULL sd15-config
UNet on CPU against frozen golden statistics (round-3 verdict, Weak #4 /
Next #8).

Every other numerics test runs the 8-channel tiny UNet; the real
860M-parameter graph was only ever exercised by TPU throughput runs, which
check speed, not outputs. This test pins the actual sd15 graph: parameters
are generated deterministically per-leaf (seeded by the parameter path, so
the pin survives init-order refactors), one 64 px batch-1 forward runs with
a fixed PRNG, and summary statistics + sampled output values are compared
against constants frozen at round 4. Any change to the real graph's wiring
or math moves these numbers.

Regenerate (after an INTENTIONAL architecture change only):
  python tests/test_sd15_pin.py
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leco_tpu.models.unet import UNet2DConditionModel, sd15_config


def _deterministic_params(shapes):
    """Per-leaf params seeded by the parameter PATH: normal*0.05 for
    kernels/biases, 1 + normal*0.05 for norm scales (a near-zero norm scale
    would wash out the signal the pin is meant to capture)."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = {}
    for path, sds in flatten_dict(shapes).items():
        digest = hashlib.sha256("/".join(path).encode()).digest()
        key = jax.random.PRNGKey(int.from_bytes(digest[:4], "little"))
        v = jax.random.normal(key, sds.shape, jnp.float32) * 0.05
        if path[-1] == "scale":
            v = v + 1.0
        flat[path] = v
    return unflatten_dict(flat)


def _forward():
    cfg = sd15_config()
    unet = UNet2DConditionModel(config=cfg)  # fp32, xla attention
    shapes = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, 8, 4), jnp.float32),
            jnp.zeros((), jnp.float32),
            jnp.zeros((1, 77, cfg.cross_attention_dim), jnp.float32),
            None,
        )["params"]
    )
    params = _deterministic_params(shapes)
    kx, kc = jax.random.split(jax.random.PRNGKey(42))
    x = jax.random.normal(kx, (1, 8, 8, 4), jnp.float32)  # 64 px latent
    ctx = jax.random.normal(kc, (1, 77, cfg.cross_attention_dim), jnp.float32)
    out = unet.apply(
        {"params": params}, x, jnp.float32(500.0), ctx, None
    )
    return np.asarray(out)


# frozen at round 4 (2026-08-19), jax 0.9.0 CPU. See module docstring.
GOLDEN = {
    "mean": -0.460245,
    "std": 1.628314,
    "corner": [1.62772, 0.902694, -0.557174, -0.315643],
    "center": [0.717005, -2.937167, -2.010263, -0.457599],
}


@pytest.mark.slow
def test_sd15_config_forward_pin():
    out = _forward()
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(out).all()
    got = {
        "mean": float(out.mean()),
        "std": float(out.std()),
        "corner": [float(v) for v in out[0, 0, 0]],
        "center": [float(v) for v in out[0, 4, 4]],
    }
    np.testing.assert_allclose(got["mean"], GOLDEN["mean"], atol=2e-3)
    np.testing.assert_allclose(got["std"], GOLDEN["std"], atol=2e-3)
    np.testing.assert_allclose(got["corner"], GOLDEN["corner"], atol=5e-3)
    np.testing.assert_allclose(got["center"], GOLDEN["center"], atol=5e-3)


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    jax.config.update("jax_platforms", "cpu")
    out = _forward()
    print("shape", out.shape, "finite", bool(np.isfinite(out).all()))
    print("mean", round(float(out.mean()), 6))
    print("std", round(float(out.std()), 6))
    print("corner", [round(float(v), 6) for v in out[0, 0, 0]])
    print("center", [round(float(v), 6) for v in out[0, 4, 4]])
