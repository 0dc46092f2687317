"""Scheduler step-math cross-validation against an INDEPENDENT numpy
reimplementation of the diffusers algorithms the reference instantiates
(/root/reference/model_util.py:230-278: DDIM / DDPM / LMS / Euler-ancestral,
scaled_linear betas [0.00085, 0.012], 1000 train steps).

diffusers itself is not installed in this environment, so the ground truth
here is written FROM THE PUBLISHED ALGORITHM DEFINITIONS, sharing no code
with leco_tpu/ops/schedulers.py (different parameterization: timestep-indexed
alpha-bar arithmetic instead of precomputed gather tables; LMS coefficients
via numerical quadrature instead of exact polynomial integration). A frozen
golden checksum per scheduler pins today's agreed-on numbers so any future
drift in EITHER implementation fails loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leco_tpu.ops import schedulers as S

T = 1000


def alphas_cumprod():
    betas = np.linspace(0.00085**0.5, 0.012**0.5, T, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


# --------------------------------------------------------------------------
# independent numpy reimplementations (diffusers semantics)
# --------------------------------------------------------------------------


def np_ddim_step(eps, t, prev_t, x, abar, pred="epsilon"):
    a_t = abar[t]
    # the reference's DDIMScheduler(...) omits set_alpha_to_one, so the
    # diffusers default (True -> final_alpha_cumprod = 1.0) applies
    # (/root/reference/model_util.py:239-246)
    a_prev = abar[prev_t] if prev_t >= 0 else 1.0
    if pred == "v_prediction":
        x0 = np.sqrt(a_t) * x - np.sqrt(1 - a_t) * eps
        eps = np.sqrt(a_t) * eps + np.sqrt(1 - a_t) * x
    else:
        x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    return np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps


def np_ddpm_step(eps, t, prev_t, x, abar, noise, pred="epsilon"):
    a_t = abar[t]
    a_prev = abar[prev_t] if prev_t >= 0 else 1.0
    alpha_t = a_t / a_prev  # current (per-step) alpha
    beta_t = 1 - alpha_t
    if pred == "v_prediction":
        x0 = np.sqrt(a_t) * x - np.sqrt(1 - a_t) * eps
    else:
        x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    mean = (np.sqrt(a_prev) * beta_t / (1 - a_t)) * x0 + (
        np.sqrt(alpha_t) * (1 - a_prev) / (1 - a_t)
    ) * x
    var = (1 - a_prev) / (1 - a_t) * beta_t
    if prev_t < 0:
        return mean
    return mean + np.sqrt(var) * noise


def np_sigmas(timesteps, abar):
    return np.sqrt((1 - abar[timesteps]) / abar[timesteps])


def np_euler_a_step(eps, i, x, sigmas, noise, pred="epsilon"):
    s_from, s_to = sigmas[i], sigmas[i + 1]
    if pred == "v_prediction":
        x0 = eps * (-s_from / np.sqrt(s_from**2 + 1)) + x / (s_from**2 + 1)
    else:
        x0 = x - s_from * eps
    s_up = np.sqrt(s_to**2 * (s_from**2 - s_to**2) / s_from**2) if s_to > 0 else 0.0
    s_down = np.sqrt(s_to**2 - s_up**2) if s_to > 0 else 0.0
    d = (x - x0) / s_from
    return x + d * (s_down - s_from) + noise * s_up


def np_lms_coeff(i, j, order, sigmas):
    """Lagrange-basis integral by numerical quadrature (independent of the
    exact-polyint construction in ops/schedulers.py)."""
    k = min(i + 1, order)
    ts = np.linspace(sigmas[i], sigmas[i + 1], 20001)

    def basis(tau):
        prod = np.ones_like(tau)
        for m in range(k):
            if m == j:
                continue
            prod *= (tau - sigmas[i - m]) / (sigmas[i - j] - sigmas[i - m])
        return prod

    return np.trapezoid(basis(ts), ts)


def np_lms_run(eps_fn, x, timesteps, sigmas, order=4):
    derivs = []
    for i in range(len(timesteps)):
        eps = eps_fn(i, x)
        x0 = x - sigmas[i] * eps
        derivs.append((x - x0) / sigmas[i])
        k = min(i + 1, order)
        x = x + sum(
            np_lms_coeff(i, j, order, sigmas) * derivs[len(derivs) - 1 - j]
            for j in range(k)
        )
    return x


# --------------------------------------------------------------------------
# fixtures
# --------------------------------------------------------------------------

N_STEPS = 10
SHAPE = (1, 4, 4, 2)


def fake_eps(i, x):
    """Deterministic pseudo-model output (depends on step + sample)."""
    rng = np.random.default_rng(100 + i)
    return (0.3 * x + rng.standard_normal(SHAPE)).astype(np.float64)


@pytest.fixture(scope="module")
def x0():
    return np.random.default_rng(0).standard_normal(SHAPE)


def run_ours(kind, pred, x, n=N_STEPS):
    sch = S.create_noise_scheduler(kind, prediction_type=pred)
    state = sch.set_timesteps(n)
    lms_hist = jnp.zeros((S.LMS_ORDER,) + SHAPE, jnp.float32)
    xs = jnp.asarray(x, jnp.float32)
    for i in range(n):
        scaled = S.scale_model_input(state, xs, i)
        eps = jnp.asarray(fake_eps(i, np.asarray(scaled)), jnp.float32)
        if kind == "ddim":
            xs = S.step_ddim(state, eps, i, xs)
        elif kind == "ddpm":
            xs = S.step_ddpm(state, eps, i, xs, jax.random.PRNGKey(77 + i))
        elif kind == "euler_a":
            xs = S.step_euler_a(state, eps, i, xs, jax.random.PRNGKey(77 + i))
        else:
            xs, lms_hist = S.step_lms(state, eps, i, xs, lms_hist)
    return np.asarray(xs), state


@pytest.mark.parametrize("pred", ["epsilon", "v_prediction"])
def test_ddim_matches_independent(x0, pred):
    ours, state = run_ours("ddim", pred, x0)
    abar = alphas_cumprod()
    ts = np.asarray(state.timesteps, np.int64)
    x = x0.copy()
    for i in range(N_STEPS):
        eps = fake_eps(i, x)
        prev_t = ts[i] - T // N_STEPS
        x = np_ddim_step(eps, ts[i], prev_t, x, abar, pred)
    np.testing.assert_allclose(ours, x, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("pred", ["epsilon", "v_prediction"])
def test_ddpm_matches_independent(x0, pred):
    ours, state = run_ours("ddpm", pred, x0)
    abar = alphas_cumprod()
    ts = np.asarray(state.timesteps, np.int64)
    x = x0.copy()
    for i in range(N_STEPS):
        eps = fake_eps(i, x)
        prev_t = ts[i] - T // N_STEPS
        noise = np.asarray(
            jax.random.normal(jax.random.PRNGKey(77 + i), SHAPE, jnp.float32)
        )
        x = np_ddpm_step(eps, ts[i], prev_t, x, abar, noise, pred)
    np.testing.assert_allclose(ours, x, rtol=2e-4, atol=2e-4)


def test_euler_a_matches_independent(x0):
    ours, state = run_ours("euler_a", "epsilon", x0)
    abar = alphas_cumprod()
    ts = np.asarray(state.timesteps, np.int64)
    sig = np.concatenate([np_sigmas(ts, abar), [0.0]])
    x = x0 * float(np.asarray(state.init_noise_sigma))
    # ours also starts from x0 (init_noise_sigma applied by latent init, not
    # here) — replicate exactly what run_ours fed in: raw x0
    x = x0.copy()
    for i in range(N_STEPS):
        scaled = x / np.sqrt(sig[i] ** 2 + 1)
        eps = fake_eps(i, scaled)
        noise = np.asarray(
            jax.random.normal(jax.random.PRNGKey(77 + i), SHAPE, jnp.float32)
        )
        x = np_euler_a_step(eps, i, x, sig, noise)
    np.testing.assert_allclose(ours, x, rtol=3e-4, atol=3e-4)


def test_lms_matches_independent(x0):
    ours, state = run_ours("lms", "epsilon", x0)
    abar = alphas_cumprod()
    ts = np.asarray(state.timesteps, np.int64)
    sig = np.concatenate([np_sigmas(ts, abar), [0.0]])

    def eps_fn(i, x):
        return fake_eps(i, x / np.sqrt(sig[i] ** 2 + 1))

    want = np_lms_run(eps_fn, x0.copy(), ts, sig)
    np.testing.assert_allclose(ours, want, rtol=3e-4, atol=3e-4)


# --------------------------------------------------------------------------
# frozen goldens: agreed-on numbers as of 2026-08-16; any future drift in
# either implementation trips these
# --------------------------------------------------------------------------

def test_frozen_goldens(x0):
    got = {}
    for kind in ("ddim", "ddpm", "euler_a", "lms"):
        ours, _ = run_ours(kind, "epsilon", x0)
        got[kind] = (float(ours.sum()), float(np.abs(ours).mean()))
    frozen = {
        "ddim": (-31.669353, 2.607545),
        "ddpm": (-55.562447, 3.234808),
        "euler_a": (-58.477669, 4.141553),
        "lms": (-27.285173, 2.862824),
    }
    for kind, (s, m) in frozen.items():
        np.testing.assert_allclose(got[kind][0], s, rtol=1e-4, err_msg=kind)
        np.testing.assert_allclose(got[kind][1], m, rtol=1e-4, err_msg=kind)
