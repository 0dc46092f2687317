"""Scheduler numerics: golden constants, analytic identities, shape/jit
discipline. The reference delegated these to diffusers (model_util.py:230-278);
here they are first-party code and get first-party tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leco_tpu.ops import schedulers as sched


def make(kind, pred="epsilon"):
    return sched.NoiseScheduler(kind=kind, prediction_type=pred)


class TestScheduleConstants:
    def test_beta_endpoints(self):
        s = make("ddim")
        betas = 1.0 - np.concatenate(
            [[s.alphas_cumprod[0]], s.alphas_cumprod[1:] / s.alphas_cumprod[:-1]]
        )
        assert betas[0] == pytest.approx(0.00085, rel=1e-6)
        assert betas[-1] == pytest.approx(0.012, rel=1e-6)

    def test_alphas_cumprod_monotonic(self):
        s = make("ddim")
        assert np.all(np.diff(s.alphas_cumprod) < 0)
        assert 0 < s.alphas_cumprod[-1] < s.alphas_cumprod[0] < 1

    def test_golden_final_alpha(self):
        # cumprod of (1 - scaled_linear betas) after 1000 steps; this value
        # pins the whole beta schedule.
        s = make("ddim")
        assert s.alphas_cumprod[-1] == pytest.approx(0.00466009851, rel=1e-5)
        assert s.alphas_cumprod[0] == pytest.approx(1.0 - 0.00085, rel=1e-9)


class TestTimesteps:
    def test_leading_spacing_ddim(self):
        st = make("ddim").set_timesteps(50)
        ts = np.asarray(st.timesteps)
        assert ts[0] == 980 and ts[-1] == 0
        assert np.all(np.diff(ts) == -20)

    def test_full_schedule_is_countdown(self):
        for kind in sched.AVAILABLE_SCHEDULERS:
            st = make(kind).set_timesteps(1000)
            ts = np.asarray(st.timesteps)
            assert ts[0] == pytest.approx(999)
            assert ts[-1] == pytest.approx(0)
            assert len(ts) == 1000

    def test_sigma_space_linspace(self):
        st = make("euler_a").set_timesteps(50)
        ts = np.asarray(st.timesteps)
        assert ts[0] == pytest.approx(999.0)
        assert ts[-1] == pytest.approx(0.0)
        assert st.sigmas.shape == (51,)
        assert float(st.sigmas[-1]) == 0.0

    def test_init_noise_sigma(self):
        assert float(make("ddim").set_timesteps(50).init_noise_sigma) == 1.0
        st = make("euler_a").set_timesteps(50)
        # max sigma = sqrt((1-acp)/acp) at t=999
        acp_last = make("ddim").alphas_cumprod[-1]
        expected = np.sqrt((1 - acp_last) / acp_last)
        assert float(st.init_noise_sigma) == pytest.approx(expected, rel=1e-4)


class TestDDIM:
    def test_perfect_model_recovers_x0(self):
        """If the model predicts the true noise exactly, iterating DDIM from
        x_T = sqrt(a)x0 + sqrt(1-a)eps must land exactly on x0."""
        s = make("ddim")
        st = s.set_timesteps(50)
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (1, 8, 8, 4))
        eps = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
        t0 = int(np.asarray(st.timesteps)[0])
        a = s.alphas_cumprod[t0]
        x = np.sqrt(a) * x0 + np.sqrt(1 - a) * eps
        for i in range(50):
            x = sched.step_ddim(st, eps, i, x)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)

    def test_v_prediction_equivalent(self):
        """v = sqrt(a)eps - sqrt(1-a)x must give the same trajectory as eps."""
        s_eps = make("ddim", "epsilon")
        s_v = make("ddim", "v_prediction")
        st_e = s_eps.set_timesteps(10)
        st_v = s_v.set_timesteps(10)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 4))
        eps = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 4))
        for i in range(3):
            sa = st_e.sqrt_alpha_t[i]
            soma = st_e.sqrt_one_minus_alpha_t[i]
            x0 = (x - soma * eps) / sa  # the x0 implied by (x, eps)
            v = sa * eps - soma * x0
            out_e = sched.step_ddim(st_e, eps, i, x)
            out_v = sched.step_ddim(st_v, v, i, x)
            np.testing.assert_allclose(
                np.asarray(out_e), np.asarray(out_v), atol=1e-5
            )
            x = out_e

    def test_jittable_with_traced_index(self):
        st = make("ddim").set_timesteps(50)

        @jax.jit
        def f(i, x, eps):
            return sched.step_ddim(st, eps, i, x)

        x = jnp.ones((1, 4, 4, 4))
        out = f(jnp.int32(3), x, jnp.zeros_like(x))
        assert out.shape == x.shape


class TestDDPM:
    def test_final_step_no_noise(self):
        st = make("ddpm").set_timesteps(50)
        assert float(st.ddpm_std[-1]) == 0.0
        assert float(st.ddpm_std[0]) > 0.0

    def test_posterior_mean_identity(self):
        """For a noiseless consistent signal (x_t = sqrt(a_t) c, x0 = c), the
        posterior mean must equal sqrt(a_prev) c. Algebraically:
        x0_coef + xt_coef*sqrt(a_t) == sqrt(a_prev)."""
        st = make("ddpm").set_timesteps(50)
        lhs = np.asarray(st.ddpm_x0_coef) + np.asarray(st.ddpm_xt_coef) * np.asarray(
            st.sqrt_alpha_t
        )
        np.testing.assert_allclose(lhs, np.asarray(st.sqrt_alpha_prev), rtol=1e-4)

    def test_step_runs(self):
        st = make("ddpm").set_timesteps(50)
        x = jnp.ones((1, 4, 4, 4))
        out = sched.step_ddpm(st, jnp.zeros_like(x), 0, x, jax.random.PRNGKey(0))
        assert out.shape == x.shape


class TestEulerAncestral:
    def test_sigma_decomposition(self):
        """sigma_down^2 + sigma_up^2 == sigma_to^2 at every step."""
        st = make("euler_a").set_timesteps(50)
        down = np.asarray(st.euler_sigma_down)
        up = np.asarray(st.euler_sigma_up)
        to = np.asarray(st.sigmas)[1:]
        np.testing.assert_allclose(down**2 + up**2, to**2, atol=1e-6)

    def test_denoise_direction(self):
        """With a perfect eps prediction, one Euler step must shrink the
        distance to x0."""
        st = make("euler_a").set_timesteps(50)
        x0 = jnp.zeros((1, 4, 4, 4))
        eps = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 4, 4))
        x = x0 + st.sigmas[0] * eps
        out = sched.step_euler_a(st, eps, 0, x, jax.random.PRNGKey(5))
        assert float(jnp.abs(out - x0).mean()) < float(jnp.abs(x - x0).mean())

    def test_scale_model_input(self):
        st = make("euler_a").set_timesteps(50)
        x = jnp.ones((2, 2, 2, 4))
        scaled = sched.scale_model_input(st, x, 0)
        expected = 1.0 / np.sqrt(float(st.sigmas[0]) ** 2 + 1.0)
        np.testing.assert_allclose(np.asarray(scaled)[0, 0, 0, 0], expected, rtol=1e-5)


class TestLMS:
    def test_coeff_first_step_is_euler(self):
        """Order-1 LMS == Euler: coeff[0,0] = sigma[1]-sigma[0]."""
        st = make("lms").set_timesteps(50)
        c = np.asarray(st.lms_coeffs)
        sig = np.asarray(st.sigmas)
        assert c[0, 0] == pytest.approx(sig[1] - sig[0], rel=1e-5)
        assert np.all(c[0, 1:] == 0)

    def test_coeffs_sum_to_sigma_delta(self):
        """Lagrange basis functions sum to 1, so the coefficients at each
        step must sum to sigma[i+1]-sigma[i]."""
        st = make("lms").set_timesteps(50)
        c = np.asarray(st.lms_coeffs)
        sig = np.asarray(st.sigmas)
        np.testing.assert_allclose(c.sum(axis=1), sig[1:] - sig[:-1], rtol=1e-4)

    def test_lms_step_history(self):
        st = make("lms").set_timesteps(50)
        x = jnp.ones((1, 4, 4, 4))
        hist = jnp.zeros((sched.LMS_ORDER, 1, 4, 4, 4))
        out, hist2 = sched.step_lms(st, jnp.ones_like(x), 0, x, hist)
        assert out.shape == x.shape
        assert hist2.shape == hist.shape
        # newest derivative placed at slot 0
        assert float(jnp.abs(hist2[0]).sum()) > 0


class TestTrainPathIndexing:
    def test_1000_step_indexing(self):
        """train_lora.py:195-199 semantics: set_timesteps(1000) then index
        timesteps[int(t_to*1000/max_steps)]."""
        for kind in sched.AVAILABLE_SCHEDULERS:
            st = make(kind).set_timesteps(1000)
            idx = int(25 * 1000 / 50)
            t = float(st.timesteps[idx])
            assert t == pytest.approx(999 - idx, abs=1.0)
