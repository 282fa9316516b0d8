import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_e2e_ft_tpu.ops import scheduler as S

pytestmark = pytest.mark.slow  # compile-heavy: keeps the "not slow" tier < 5 min



def cfg(**kw):
    return S.SchedulerConfig(**kw)


class TestBetas:
    def test_scaled_linear_endpoints(self):
        c = cfg()
        sched = S.make_schedule(c)
        betas = np.asarray(sched.betas)
        assert betas.shape == (1000,)
        np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-6)
        np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-6)
        # interior: sqrt-space linear
        sqrt_betas = np.sqrt(betas.astype(np.float64))
        diffs = np.diff(sqrt_betas)
        np.testing.assert_allclose(diffs, diffs[0], rtol=1e-3)

    def test_alphas_cumprod_monotone(self):
        sched = S.make_schedule(cfg())
        acp = np.asarray(sched.alphas_cumprod)
        assert np.all(np.diff(acp) < 0)
        np.testing.assert_allclose(acp[0], 1 - 0.00085, rtol=1e-6)
        # independent recomputation
        betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
        ref = np.cumprod(1 - betas)
        np.testing.assert_allclose(acp, ref, rtol=1e-4)

    def test_linear_and_cosine(self):
        b_lin = np.asarray(S.make_schedule(cfg(beta_schedule="linear")).betas)
        np.testing.assert_allclose(b_lin[0], 0.00085, rtol=1e-6)
        b_cos = np.asarray(
            S.make_schedule(cfg(beta_schedule="squaredcos_cap_v2")).betas
        )
        assert np.all(b_cos <= 0.999) and np.all(b_cos > 0)

    def test_zero_snr_rescale(self):
        sched = S.make_schedule(cfg(rescale_betas_zero_snr=True))
        acp = np.asarray(sched.alphas_cumprod)
        assert acp[-1] < 1e-10  # terminal SNR is zero


class TestTimesteps:
    def test_trailing_single_step(self):
        ts = S.inference_timesteps(cfg(timestep_spacing="trailing"), 1)
        np.testing.assert_array_equal(ts, [999])

    def test_trailing_multi(self):
        ts = S.inference_timesteps(cfg(timestep_spacing="trailing"), 4)
        np.testing.assert_array_equal(ts, [999, 749, 499, 249])

    def test_leading_single_step_bug(self):
        # leading spacing starts at steps_offset — the DDIM bug the paper fixes
        ts = S.inference_timesteps(
            cfg(timestep_spacing="leading", steps_offset=1), 1
        )
        np.testing.assert_array_equal(ts, [1])

    def test_leading_multi(self):
        ts = S.inference_timesteps(cfg(timestep_spacing="leading", steps_offset=1), 10)
        np.testing.assert_array_equal(ts, np.arange(0, 10)[::-1] * 100 + 1)

    def test_linspace(self):
        ts = S.inference_timesteps(cfg(timestep_spacing="linspace"), 10)
        assert ts[0] == 999 and ts[-1] == 0 and len(ts) == 10

    def test_prev_timesteps(self):
        c = cfg(timestep_spacing="trailing")
        ts = S.inference_timesteps(c, 4)
        prev = S.previous_timesteps(c, ts, 4)
        np.testing.assert_array_equal(prev, [749, 499, 249, -1])


class TestConversions:
    def setup_method(self):
        self.c = cfg()
        self.sched = S.make_schedule(self.c)
        rng = np.random.default_rng(0)
        self.x0 = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
        self.noise = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
        self.t = jnp.asarray([999, 500])

    def test_v_roundtrip(self):
        """add_noise + velocity target, then recover x0 exactly."""
        noisy = S.add_noise(self.sched, self.x0, self.noise, self.t)
        v = S.velocity(self.sched, self.x0, self.noise, self.t)
        x0_rec = S.pred_original_sample(self.c, self.sched, v, self.t, noisy)
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(self.x0), atol=1e-5)

    def test_epsilon_roundtrip(self):
        c = cfg(prediction_type="epsilon")
        noisy = S.add_noise(self.sched, self.x0, self.noise, self.t)
        x0_rec = S.pred_original_sample(c, self.sched, self.noise, self.t, noisy)
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(self.x0), atol=1e-4)

    def test_sample_identity(self):
        c = cfg(prediction_type="sample")
        out = S.pred_original_sample(c, self.sched, self.x0, self.t, self.x0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(self.x0))

    def test_pred_epsilon_consistency(self):
        """x_t must equal sqrt(a) x0 + sqrt(1-a) eps for recovered (x0, eps)."""
        noisy = S.add_noise(self.sched, self.x0, self.noise, self.t)
        v = S.velocity(self.sched, self.x0, self.noise, self.t)
        x0 = S.pred_original_sample(self.c, self.sched, v, self.t, noisy)
        eps = S.pred_epsilon(self.c, self.sched, v, self.t, noisy)
        acp = np.asarray(self.sched.alphas_cumprod)[np.asarray(self.t)].reshape(-1, 1, 1, 1)
        recon = np.sqrt(acp) * np.asarray(x0) + np.sqrt(1 - acp) * np.asarray(eps)
        np.testing.assert_allclose(recon, np.asarray(noisy), atol=1e-5)


class TestSteps:
    def test_ddim_deterministic_reaches_x0(self):
        """Full-length deterministic DDIM on a linear model recovers x0 at the end."""
        # set_alpha_to_one=True so the terminal step lands exactly on x0
        c = cfg(prediction_type="epsilon", timestep_spacing="trailing", set_alpha_to_one=True)
        sched = S.make_schedule(c)
        rng = np.random.default_rng(1)
        x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
        eps = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))

        plan = S.make_plan(c, 50)
        sample = S.add_noise(sched, x0, eps, jnp.asarray(plan.timesteps[0]))
        for t, pt in zip(plan.timesteps, plan.prev_timesteps):
            # oracle model: predicts the true epsilon implied by the current sample
            acp = sched.alphas_cumprod[int(t)]
            model_eps = (sample - jnp.sqrt(acp) * x0) / jnp.sqrt(1 - acp)
            out = S.ddim_step(c, sched, model_eps, jnp.asarray(int(t)), jnp.asarray(int(pt)), sample)
            sample = out.prev_sample
            np.testing.assert_allclose(
                np.asarray(out.pred_original_sample), np.asarray(x0), atol=1e-3
            )
        np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=1e-3)

    def test_ddim_single_step_zeros_noise(self):
        """The production path: t=999, one step, pred_original_sample is the output."""
        c = cfg()  # v-prediction
        sched = S.make_schedule(c)
        x0 = jnp.ones((1, 4, 4, 4)) * 0.3
        latent = jnp.zeros_like(x0)
        # oracle v for x_t = 0: v = (sqrt(a) * x_t - x0) / sqrt(1-a)... derive from identities:
        # x0 = sqrt(a) x_t - sqrt(1-a) v  =>  v = (sqrt(a) x_t - x0) / sqrt(1-a)
        a = sched.alphas_cumprod[999]
        v = (jnp.sqrt(a) * latent - x0) / jnp.sqrt(1 - a)
        plan = S.make_plan(c, 1)
        out = S.ddim_step(
            c, sched, v, jnp.asarray(plan.timesteps[0]), jnp.asarray(plan.prev_timesteps[0]), latent
        )
        np.testing.assert_allclose(np.asarray(out.pred_original_sample), np.asarray(x0), atol=1e-5)

    def test_ddim_matches_manual_formula(self):
        """One mid-trajectory step against an independently coded numpy DDIM update."""
        c = cfg(prediction_type="epsilon")
        sched = S.make_schedule(c)
        rng = np.random.default_rng(2)
        sample = rng.normal(size=(1, 2, 2, 1)).astype(np.float32)
        model_out = rng.normal(size=(1, 2, 2, 1)).astype(np.float32)
        t, pt = 501, 1
        out = S.ddim_step(
            c, sched, jnp.asarray(model_out), jnp.asarray(t), jnp.asarray(pt), jnp.asarray(sample)
        )
        acp = np.asarray(sched.alphas_cumprod, np.float64)
        a_t, a_p = acp[t], acp[pt]
        x0 = (sample - np.sqrt(1 - a_t) * model_out) / np.sqrt(a_t)
        prev = np.sqrt(a_p) * x0 + np.sqrt(1 - a_p) * model_out
        np.testing.assert_allclose(np.asarray(out.prev_sample), prev, rtol=1e-4, atol=1e-5)

    def test_ddim_boundary_uses_final_alpha(self):
        c = cfg(prediction_type="epsilon", set_alpha_to_one=False)
        sched = S.make_schedule(c)
        sample = jnp.ones((1, 2, 2, 1))
        model_out = jnp.zeros_like(sample)
        out = S.ddim_step(c, sched, model_out, jnp.asarray(999), jnp.asarray(-1), sample)
        acp = np.asarray(sched.alphas_cumprod, np.float64)
        x0 = np.asarray(sample) / np.sqrt(acp[999])
        prev = np.sqrt(acp[0]) * x0  # final_alpha_cumprod = alphas_cumprod[0]
        np.testing.assert_allclose(np.asarray(out.prev_sample), prev, rtol=1e-4)

    def test_ddpm_step_mean_formula(self):
        c = cfg(prediction_type="epsilon")
        sched = S.make_schedule(c)
        rng = np.random.default_rng(3)
        sample = rng.normal(size=(1, 2, 2, 1)).astype(np.float32)
        model_out = rng.normal(size=(1, 2, 2, 1)).astype(np.float32)
        t, pt = 999, 998
        out = S.ddpm_step(
            c, sched, jnp.asarray(model_out), jnp.asarray(t), jnp.asarray(pt), jnp.asarray(sample), key=None
        )
        acp = np.asarray(sched.alphas_cumprod, np.float64)
        a_t, a_p = acp[t], acp[pt]
        cur_a = a_t / a_p
        cur_b = 1 - cur_a
        x0 = (sample - np.sqrt(1 - a_t) * model_out) / np.sqrt(a_t)
        mean = (np.sqrt(a_p) * cur_b / (1 - a_t)) * x0 + (np.sqrt(cur_a) * (1 - a_p) / (1 - a_t)) * sample
        # key=None -> no variance noise; output is the posterior mean
        np.testing.assert_allclose(np.asarray(out.prev_sample), mean, rtol=1e-3, atol=1e-5)

    def test_batched_timesteps(self):
        c = cfg()
        sched = S.make_schedule(c)
        sample = jnp.ones((3, 4, 4, 2))
        model_out = jnp.zeros_like(sample)
        t = jnp.asarray([999, 999, 999])
        pt = jnp.asarray([-1, -1, -1])
        out = S.ddim_step(c, sched, model_out, t, pt, sample)
        assert out.prev_sample.shape == sample.shape


class TestLCM:
    def test_lcm_timesteps_plan(self):
        c = cfg()
        # T=1000, origin=50 -> k=20, origin grid 19..999; 4 steps, stride 12
        ts = S.lcm_timesteps(c, 4)
        np.testing.assert_array_equal(ts, [999, 759, 519, 279])
        # full origin schedule
        ts50 = S.lcm_timesteps(c, 50)
        assert ts50[0] == 999 and ts50[-1] == 19 and len(ts50) == 50
        with pytest.raises(ValueError):
            S.lcm_timesteps(c, 51)
        plan = S.make_lcm_plan(c, 4)
        np.testing.assert_array_equal(plan.prev_timesteps, [759, 519, 279, -1])

    def test_lcm_step_final_is_boundary_scaled_denoised(self):
        """Final step returns c_out*x0 + c_skip*sample (sigma_data=0.5, scaling 10)."""
        c = cfg(prediction_type="epsilon")
        sched = S.make_schedule(c)
        rng = np.random.default_rng(0)
        sample = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
        model_out = rng.normal(size=sample.shape).astype(np.float32)
        t = 279
        out = S.lcm_step(
            c, sched, jnp.asarray(model_out), jnp.asarray(t), jnp.asarray(-1),
            jnp.asarray(sample), key=None, is_last=True,
        )
        acp = np.asarray(sched.alphas_cumprod, np.float64)
        x0 = (sample - np.sqrt(1 - acp[t]) * model_out) / np.sqrt(acp[t])
        scaled = t * 10.0
        c_skip = 0.25 / (scaled**2 + 0.25)
        c_out = scaled / np.sqrt(scaled**2 + 0.25)
        ref = c_out * x0 + c_skip * sample
        np.testing.assert_allclose(np.asarray(out.prev_sample), ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.pred_original_sample), ref, rtol=1e-4, atol=1e-5)

    def test_lcm_step_intermediate_renoises_to_prev_t(self):
        """Non-final steps renoise the denoised estimate to the next plan timestep."""
        import jax

        c = cfg(prediction_type="epsilon")
        sched = S.make_schedule(c)
        sample = jnp.ones((1, 2, 2, 1))
        model_out = jnp.zeros_like(sample)
        t, pt = 999, 759
        key = jax.random.key(3)
        out = S.lcm_step(c, sched, model_out, jnp.asarray(t), jnp.asarray(pt), sample, key=key, is_last=False)
        acp = np.asarray(sched.alphas_cumprod, np.float64)
        x0 = np.asarray(sample) / np.sqrt(acp[t])
        scaled = t * 10.0
        denoised = (scaled / np.sqrt(scaled**2 + 0.25)) * x0 + (0.25 / (scaled**2 + 0.25)) * np.asarray(sample)
        noise = np.asarray(jax.random.normal(key, sample.shape, sample.dtype))
        ref = np.sqrt(acp[pt]) * denoised + np.sqrt(1 - acp[pt]) * noise
        np.testing.assert_allclose(np.asarray(out.prev_sample), ref, rtol=1e-4, atol=1e-5)

    def test_lcm_pipeline_end_to_end(self):
        """A pipeline built from an LCMScheduler checkpoint config runs multi-step."""
        import jax

        from diffusion_e2e_ft_tpu.pipelines import MarigoldPipeline

        pipe = MarigoldPipeline.from_random(jax.random.key(0), scheduler_type="lcm")
        img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)
        out = pipe(img, processing_res=0, denoising_steps=4, noise="gaussian", seed=1, color_map=None)
        assert out.depth_np.shape == (64, 64)
        assert np.isfinite(out.depth_np).all()

    def test_lcm_scheduler_config_roundtrip(self):
        from diffusion_e2e_ft_tpu.pipelines import loading

        c = cfg(original_inference_steps=40, timestep_scaling=10.0)
        hf = loading.scheduler_config_to_hf(c, "LCMScheduler")
        assert hf["original_inference_steps"] == 40
        back = loading.scheduler_config_from_hf(hf)
        assert back == c
