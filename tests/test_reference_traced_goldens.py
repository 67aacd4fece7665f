"""Executable-reference scheduler goldens.

The reference's sampling numerics are defined by its *implementations*, not
by closed-form formulas — e.g. `leading` spacing with `steps_offset=1`
off-by-ones (reference: core/scheduler_ddim.py:327-338), the
`set_alpha_to_one=False` final-alpha-bar convention
(core/scheduler_ddim.py:227-231), and the previous-timestep convention
`prev_t = t - T // S` (core/scheduler_ddim.py:413,
core/scheduler_ddpm.py:388-401). This file re-implements the reference's
`MyDDPMScheduler.step` / `MyDDIMScheduler.step` bodies in torch float32
(semantics traced from core/scheduler_ddpm.py:155-527 and
core/scheduler_ddim.py:97-498) and asserts the JAX step functions match
across prediction types x spacings x set_alpha_to_one x eta x variance
modes, including the trailing/leading edge cases.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from d3roma_tpu.ops.scheduler_step import ddim_step, ddpm_step
from d3roma_tpu.ops.schedules import ScheduleConfig, set_timesteps

# --------------------------------------------------------------------- #
# torch float32 port of the reference scheduler numerics
# --------------------------------------------------------------------- #


def _ref_betas(schedule, T, b0, b1):
    # core/scheduler_ddpm.py:167-184 (torch float32 throughout)
    if schedule == "linear":
        return torch.linspace(b0, b1, T, dtype=torch.float32)
    if schedule == "scaled_linear":
        return torch.linspace(b0**0.5, b1**0.5, T, dtype=torch.float32) ** 2
    if schedule == "squaredcos_cap_v2":
        # core/scheduler_ddpm.py:57-96 (betas_for_alpha_bar, cosine)
        def ab(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        return torch.tensor(
            [min(1.0 - ab((i + 1) / T) / ab(i / T), 0.999) for i in range(T)],
            dtype=torch.float32,
        )
    if schedule == "sigmoid":
        betas = torch.linspace(-6, 6, T)
        return torch.sigmoid(betas) * (b1 - b0) + b0
    raise ValueError(schedule)


def _ref_rescale_zero_snr(betas):
    # core/scheduler_ddim.py:97-130
    alphas = 1.0 - betas
    ab = torch.cumprod(alphas, dim=0)
    ab_sqrt = ab.sqrt()
    a0, aT = ab_sqrt[0].clone(), ab_sqrt[-1].clone()
    ab_sqrt = (ab_sqrt - aT) * (a0 / (a0 - aT))
    ab = ab_sqrt**2
    alphas = torch.cat([ab[0:1], ab[1:] / ab[:-1]])
    return 1.0 - alphas


class _RefCommon:
    def __init__(self, T=1000, beta_schedule="linear", beta_start=1e-4,
                 beta_end=0.02, prediction_type="epsilon", clip_sample=False,
                 clip_sample_range=1.0, thresholding=False,
                 dynamic_thresholding_ratio=0.995, sample_max_value=1.0,
                 timestep_spacing="leading", steps_offset=0,
                 rescale_betas_zero_snr=False):
        self.T = T
        self.prediction_type = prediction_type
        self.clip_sample = clip_sample
        self.clip_sample_range = clip_sample_range
        self.thresholding = thresholding
        self.dynamic_thresholding_ratio = dynamic_thresholding_ratio
        self.sample_max_value = sample_max_value
        self.timestep_spacing = timestep_spacing
        self.steps_offset = steps_offset
        betas = _ref_betas(beta_schedule, T, beta_start, beta_end)
        if rescale_betas_zero_snr:
            betas = _ref_rescale_zero_snr(betas)
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = torch.cumprod(self.alphas, dim=0)
        self.num_inference_steps = None

    def set_timesteps(self, S):
        # core/scheduler_ddpm.py:273-297 == core/scheduler_ddim.py:320-343
        self.num_inference_steps = S
        if self.timestep_spacing == "linspace":
            ts = (np.linspace(0, self.T - 1, S).round()[::-1]
                  .copy().astype(np.int64))
        elif self.timestep_spacing == "leading":
            ratio = self.T // S
            ts = (np.arange(0, S) * ratio).round()[::-1].copy().astype(np.int64)
            ts += self.steps_offset
        elif self.timestep_spacing == "trailing":
            ratio = self.T / S
            ts = np.round(np.arange(self.T, 0, -ratio)).astype(np.int64) - 1
        else:
            raise ValueError(self.timestep_spacing)
        self.timesteps = ts
        return ts

    def _threshold(self, x0):
        # core/scheduler_ddpm.py:340-378
        b, c, *rest = x0.shape
        flat = x0.reshape(b, c * int(np.prod(rest)))
        s = torch.quantile(flat.abs(), self.dynamic_thresholding_ratio, dim=1)
        s = torch.clamp(s, min=1.0, max=self.sample_max_value).unsqueeze(1)
        return (torch.clamp(flat, -s, s) / s).reshape(x0.shape)

    def _clip_or_threshold(self, x0):
        if self.thresholding:
            return self._threshold(x0)
        if self.clip_sample:
            return x0.clamp(-self.clip_sample_range, self.clip_sample_range)
        return x0

    def _pred_x0_eps(self, model_output, sample, ab_t):
        bp = 1 - ab_t
        if self.prediction_type == "epsilon":
            x0 = (sample - bp**0.5 * model_output) / ab_t**0.5
            eps = model_output
        elif self.prediction_type == "sample":
            x0 = model_output
            eps = (sample - ab_t**0.5 * x0) / bp**0.5
        elif self.prediction_type in ("v_prediction", "v_pred_depth"):
            x0 = ab_t**0.5 * sample - bp**0.5 * model_output
            eps = ab_t**0.5 * model_output + bp**0.5 * sample
        else:
            raise ValueError(self.prediction_type)
        return x0, eps


class RefDDIM(_RefCommon):
    # core/scheduler_ddim.py:133-498
    def __init__(self, *a, set_alpha_to_one=False, **k):
        super().__init__(*a, **k)
        self.final_alpha_cumprod = (
            torch.tensor(1.0) if set_alpha_to_one else self.alphas_cumprod[0])

    def _get_variance(self, t, prev_t):
        ab_t = self.alphas_cumprod[t]
        ab_prev = (self.alphas_cumprod[prev_t] if prev_t >= 0
                   else self.final_alpha_cumprod)
        return ((1 - ab_prev) / (1 - ab_t)) * (1 - ab_t / ab_prev)

    def step(self, model_output, t, sample, eta=0.0,
             use_clipped_model_output=False, variance_noise=None):
        prev_t = t - self.T // self.num_inference_steps
        ab_t = self.alphas_cumprod[t]
        ab_prev = (self.alphas_cumprod[prev_t] if prev_t >= 0
                   else self.final_alpha_cumprod)
        x0, eps = self._pred_x0_eps(model_output, sample, ab_t)
        x0 = self._clip_or_threshold(x0)
        std_dev_t = eta * self._get_variance(t, prev_t) ** 0.5
        if use_clipped_model_output:
            eps = (sample - ab_t**0.5 * x0) / (1 - ab_t) ** 0.5
        direction = (1 - ab_prev - std_dev_t**2) ** 0.5 * eps
        prev_sample = ab_prev**0.5 * x0 + direction
        if eta > 0:
            prev_sample = prev_sample + std_dev_t * variance_noise
        return prev_sample, x0


class RefDDPM(_RefCommon):
    # core/scheduler_ddpm.py:155-527
    def __init__(self, *a, variance_type="fixed_small", **k):
        super().__init__(*a, **k)
        self.variance_type = variance_type
        self.one = torch.tensor(1.0)

    def previous_timestep(self, t):
        S = self.num_inference_steps or self.T
        return t - self.T // S

    def _get_variance(self, t, predicted_variance=None):
        prev_t = self.previous_timestep(t)
        ab_t = self.alphas_cumprod[t]
        ab_prev = self.alphas_cumprod[prev_t] if prev_t >= 0 else self.one
        current_beta_t = 1 - ab_t / ab_prev
        variance = (1 - ab_prev) / (1 - ab_t) * current_beta_t
        variance = torch.clamp(variance, min=1e-20)
        vt = self.variance_type
        if vt == "fixed_small":
            return variance
        if vt == "fixed_small_log":
            return torch.exp(0.5 * torch.log(variance))
        if vt == "fixed_large":
            return current_beta_t
        if vt == "fixed_large_log":
            return torch.log(current_beta_t)
        if vt == "learned":
            return predicted_variance
        if vt == "learned_range":
            min_log = torch.log(variance)
            max_log = torch.log(current_beta_t)
            frac = (predicted_variance + 1) / 2
            return frac * max_log + (1 - frac) * min_log
        raise ValueError(vt)

    def step(self, model_output, t, sample, variance_noise=None,
             predicted_variance=None):
        prev_t = self.previous_timestep(t)
        ab_t = self.alphas_cumprod[t]
        ab_prev = self.alphas_cumprod[prev_t] if prev_t >= 0 else self.one
        bp_t, bp_prev = 1 - ab_t, 1 - ab_prev
        current_alpha_t = ab_t / ab_prev
        current_beta_t = 1 - current_alpha_t
        x0, _ = self._pred_x0_eps(model_output, sample, ab_t)
        x0 = self._clip_or_threshold(x0)
        c0 = (ab_prev**0.5 * current_beta_t) / bp_t
        ct = current_alpha_t**0.5 * bp_prev / bp_t
        prev_sample = c0 * x0 + ct * sample
        if t > 0:
            v = self._get_variance(t, predicted_variance)
            vt = self.variance_type
            if vt == "fixed_small_log":
                mult = v
            elif vt == "learned_range":
                mult = torch.exp(0.5 * v)
            else:
                mult = v**0.5
            prev_sample = prev_sample + mult * variance_noise
        return prev_sample, x0


# --------------------------------------------------------------------- #
# harness
# --------------------------------------------------------------------- #

SHAPE = (2, 1, 8, 8)  # torch NCHW; jax runs NHWC and is transposed to match


def _rand(key, shape=SHAPE):
    return np.asarray(jax.random.normal(key, shape, dtype=jnp.float32))


def _jax_cfg(ref, **over):
    return ScheduleConfig(
        num_train_timesteps=ref.T,
        beta_schedule=over.get("beta_schedule", "linear"),
        beta_start=over.get("beta_start", 1e-4),
        beta_end=over.get("beta_end", 0.02),
        prediction_type=ref.prediction_type,
        clip_sample=ref.clip_sample,
        clip_sample_range=ref.clip_sample_range,
        thresholding=ref.thresholding,
        dynamic_thresholding_ratio=ref.dynamic_thresholding_ratio,
        sample_max_value=ref.sample_max_value,
        variance_type=getattr(ref, "variance_type", "fixed_small"),
        timestep_spacing=ref.timestep_spacing,
        steps_offset=ref.steps_offset,
        set_alpha_to_one=bool(getattr(ref, "final_alpha_cumprod", None) is not None
                              and float(ref.final_alpha_cumprod) == 1.0),
        rescale_betas_zero_snr=over.get("rescale_betas_zero_snr", False),
    )


SPACINGS = [("leading", 1), ("leading", 0), ("trailing", 0), ("linspace", 0)]
PRED_TYPES = ["epsilon", "sample", "v_prediction"]


def test_timestep_sequences_match_reference():
    """All spacing modes incl. the leading+steps_offset=1 off-by-one."""
    for spacing, offset in SPACINGS:
        for S in (10, 8, 5, 128):
            T = 1000 if S != 128 else 128
            ref = RefDDIM(T=T, timestep_spacing=spacing, steps_offset=offset)
            ref_ts = ref.set_timesteps(min(S, T))
            cfg = ScheduleConfig(num_train_timesteps=T,
                                 timestep_spacing=spacing, steps_offset=offset)
            ts = set_timesteps(cfg, min(S, T))
            np.testing.assert_array_equal(ts, ref_ts, err_msg=f"{spacing}/{offset}/S={S}")


@pytest.mark.parametrize("pred", PRED_TYPES)
@pytest.mark.parametrize("spacing,offset", SPACINGS)
@pytest.mark.parametrize("alpha_one", [False, True])
def test_ddim_step_traced_golden(pred, spacing, offset, alpha_one):
    ref = RefDDIM(prediction_type=pred, timestep_spacing=spacing,
                  steps_offset=offset, set_alpha_to_one=alpha_one,
                  beta_schedule="scaled_linear", beta_start=0.00085,
                  beta_end=0.012)
    ts = ref.set_timesteps(10)
    cfg = _jax_cfg(ref, beta_schedule="scaled_linear",
                   beta_start=0.00085, beta_end=0.012)
    tables = cfg.tables()
    S = 10
    key = jax.random.PRNGKey(hash((pred, spacing, offset)) % (2**31))
    for i, t in enumerate(ts):
        mo = _rand(jax.random.fold_in(key, 2 * i))
        x = _rand(jax.random.fold_in(key, 2 * i + 1))
        ref_prev, ref_x0 = ref.step(torch.from_numpy(mo), int(t),
                                    torch.from_numpy(x))
        prev_t = int(t) - ref.T // S
        out = ddim_step(tables, cfg, jnp.asarray(mo), jnp.int32(int(t)),
                        jnp.int32(prev_t), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out.prev_sample),
                                   ref_prev.numpy(), atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(out.pred_original_sample),
                                   ref_x0.numpy(), atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("eta", [0.3, 1.0])
@pytest.mark.parametrize("clipped", [False, True])
def test_ddim_step_eta_and_clipped_golden(eta, clipped):
    """eta noise + use_clipped_model_output epsilon re-derivation
    (core/scheduler_ddim.py:451-453) with shared variance noise."""
    ref = RefDDIM(prediction_type="epsilon", clip_sample=True,
                  timestep_spacing="leading", steps_offset=1)
    ts = ref.set_timesteps(10)
    cfg = _jax_cfg(ref)
    tables = cfg.tables()
    key = jax.random.PRNGKey(11)
    for i, t in enumerate(ts[:-1]):  # skip final step (prev_t<0: zero var)
        mo = _rand(jax.random.fold_in(key, 3 * i)) * 0.7
        x = _rand(jax.random.fold_in(key, 3 * i + 1))
        nkey = jax.random.fold_in(key, 3 * i + 2)
        noise = np.asarray(
            jax.random.normal(nkey, SHAPE, dtype=jnp.float32))
        ref_prev, _ = ref.step(torch.from_numpy(mo), int(t),
                               torch.from_numpy(x), eta=eta,
                               use_clipped_model_output=clipped,
                               variance_noise=torch.from_numpy(noise))
        out = ddim_step(tables, cfg, jnp.asarray(mo), jnp.int32(int(t)),
                        jnp.int32(int(t) - 100), jnp.asarray(x), eta=eta,
                        key=nkey, use_clipped_model_output=clipped)
        np.testing.assert_allclose(np.asarray(out.prev_sample),
                                   ref_prev.numpy(), atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("pred", PRED_TYPES + ["v_pred_depth"])
@pytest.mark.parametrize("spacing", ["leading", "trailing"])
def test_ddpm_step_traced_golden(pred, spacing):
    ref = RefDDPM(prediction_type=pred, clip_sample=True,
                  timestep_spacing=spacing)
    ts = ref.set_timesteps(10)
    cfg = _jax_cfg(ref)
    tables = cfg.tables()
    key = jax.random.PRNGKey(5)
    for i, t in enumerate(ts):
        mo = _rand(jax.random.fold_in(key, 3 * i))
        x = _rand(jax.random.fold_in(key, 3 * i + 1))
        nkey = jax.random.fold_in(key, 3 * i + 2)
        noise = np.asarray(jax.random.normal(nkey, SHAPE, dtype=jnp.float32))
        ref_prev, ref_x0 = ref.step(torch.from_numpy(mo), int(t),
                                    torch.from_numpy(x),
                                    variance_noise=torch.from_numpy(noise))
        out = ddpm_step(tables, cfg, jnp.asarray(mo), jnp.int32(int(t)),
                        jnp.int32(int(t) - 100), jnp.asarray(x), key=nkey)
        np.testing.assert_allclose(np.asarray(out.prev_sample),
                                   ref_prev.numpy(), atol=3e-5, rtol=3e-5,
                                   err_msg=f"{pred}/{spacing}/t={t}")


@pytest.mark.parametrize("vt", ["fixed_small", "fixed_small_log",
                                "fixed_large", "learned", "learned_range"])
def test_ddpm_variance_modes_golden(vt):
    """Variance modes against the reference's noise-multiplier semantics
    (core/scheduler_ddpm.py:300-338 + step :493-503) — incl. 'learned'
    treating the prediction as RAW variance, not log. 'fixed_large_log'
    is excluded: the reference composes sqrt(log(current_beta_t)) — sqrt
    of a negative number — and NaNs for every t (see the dedicated
    deviation test below)."""
    ref = RefDDPM(prediction_type="epsilon", clip_sample=False,
                  variance_type=vt)
    ts = ref.set_timesteps(10)
    cfg = _jax_cfg(ref)
    tables = cfg.tables()
    key = jax.random.PRNGKey(13)
    for i, t in enumerate(ts[:-1]):
        mo = _rand(jax.random.fold_in(key, 4 * i)) * 0.5
        x = _rand(jax.random.fold_in(key, 4 * i + 1))
        nkey = jax.random.fold_in(key, 4 * i + 2)
        noise = np.asarray(jax.random.normal(nkey, SHAPE, dtype=jnp.float32))
        if vt == "learned":
            pv = np.abs(_rand(jax.random.fold_in(key, 4 * i + 3))) * 0.1
        else:
            pv = np.tanh(_rand(jax.random.fold_in(key, 4 * i + 3)))
        ref_prev, _ = ref.step(torch.from_numpy(mo), int(t),
                               torch.from_numpy(x),
                               variance_noise=torch.from_numpy(noise),
                               predicted_variance=torch.from_numpy(pv))
        out = ddpm_step(tables, cfg, jnp.asarray(mo), jnp.int32(int(t)),
                        jnp.int32(int(t) - 100), jnp.asarray(x), key=nkey,
                        variance_output=jnp.asarray(pv))
        np.testing.assert_allclose(np.asarray(out.prev_sample),
                                   ref_prev.numpy(), atol=3e-5, rtol=3e-5,
                                   err_msg=f"{vt}/t={t}")


@pytest.mark.parametrize("schedule,b0,b1", [
    ("linear", 1e-4, 0.02), ("scaled_linear", 0.00085, 0.012),
    ("squaredcos_cap_v2", 1e-4, 0.02), ("sigmoid", 1e-4, 0.02),
])
def test_beta_schedules_and_zero_snr_golden(schedule, b0, b1):
    for zero_snr in ([False, True] if schedule == "scaled_linear" else [False]):
        ref = RefDDIM(beta_schedule=schedule, beta_start=b0, beta_end=b1,
                      prediction_type="v_prediction",
                      rescale_betas_zero_snr=zero_snr,
                      timestep_spacing="trailing")
        ts = ref.set_timesteps(10)
        cfg = _jax_cfg(ref, beta_schedule=schedule, beta_start=b0,
                       beta_end=b1, rescale_betas_zero_snr=zero_snr)
        tables = cfg.tables()
        # tables themselves (f64-accumulated, f32-cast vs torch f32 chain)
        np.testing.assert_allclose(
            np.asarray(tables.alphas_cumprod),
            ref.alphas_cumprod.numpy(), atol=3e-6, rtol=3e-4)
        key = jax.random.PRNGKey(17)
        for i, t in enumerate(ts):
            mo = _rand(jax.random.fold_in(key, 2 * i)) * 0.5
            x = _rand(jax.random.fold_in(key, 2 * i + 1))
            ref_prev, _ = ref.step(torch.from_numpy(mo), int(t),
                                   torch.from_numpy(x))
            out = ddim_step(tables, cfg, jnp.asarray(mo), jnp.int32(int(t)),
                            jnp.int32(int(t) - 100), jnp.asarray(x))
            np.testing.assert_allclose(
                np.asarray(out.prev_sample), ref_prev.numpy(),
                atol=5e-5, rtol=5e-4, err_msg=f"{schedule}/zsnr={zero_snr}/t={t}")


def test_ddpm_thresholding_golden():
    """Dynamic thresholding quantile path (core/scheduler_ddpm.py:340-378).
    jax and torch quantile use the same linear interpolation."""
    ref = RefDDPM(prediction_type="sample", thresholding=True,
                  clip_sample=False, dynamic_thresholding_ratio=0.995,
                  sample_max_value=1.0, T=128,
                  beta_schedule="squaredcos_cap_v2")
    ts = ref.set_timesteps(8)
    cfg = _jax_cfg(ref, beta_schedule="squaredcos_cap_v2")
    tables = cfg.tables()
    key = jax.random.PRNGKey(23)
    for i, t in enumerate(ts):
        mo = _rand(jax.random.fold_in(key, 3 * i)) * 2.0  # exceed [-1,1]
        x = _rand(jax.random.fold_in(key, 3 * i + 1))
        nkey = jax.random.fold_in(key, 3 * i + 2)
        noise = np.asarray(jax.random.normal(nkey, SHAPE, dtype=jnp.float32))
        ref_prev, ref_x0 = ref.step(torch.from_numpy(mo), int(t),
                                    torch.from_numpy(x),
                                    variance_noise=torch.from_numpy(noise))
        out = ddpm_step(tables, cfg, jnp.asarray(mo), jnp.int32(int(t)),
                        jnp.int32(int(t) - 128 // 8), jnp.asarray(x),
                        key=nkey)
        np.testing.assert_allclose(np.asarray(out.pred_original_sample),
                                   ref_x0.numpy(), atol=3e-5, rtol=3e-5)
        np.testing.assert_allclose(np.asarray(out.prev_sample),
                                   ref_prev.numpy(), atol=3e-5, rtol=3e-5)


def test_sampler_prev_t_convention_matches_reference():
    """The scan's prev_t array must follow the reference's t - T//S
    convention (differs from sequence-next under linspace spacing)."""
    from d3roma_tpu.pipelines.sampling import _timestep_arrays

    cfg = ScheduleConfig(num_train_timesteps=1000, timestep_spacing="linspace")
    ts, prev = _timestep_arrays(cfg, 10)
    np.testing.assert_array_equal(np.asarray(prev), np.asarray(ts) - 100)
    assert int(np.asarray(ts)[0]) == 999 and int(np.asarray(prev)[0]) == 899


def test_ddpm_fixed_large_log_reference_nans_ours_does_not():
    """Documented deviation: the reference's fixed_large_log noise
    multiplier is sqrt(log(current_beta_t)) — sqrt of a negative number —
    so its step NaNs for every t (core/scheduler_ddpm.py:322-323 composed
    with :500-502). Ours implements the Glide-intended
    exp(0.5*log(beta)) = sqrt(current_beta_t) and stays finite."""
    ref = RefDDPM(prediction_type="epsilon", clip_sample=False,
                  variance_type="fixed_large_log")
    ts = ref.set_timesteps(10)
    cfg = _jax_cfg(ref)
    tables = cfg.tables()
    t = int(ts[0])
    mo = _rand(jax.random.PRNGKey(31)) * 0.5
    x = _rand(jax.random.PRNGKey(32))
    nkey = jax.random.PRNGKey(33)
    noise = np.asarray(jax.random.normal(nkey, SHAPE, dtype=jnp.float32))
    ref_prev, _ = ref.step(torch.from_numpy(mo.copy()), t,
                           torch.from_numpy(x.copy()),
                           variance_noise=torch.from_numpy(noise))
    assert np.isnan(ref_prev.numpy()).all()
    out = ddpm_step(tables, cfg, jnp.asarray(mo), jnp.int32(t),
                    jnp.int32(t - 100), jnp.asarray(x), key=nkey)
    assert np.isfinite(np.asarray(out.prev_sample)).all()
