"""Golden tests for the diffusion schedule tables and step math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from d3roma_tpu.ops import (
    ScheduleConfig,
    add_noise,
    ddim_step,
    ddpm_step,
    get_velocity,
    make_betas,
    predict_x0_and_eps,
    set_timesteps,
)
from d3roma_tpu.ops.schedules import rescale_zero_terminal_snr


def test_linear_betas_golden():
    betas = make_betas(1000, "linear", 0.0001, 0.02)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.0001, rtol=1e-10)
    np.testing.assert_allclose(betas[-1], 0.02, rtol=1e-10)
    # linear spacing
    np.testing.assert_allclose(np.diff(betas), np.diff(betas)[0], rtol=1e-8)


def test_scaled_linear_betas_golden():
    betas = make_betas(1000, "scaled_linear", 0.00085, 0.012)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-10)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-10)
    # sqrt-space linearity
    sq = np.sqrt(betas)
    np.testing.assert_allclose(np.diff(sq), np.diff(sq)[0], rtol=1e-8)


def test_cosine_betas_match_iddpm_formula():
    import math

    T = 128
    betas = make_betas(T, "squaredcos_cap_v2")

    def ab(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    expect = [min(1 - ab((i + 1) / T) / ab(i / T), 0.999) for i in range(T)]
    np.testing.assert_allclose(betas, expect, rtol=1e-12)


def test_zero_terminal_snr():
    betas = make_betas(1000, "scaled_linear", 0.00085, 0.012)
    rb = rescale_zero_terminal_snr(betas)
    ab = np.cumprod(1 - rb)
    assert abs(np.sqrt(ab[-1])) < 1e-6  # terminal SNR == 0
    np.testing.assert_allclose(ab[0], np.cumprod(1 - betas)[0], rtol=1e-6)


def test_timestep_spacing_modes():
    cfg = ScheduleConfig(num_train_timesteps=1000, timestep_spacing="leading", steps_offset=1)
    ts = set_timesteps(cfg, 10)
    assert ts.shape == (10,)
    assert list(ts) == [901, 801, 701, 601, 501, 401, 301, 201, 101, 1]

    cfg = ScheduleConfig(num_train_timesteps=1000, timestep_spacing="trailing")
    ts = set_timesteps(cfg, 10)
    assert ts[0] == 999 and ts[-1] == 99
    assert all(np.diff(ts) < 0)

    cfg = ScheduleConfig(num_train_timesteps=1000, timestep_spacing="linspace")
    ts = set_timesteps(cfg, 10)
    assert ts[0] == 999 and ts[-1] == 0

    # custom timestep list
    ts = set_timesteps(cfg, 0, timesteps=[1, 500, 999])
    assert list(ts) == [999, 500, 1]


def test_add_noise_get_velocity_consistency():
    cfg = ScheduleConfig(num_train_timesteps=1000)
    tables = cfg.tables()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 8, 8, 1))
    noise = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 1))
    t = jnp.array([10, 500])

    xt = add_noise(tables, x0, noise, t)
    v = get_velocity(tables, x0, noise, t)

    # v-prediction identity: x0 == sqrt(ab)*x_t - sqrt(1-ab)*v
    ab = tables.alphas_cumprod[t].reshape(-1, 1, 1, 1)
    recon = jnp.sqrt(ab) * xt - jnp.sqrt(1 - ab) * v
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x0), atol=1e-5)


@pytest.mark.parametrize("pred_type", ["epsilon", "sample", "v_prediction"])
def test_predict_x0_roundtrip(pred_type):
    """Feeding the ground-truth model output must recover x0 exactly."""
    cfg = ScheduleConfig(num_train_timesteps=1000, prediction_type=pred_type, clip_sample=False)
    tables = cfg.tables()
    key = jax.random.PRNGKey(42)
    x0 = jax.random.normal(key, (2, 4, 4, 1)) * 0.5
    noise = jax.random.normal(jax.random.fold_in(key, 7), (2, 4, 4, 1))
    t = jnp.array([700, 123])
    xt = add_noise(tables, x0, noise, t)

    if pred_type == "epsilon":
        model_out = noise
    elif pred_type == "sample":
        model_out = x0
    else:
        model_out = get_velocity(tables, x0, noise, t)

    ab = tables.alphas_cumprod[t].reshape(-1, 1, 1, 1)
    pred_x0, pred_eps = predict_x0_and_eps(cfg, model_out, xt, ab)
    np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(x0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pred_eps), np.asarray(noise), atol=1e-4)


def test_ddim_deterministic_full_reverse():
    """With a perfect epsilon oracle, every DDIM step maps
    sqrt(ab_t) x0 + sqrt(1-ab_t) n exactly to the same form at prev_t,
    so the final state is sqrt(ab_final) x0 + sqrt(1-ab_final) n."""
    cfg = ScheduleConfig(
        num_train_timesteps=20, prediction_type="epsilon", clip_sample=False,
        timestep_spacing="leading",
    )
    tables = cfg.tables()
    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(key, (1, 4, 4, 1)) * 0.3
    noise = jax.random.normal(jax.random.fold_in(key, 1), (1, 4, 4, 1))
    ts = set_timesteps(cfg, 20)

    x = add_noise(tables, x0, noise, jnp.array([int(ts[0])]))
    for i, t in enumerate(ts):
        prev_t = int(ts[i + 1]) if i + 1 < len(ts) else -1
        # oracle epsilon for the *current* x: eps = (x - sqrt(ab) x0)/sqrt(1-ab)
        ab = tables.alphas_cumprod[int(t)]
        eps = (x - jnp.sqrt(ab) * x0) / jnp.sqrt(1 - ab)
        out = ddim_step(tables, cfg, eps, jnp.int32(t), jnp.int32(prev_t), x)
        x = out.prev_sample

    # set_alpha_to_one=False: ab at prev_t=-1 is alphas_cumprod[0]
    final_ab = float(tables.final_alpha_cumprod)
    expect = np.sqrt(final_ab) * np.asarray(x0) + np.sqrt(1 - final_ab) * np.asarray(noise)
    np.testing.assert_allclose(np.asarray(x), expect, atol=1e-4)


def test_ddpm_step_matches_posterior_mean_when_deterministic():
    cfg = ScheduleConfig(num_train_timesteps=50, prediction_type="epsilon", clip_sample=False)
    tables = cfg.tables()
    key = jax.random.PRNGKey(11)
    x0 = jax.random.normal(key, (1, 4, 4, 1)) * 0.2
    noise = jax.random.normal(jax.random.fold_in(key, 5), (1, 4, 4, 1))
    t = 30
    xt = add_noise(tables, x0, noise, jnp.array([t]))
    out = ddpm_step(tables, cfg, noise, jnp.int32(t), jnp.int32(t - 1), xt, key=None)

    # against the closed-form posterior-mean tables (adjacent t, so exact)
    expect = (
        tables.posterior_mean_coef1[t] * x0 + tables.posterior_mean_coef2[t] * xt
    )
    np.testing.assert_allclose(np.asarray(out.prev_sample), np.asarray(expect), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.pred_original_sample), np.asarray(x0), atol=1e-5)


def test_guidance_hook_perturbs_x0():
    cfg = ScheduleConfig(num_train_timesteps=50, prediction_type="epsilon", clip_sample=False)
    tables = cfg.tables()
    key = jax.random.PRNGKey(0)
    xt = jax.random.normal(key, (1, 4, 4, 1))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (1, 4, 4, 1))

    shift = 0.37

    def guide(x0, t):
        return x0 + shift

    base = ddim_step(tables, cfg, eps, jnp.int32(30), jnp.int32(20), xt)
    guided = ddim_step(tables, cfg, eps, jnp.int32(30), jnp.int32(20), xt, guidance_fn=guide)
    ab_prev = tables.alphas_cumprod[20]
    np.testing.assert_allclose(
        np.asarray(guided.prev_sample - base.prev_sample),
        np.full((1, 4, 4, 1), float(jnp.sqrt(ab_prev)) * shift, np.float32),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(guided.perturbed_original_sample - guided.pred_original_sample),
        shift, atol=1e-6,
    )


def test_dynamic_threshold():
    from d3roma_tpu.ops import dynamic_threshold

    x = jnp.array([[-5.0, 0.5, 2.0, 1.0]]).reshape(1, 2, 2, 1)
    out = dynamic_threshold(x, ratio=0.5, max_value=2.0)
    # s = quantile(|x|, .5) clipped to [1, 2]; values clipped to [-s, s] then / s
    assert np.abs(np.asarray(out)).max() <= 1.0 + 1e-6


def test_sigmoid_beta_schedule():
    betas = make_betas(100, "sigmoid", 1e-4, 2e-2)
    assert betas.shape == (100,)
    assert (np.diff(betas) > 0).all()  # monotone increasing
    assert betas.min() >= 1e-4 - 1e-9 and betas.max() <= 2e-2 + 1e-9
    with pytest.raises(ValueError):
        make_betas(10, "bogus")


@pytest.mark.parametrize("vt", ["fixed_small", "fixed_small_log",
                                "fixed_large", "fixed_large_log"])
def test_ddpm_fixed_variance_modes(vt):
    cfg = ScheduleConfig(num_train_timesteps=50, prediction_type="epsilon",
                         clip_sample=False, variance_type=vt)
    tables = cfg.tables()
    key = jax.random.PRNGKey(0)
    xt = jax.random.normal(key, (1, 4, 4, 1))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (1, 4, 4, 1))
    out = ddpm_step(tables, cfg, eps, jnp.int32(30), jnp.int32(29), xt,
                    key=jax.random.fold_in(key, 2))
    assert np.all(np.isfinite(np.asarray(out.prev_sample)))


def test_ddpm_learned_range_variance():
    cfg = ScheduleConfig(num_train_timesteps=50, prediction_type="epsilon",
                         clip_sample=False, variance_type="learned_range")
    tables = cfg.tables()
    key = jax.random.PRNGKey(3)
    xt = jax.random.normal(key, (1, 4, 4, 1))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (1, 4, 4, 1))
    # v=-1 -> posterior_log_variance (min); v=+1 -> log beta_t (max)
    for v, _name in ((-jnp.ones_like(xt), "min"), (jnp.ones_like(xt), "max")):
        out = ddpm_step(tables, cfg, eps, jnp.int32(30), jnp.int32(29), xt,
                        key=jax.random.fold_in(key, 2), variance_output=v)
        assert np.all(np.isfinite(np.asarray(out.prev_sample)))


def test_posterior_mean_variance_tables():
    from d3roma_tpu.ops import posterior_mean_variance

    cfg = ScheduleConfig(num_train_timesteps=50)
    tables = cfg.tables()
    key = jax.random.PRNGKey(4)
    x0 = jax.random.normal(key, (2, 4, 4, 1))
    noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.array([10, 40])
    xt = add_noise(tables, x0, noise, t)
    mean, var, logvar = posterior_mean_variance(tables, x0, xt, t)
    assert mean.shape == x0.shape
    np.testing.assert_allclose(np.asarray(jnp.exp(logvar[1])), np.asarray(var[1]),
                               rtol=1e-4)


def _euler_setup(rescale=False, pred="epsilon", T=64):
    from d3roma_tpu.ops.scheduler_step import euler_step, heun_correct

    cfg = ScheduleConfig(num_train_timesteps=T, beta_schedule="linear",
                         prediction_type=pred, clip_sample=False,
                         timestep_spacing="trailing",
                         rescale_betas_zero_snr=rescale)
    return cfg, cfg.tables(), euler_step, heun_correct


def test_euler_equals_ddim_eta0():
    """The Euler PF-ODE step in the rescaled variable is ALGEBRAICALLY the
    DDIM eta=0 update — the implementation computes it in the VP form, so
    the two must agree to float tolerance."""
    cfg, tables, euler_step, _ = _euler_setup()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 1)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    for t, pt in ((48, 32), (32, 16), (16, 0)):
        e = euler_step(tables, cfg, eps, jnp.int32(t), jnp.int32(pt), x)
        d = ddim_step(tables, cfg, eps, jnp.int32(t), jnp.int32(pt), x, eta=0.0)
        np.testing.assert_allclose(np.asarray(e.prev_sample),
                                   np.asarray(d.prev_sample), atol=2e-5)


def test_euler_heun_finite_at_zero_snr_terminal():
    """rescale_betas_zero_snr makes the terminal alpha-bar exactly 0;
    the old (x_hat - x0)/sigma form produced inf/NaN on the first step
    for every prediction type. Both samplers must stay finite."""
    cfg, tables, euler_step, heun_correct = _euler_setup(
        rescale=True, pred="v_prediction")
    assert float(tables.alphas_cumprod[-1]) == 0.0
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 1)), jnp.float32)
    v = jnp.asarray(rng.normal(size=x.shape), jnp.float32) * 0.1
    t, pt = 63, 47  # t at the zero-SNR terminal
    e = euler_step(tables, cfg, v, jnp.int32(t), jnp.int32(pt), x)
    assert np.isfinite(np.asarray(e.prev_sample)).all()
    h = heun_correct(tables, cfg, v, v, jnp.int32(t), jnp.int32(pt), x,
                     e.prev_sample)
    assert np.isfinite(np.asarray(h.prev_sample)).all()
    # from an infinite-sigma start the Heun correction has no finite
    # form: it must fall back to the Euler result
    np.testing.assert_allclose(np.asarray(h.prev_sample),
                               np.asarray(e.prev_sample))


def test_heun_applies_guidance_on_second_derivative():
    """The correction derivative at prev_t must see the SAME guidance
    hook the next euler step would apply there."""
    cfg, tables, euler_step, heun_correct = _euler_setup()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 1)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    calls = []

    def guid(x0, t):
        calls.append(int(np.asarray(t)))
        return x0 + 1.0

    e = euler_step(tables, cfg, eps, jnp.int32(32), jnp.int32(16), x,
                   guidance_fn=guid)
    heun_correct(tables, cfg, eps, eps, jnp.int32(32), jnp.int32(16), x,
                 e.prev_sample, guidance_fn=guid)
    assert 16 in calls and 32 in calls  # d2 guided at prev_t, d1 at t
