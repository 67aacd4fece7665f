"""Functional DDPM/DDIM reverse-process steps.

TPU-native replacement for the reference's stateful scheduler objects
(reference: core/scheduler_ddpm.py:460-527, core/scheduler_ddim.py:346-498).
Each step is a pure function `(tables, cfg, model_output, t, prev_t, sample,
key) -> StepOutput`, designed to live inside a jitted `lax.scan` over a static
timestep sequence. The in-step guidance hook of the reference (perturb x_hat0,
recompute the posterior mean — scheduler_ddpm.py:506-517,
scheduler_ddim.py:461-472) maps to the optional `guidance_fn` applied to the
reconstructed x0 before the posterior mean is formed.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from d3roma_tpu.ops.schedules import ScheduleConfig, ScheduleTables, extract

GuidanceFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]  # (pred_x0, t) -> x0


class StepOutput(NamedTuple):
    """Reverse-step result (reference: core/scheduler_ddpm.py:37-55 returns the
    same trio for plotting: previous sample, x0 estimate, perturbed x0)."""

    prev_sample: jnp.ndarray
    pred_original_sample: jnp.ndarray
    perturbed_original_sample: jnp.ndarray


def predict_x0_and_eps(
    cfg: ScheduleConfig,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    alpha_prod_t: jnp.ndarray,
):
    """Reconstruct (x0, epsilon) from the model output for every prediction
    type (reference: core/scheduler_ddpm.py:460-470; `v_pred_depth` shares
    v-prediction sampling math, differing only in the training loss)."""
    beta_prod_t = 1.0 - alpha_prod_t
    sqrt_a = jnp.sqrt(alpha_prod_t)
    sqrt_b = jnp.sqrt(beta_prod_t)
    if cfg.prediction_type == "epsilon":
        pred_x0 = (sample - sqrt_b * model_output) / sqrt_a
        pred_eps = model_output
    elif cfg.prediction_type == "sample":
        pred_x0 = model_output
        pred_eps = (sample - sqrt_a * pred_x0) / sqrt_b
    elif cfg.prediction_type in ("v_prediction", "v_pred_depth"):
        pred_x0 = sqrt_a * sample - sqrt_b * model_output
        pred_eps = sqrt_a * model_output + sqrt_b * sample
    else:
        raise ValueError(f"unknown prediction_type: {cfg.prediction_type!r}")
    return pred_x0, pred_eps


def dynamic_threshold(x0: jnp.ndarray, ratio: float, max_value: float) -> jnp.ndarray:
    """Imagen dynamic thresholding (reference: core/scheduler_ddpm.py:340-378).

    Per-sample quantile of |x0| over all non-batch dims, clamped to
    [1, max_value]; x0 is clipped to [-s, s] and rescaled by s.
    """
    b = x0.shape[0]
    flat = jnp.abs(x0.reshape(b, -1)).astype(jnp.float32)
    s = jnp.quantile(flat, ratio, axis=1)
    s = jnp.clip(s, 1.0, max_value)
    s = s.reshape((b,) + (1,) * (x0.ndim - 1))
    return jnp.clip(x0, -s, s) / s


def _maybe_clip(cfg: ScheduleConfig, x0: jnp.ndarray) -> jnp.ndarray:
    if cfg.thresholding:
        return dynamic_threshold(x0, cfg.dynamic_thresholding_ratio, cfg.sample_max_value)
    if cfg.clip_sample:
        return jnp.clip(x0, -cfg.clip_sample_range, cfg.clip_sample_range)
    return x0


def _gather_prev_alpha(
    tables: ScheduleTables, prev_t: jnp.ndarray, ndim: int, final: jnp.ndarray
) -> jnp.ndarray:
    """alpha_bar[prev_t], falling back to `final` where prev_t < 0."""
    safe = jnp.maximum(prev_t, 0)
    ab_prev = extract(tables.alphas_cumprod, safe, ndim)
    mask = prev_t >= 0
    if jnp.ndim(mask) > 0:
        mask = mask.reshape(mask.shape + (1,) * (ndim - mask.ndim))
    return jnp.where(mask, ab_prev, final)


def ddpm_step(
    tables: ScheduleTables,
    cfg: ScheduleConfig,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
    sample: jnp.ndarray,
    key: Optional[jax.Array] = None,
    guidance_fn: Optional[GuidanceFn] = None,
    variance_output: Optional[jnp.ndarray] = None,
) -> StepOutput:
    """One ancestral DDPM step x_t -> x_{prev_t}.

    `prev_t` is the actual previous timestep in the (possibly spaced) inference
    sequence; pass -1 at the final step. Posterior coefficients are recomputed
    from alpha_bar[t] and alpha_bar[prev_t] so spaced sampling is exact
    (reference: core/scheduler_ddpm.py:460-527). `variance_output` carries the
    model's predicted (log-)variance channels for learned/learned_range modes.
    """
    nd = sample.ndim
    alpha_prod_t = extract(tables.alphas_cumprod, t, nd)
    alpha_prod_t_prev = _gather_prev_alpha(tables, prev_t, nd, jnp.float32(1.0))
    beta_prod_t = 1.0 - alpha_prod_t
    beta_prod_t_prev = 1.0 - alpha_prod_t_prev
    current_alpha_t = alpha_prod_t / alpha_prod_t_prev
    current_beta_t = 1.0 - current_alpha_t

    pred_x0, _ = predict_x0_and_eps(cfg, model_output, sample, alpha_prod_t)
    pred_x0 = _maybe_clip(cfg, pred_x0)
    perturbed_x0 = guidance_fn(pred_x0, t) if guidance_fn is not None else pred_x0

    # Posterior mean mu(x_t, x0) with the (possibly perturbed) x0.
    coef_x0 = jnp.sqrt(alpha_prod_t_prev) * current_beta_t / beta_prod_t
    coef_xt = jnp.sqrt(current_alpha_t) * beta_prod_t_prev / beta_prod_t
    prev_mean = coef_x0 * perturbed_x0 + coef_xt * sample

    if key is not None:
        variance = _ddpm_variance(
            cfg, alpha_prod_t, alpha_prod_t_prev, current_beta_t,
            tables, t, variance_output,
        )
        noise = jax.random.normal(key, sample.shape, dtype=sample.dtype)
        add = jnp.where(_broadcast_mask(t > 0, nd), variance * noise, 0.0)
        prev_sample = prev_mean + add
    else:
        prev_sample = prev_mean

    return StepOutput(prev_sample, pred_x0, perturbed_x0)


def _broadcast_mask(mask: jnp.ndarray, ndim: int) -> jnp.ndarray:
    if jnp.ndim(mask) == 0:
        return mask
    return mask.reshape(mask.shape + (1,) * (ndim - mask.ndim))


def _ddpm_variance(
    cfg: ScheduleConfig,
    alpha_prod_t: jnp.ndarray,
    alpha_prod_t_prev: jnp.ndarray,
    current_beta_t: jnp.ndarray,
    tables: ScheduleTables,
    t: jnp.ndarray,
    variance_output: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Per-mode *standard deviation* multiplier for the sampling noise
    (reference: core/scheduler_ddpm.py:300-338)."""
    variance = (1.0 - alpha_prod_t_prev) / (1.0 - alpha_prod_t) * current_beta_t
    variance = jnp.maximum(variance, 1e-20)
    vt = cfg.variance_type
    if vt == "fixed_small":
        return jnp.sqrt(variance)
    if vt == "fixed_small_log":
        return jnp.exp(0.5 * jnp.log(variance))
    if vt == "fixed_large":
        return jnp.sqrt(jnp.maximum(current_beta_t, 1e-20))
    if vt == "fixed_large_log":
        return jnp.exp(0.5 * jnp.log(jnp.maximum(current_beta_t, 1e-20)))
    if vt == "learned":
        assert variance_output is not None
        # the reference treats the prediction as a RAW variance here
        # (scheduler_ddpm.py:327 returns it unchanged; step takes **0.5 in
        # the else-branch at :500-502) — NOT log-variance like learned_range
        return jnp.sqrt(jnp.maximum(variance_output, 0.0))
    if vt == "learned_range":
        assert variance_output is not None
        min_log = jnp.log(variance)
        max_log = jnp.log(jnp.maximum(current_beta_t, 1e-20))
        frac = (variance_output + 1.0) / 2.0
        return jnp.exp(0.5 * (frac * max_log + (1.0 - frac) * min_log))
    raise ValueError(f"unknown variance_type: {vt!r}")


def ddim_step(
    tables: ScheduleTables,
    cfg: ScheduleConfig,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
    sample: jnp.ndarray,
    eta: float = 0.0,
    key: Optional[jax.Array] = None,
    use_clipped_model_output: bool = False,
    guidance_fn: Optional[GuidanceFn] = None,
) -> StepOutput:
    """One DDIM step (eqs. 12/16 of Song et al.), with the reference's
    guidance hook on x_hat0 (reference: core/scheduler_ddim.py:346-498).

    With `set_alpha_to_one=False` (the reference default), alpha_bar at
    prev_t < 0 is alphas_cumprod[0], not 1 (scheduler_ddim.py:227-231).
    """
    nd = sample.ndim
    alpha_prod_t = extract(tables.alphas_cumprod, t, nd)
    alpha_prod_t_prev = _gather_prev_alpha(tables, prev_t, nd, tables.final_alpha_cumprod)
    beta_prod_t = 1.0 - alpha_prod_t

    pred_x0, pred_eps = predict_x0_and_eps(cfg, model_output, sample, alpha_prod_t)
    pred_x0 = _maybe_clip(cfg, pred_x0)
    perturbed_x0 = guidance_fn(pred_x0, t) if guidance_fn is not None else pred_x0

    if use_clipped_model_output:
        # Re-derive epsilon from the clipped/perturbed x0
        # (reference: core/scheduler_ddim.py:451-453).
        pred_eps = (sample - jnp.sqrt(alpha_prod_t) * perturbed_x0) / jnp.sqrt(beta_prod_t)

    variance = (1.0 - alpha_prod_t_prev) / (1.0 - alpha_prod_t) * (
        1.0 - alpha_prod_t / alpha_prod_t_prev
    )
    std_dev_t = eta * jnp.sqrt(jnp.maximum(variance, 0.0))

    direction = jnp.sqrt(
        jnp.maximum(1.0 - alpha_prod_t_prev - std_dev_t**2, 0.0)
    ) * pred_eps
    prev_sample = jnp.sqrt(alpha_prod_t_prev) * perturbed_x0 + direction

    if eta > 0.0:
        if key is None:
            raise ValueError("eta > 0 requires a PRNG key")
        noise = jax.random.normal(key, sample.shape, dtype=sample.dtype)
        prev_sample = prev_sample + std_dev_t * noise

    return StepOutput(prev_sample, pred_x0, perturbed_x0)


def sigma_of(alpha_prod: jnp.ndarray) -> jnp.ndarray:
    """VP-SDE noise level sigma = sqrt((1-abar)/abar) (k-diffusion/Karras
    convention used by Euler/Heun discrete samplers)."""
    return jnp.sqrt((1.0 - alpha_prod) / alpha_prod)


def euler_step(
    tables: ScheduleTables,
    cfg: ScheduleConfig,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
    sample: jnp.ndarray,
    guidance_fn: Optional[GuidanceFn] = None,
) -> StepOutput:
    """First-order Euler step of the probability-flow ODE in sigma space.

    The reference registers `euler`/`heun` sampler names but its factory
    raises for them (reference: config.py:12-19, 209-210); here they are
    implemented. Works in the rescaled variable x/sqrt(abar) where the ODE
    is dx/dsigma = (x - x0(x, sigma)) / sigma, then converts back to the
    VP parameterization the UNet was trained in — so euler/heun reuse the
    same model and prediction types as DDPM/DDIM.
    """
    nd = sample.ndim
    alpha_prod_t = extract(tables.alphas_cumprod, t, nd)
    alpha_prod_t_prev = _gather_prev_alpha(tables, prev_t, nd, tables.final_alpha_cumprod)

    pred_x0, _ = predict_x0_and_eps(cfg, model_output, sample, alpha_prod_t)
    pred_x0 = _maybe_clip(cfg, pred_x0)
    perturbed_x0 = guidance_fn(pred_x0, t) if guidance_fn is not None else pred_x0

    # The Euler update in the rescaled variable is ALGEBRAICALLY the
    # DDIM eta=0 update: x_hat + (sigma_prev - sigma) * d with
    # d = (x_hat - x0)/sigma = eps reduces to
    # sqrt(a_prev) * x0 + sqrt(1 - a_prev) * eps. Computing it in this
    # VP form keeps the step finite at alpha_prod_t == 0 (the zero-SNR
    # terminal step, where sigma and x_hat are infinite).
    eps_pert = (sample - jnp.sqrt(alpha_prod_t) * perturbed_x0) / jnp.sqrt(
        jnp.maximum(1.0 - alpha_prod_t, 1e-12))
    prev_sample = (jnp.sqrt(alpha_prod_t_prev) * perturbed_x0
                   + jnp.sqrt(jnp.maximum(1.0 - alpha_prod_t_prev, 0.0))
                   * eps_pert)
    return StepOutput(prev_sample, pred_x0, perturbed_x0)


def heun_correct(
    tables: ScheduleTables,
    cfg: ScheduleConfig,
    model_output_t: jnp.ndarray,
    model_output_prev: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
    sample: jnp.ndarray,
    euler_prev_sample: jnp.ndarray,
    guidance_fn: Optional[GuidanceFn] = None,
) -> StepOutput:
    """Second-order Heun correction: average the ODE derivative at (t, x_t)
    and at (prev_t, x_euler), then re-take the step. Falls back to the plain
    Euler result at the final step (sigma_prev == 0), where the correction
    derivative is undefined."""
    nd = sample.ndim
    alpha_prod_t = extract(tables.alphas_cumprod, t, nd)
    alpha_prod_t_prev = _gather_prev_alpha(tables, prev_t, nd, tables.final_alpha_cumprod)
    sigma = sigma_of(alpha_prod_t)
    sigma_prev = sigma_of(alpha_prod_t_prev)

    pred_x0, _ = predict_x0_and_eps(cfg, model_output_t, sample, alpha_prod_t)
    pred_x0 = _maybe_clip(cfg, pred_x0)
    perturbed_x0 = guidance_fn(pred_x0, t) if guidance_fn is not None else pred_x0
    safe_alpha = jnp.maximum(alpha_prod_t, 1e-12)
    safe_sigma = sigma_of(safe_alpha)
    x_hat = sample / jnp.sqrt(safe_alpha)
    d1 = (x_hat - perturbed_x0) / safe_sigma

    # derivative at the Euler-predicted point — with the SAME guidance
    # hook the next euler step would apply there (an unguided d2 biases
    # the averaged derivative toward the unguided trajectory, partially
    # cancelling guidance vs plain euler)
    safe_prev_alpha = jnp.maximum(alpha_prod_t_prev, 1e-12)
    x_hat_prev = euler_prev_sample / jnp.sqrt(safe_prev_alpha)
    pred_x0_2, _ = predict_x0_and_eps(
        cfg, model_output_prev, euler_prev_sample, alpha_prod_t_prev
    )
    pred_x0_2 = _maybe_clip(cfg, pred_x0_2)
    if guidance_fn is not None:
        pred_x0_2 = guidance_fn(pred_x0_2, prev_t)
    safe_sigma_prev = jnp.maximum(sigma_prev, 1e-12)
    d2 = (x_hat_prev - pred_x0_2) / safe_sigma_prev

    d_avg = 0.5 * (d1 + d2)
    x_hat_heun = x_hat + (sigma_prev - safe_sigma) * d_avg
    heun_prev = x_hat_heun * jnp.sqrt(alpha_prod_t_prev)
    # the correction is undefined at the final step (sigma_prev == 0)
    # AND from an infinite-sigma start (zero-SNR terminal alpha == 0,
    # where stepping from sigma = inf has no finite Heun form) — both
    # fall back to the Euler/DDIM-form result
    use_heun = (sigma_prev > 1e-10) & (alpha_prod_t > 1e-10)
    prev_sample = jnp.where(use_heun, heun_prev, euler_prev_sample)
    return StepOutput(prev_sample, pred_x0, perturbed_x0)


def posterior_mean_variance(
    tables: ScheduleTables,
    x0: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
):
    """q(x_{t-1} | x_t, x_0) stats over *training* timesteps, for VLB terms
    (reference: core/scheduler_ddpm.py:559-587)."""
    nd = x_t.ndim
    mean = (
        extract(tables.posterior_mean_coef1, t, nd) * x0
        + extract(tables.posterior_mean_coef2, t, nd) * x_t
    )
    var = extract(tables.posterior_variance, t, nd)
    log_var = extract(tables.posterior_log_variance_clipped, t, nd)
    return mean, var, log_var
