"""Noise-schedule tables for diffusion.

Everything here is computed once, host-side, with float64 numpy for accuracy,
then frozen into device arrays. The semantics reproduce the reference's custom
DDPM/DDIM scheduler forks (reference: core/scheduler_ddpm.py:167-223,
core/scheduler_ddim.py:97-130) but as pure tables consumed by functional step
ops — no stateful scheduler object exists on the TPU side.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

BetaSchedule = str  # "linear" | "scaled_linear" | "squaredcos_cap_v2" | "sigmoid"
PredictionType = str  # "epsilon" | "sample" | "v_prediction" | "v_pred_depth"
TimestepSpacing = str  # "linspace" | "leading" | "trailing"


def make_betas(
    num_train_timesteps: int,
    beta_schedule: BetaSchedule = "linear",
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
    max_beta: float = 0.999,
) -> np.ndarray:
    """Beta table for the forward process (reference: core/scheduler_ddpm.py:167-184)."""
    T = num_train_timesteps
    if beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, T, dtype=np.float64)
    elif beta_schedule == "scaled_linear":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, T, dtype=np.float64) ** 2
    elif beta_schedule == "squaredcos_cap_v2":
        # iDDPM cosine alpha-bar schedule.
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = np.array(
            [
                min(1.0 - alpha_bar((i + 1) / T) / alpha_bar(i / T), max_beta)
                for i in range(T)
            ],
            dtype=np.float64,
        )
    elif beta_schedule == "sigmoid":
        betas = 1.0 / (1.0 + np.exp(-np.linspace(-6.0, 6.0, T, dtype=np.float64)))
        betas = betas * (beta_end - beta_start) + beta_start
    else:
        raise ValueError(f"unknown beta_schedule: {beta_schedule!r}")
    return betas


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Shift/scale alpha-bar so the terminal SNR is exactly zero.

    Reference: core/scheduler_ddim.py:97-130 (Lin et al., "Common Diffusion
    Noise Schedules and Sample Steps are Flawed").
    """
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    sqrt_ab = np.sqrt(alphas_cumprod)

    ab_0 = sqrt_ab[0].copy()
    ab_T = sqrt_ab[-1].copy()
    sqrt_ab = sqrt_ab - ab_T  # terminal -> 0
    sqrt_ab = sqrt_ab * ab_0 / (ab_0 - ab_T)  # initial unchanged

    alphas_cumprod = sqrt_ab**2
    alphas = alphas_cumprod[1:] / alphas_cumprod[:-1]
    alphas = np.concatenate([alphas_cumprod[:1], alphas])
    return 1.0 - alphas


@dataclasses.dataclass(frozen=True)
class ScheduleConfig:
    """Static (trace-time) diffusion schedule configuration.

    Mirrors the knobs of the reference schedulers so task presets translate
    1:1 (reference: core/scheduler_ddpm.py:101-160, core/scheduler_ddim.py:133-240).
    """

    num_train_timesteps: int = 1000
    beta_schedule: BetaSchedule = "linear"
    beta_start: float = 0.0001
    beta_end: float = 0.02
    prediction_type: PredictionType = "epsilon"
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    sample_max_value: float = 1.0
    variance_type: str = "fixed_small"  # DDPM only
    timestep_spacing: TimestepSpacing = "leading"
    steps_offset: int = 0
    set_alpha_to_one: bool = False  # DDIM final-alpha convention
    rescale_betas_zero_snr: bool = False

    def tables(self) -> "ScheduleTables":
        return ScheduleTables.create(self)


@dataclasses.dataclass(frozen=True)
class ScheduleTables:
    """Precomputed per-timestep tables as device arrays (all shape [T])."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    # alpha_cumprod of the "previous" training timestep, prepended with the
    # final-alpha convention (1.0 if set_alpha_to_one else alphas_cumprod[0]).
    final_alpha_cumprod: jnp.ndarray  # scalar
    # iDDPM posterior stats
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray  # coefficient of x0
    posterior_mean_coef2: jnp.ndarray  # coefficient of x_t

    @staticmethod
    def create(cfg: ScheduleConfig) -> "ScheduleTables":
        betas = make_betas(
            cfg.num_train_timesteps, cfg.beta_schedule, cfg.beta_start, cfg.beta_end
        )
        if cfg.rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        alphas = 1.0 - betas
        ab = np.cumprod(alphas)
        ab_prev = np.concatenate([[1.0], ab[:-1]])

        post_var = betas * (1.0 - ab_prev) / (1.0 - ab)
        # log-variance clipped at t=0 because posterior variance is 0 there
        # (reference: core/scheduler_ddpm.py:204-206).
        post_log_var = np.log(np.concatenate([[post_var[1]], post_var[1:]]))
        coef1 = betas * np.sqrt(ab_prev) / (1.0 - ab)
        coef2 = (1.0 - ab_prev) * np.sqrt(alphas) / (1.0 - ab)

        final_ab = 1.0 if cfg.set_alpha_to_one else float(ab[0])
        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return ScheduleTables(
            betas=f32(betas),
            alphas=f32(alphas),
            alphas_cumprod=f32(ab),
            sqrt_alphas_cumprod=f32(np.sqrt(ab)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - ab)),
            final_alpha_cumprod=f32(final_ab),
            posterior_variance=f32(post_var),
            posterior_log_variance_clipped=f32(post_log_var),
            posterior_mean_coef1=f32(coef1),
            posterior_mean_coef2=f32(coef2),
        )


def set_timesteps(
    cfg: ScheduleConfig,
    num_inference_steps: int,
    timesteps: Optional[Sequence[int]] = None,
) -> np.ndarray:
    """Inference timestep sequence (descending), computed at trace time.

    Reproduces linspace/leading/trailing spacing and custom timestep lists
    (reference: core/scheduler_ddpm.py:225-298, core/scheduler_ddim.py:280-344).
    Returns host numpy int32 so the sampling loop unrolls/scans over a static
    schedule.
    """
    T = cfg.num_train_timesteps
    if timesteps is not None:
        ts = np.asarray(sorted(set(int(t) for t in timesteps), reverse=True))
        if ts.size == 0:
            raise ValueError("custom timesteps must be non-empty")
        if ts.max() >= T or ts.min() < 0:
            raise ValueError(f"custom timesteps out of range [0, {T})")
        return ts.astype(np.int32)

    if num_inference_steps > T:
        raise ValueError(
            f"num_inference_steps ({num_inference_steps}) > num_train_timesteps ({T})"
        )
    if cfg.timestep_spacing == "linspace":
        ts = np.linspace(0, T - 1, num_inference_steps).round()[::-1].astype(np.int64)
    elif cfg.timestep_spacing == "leading":
        step_ratio = T // num_inference_steps
        ts = (np.arange(num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        ts += cfg.steps_offset
        # steps == T with steps_offset=1 computes timestep T — the
        # reference's own off-by-one (scheduler_ddim.py:327-338), pinned
        # by tests/test_reference_traced_goldens.py. extract()'s
        # jnp.take clips it to T-1 (a duplicated first step), which is
        # the kindest faithful handling; do NOT "fix" the sequence here.
    elif cfg.timestep_spacing == "trailing":
        step_ratio = T / num_inference_steps
        ts = np.round(np.arange(T, 0, -step_ratio)).astype(np.int64) - 1
    else:
        raise ValueError(f"unknown timestep_spacing: {cfg.timestep_spacing!r}")
    return ts.astype(np.int32)


def extract(table: jnp.ndarray, t: jnp.ndarray, broadcast_ndim: int) -> jnp.ndarray:
    """Gather per-timestep values and reshape for NHWC broadcasting.

    table: [T]; t: [] or [B] int; returns shape [B, 1, ..., 1] with
    `broadcast_ndim` total dims (or scalar if t is scalar).
    """
    vals = jnp.take(table, t, axis=0)
    if vals.ndim == 0:
        return vals
    return vals.reshape(vals.shape + (1,) * (broadcast_ndim - vals.ndim))


def add_noise(
    tables: ScheduleTables, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Forward process q(x_t | x_0) (reference: core/scheduler_ddpm.py:528-557)."""
    a = extract(tables.sqrt_alphas_cumprod, t, x0.ndim)
    b = extract(tables.sqrt_one_minus_alphas_cumprod, t, x0.ndim)
    return a * x0 + b * noise


def get_velocity(
    tables: ScheduleTables, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """v-prediction target (reference: core/scheduler_ddpm.py:589-611)."""
    a = extract(tables.sqrt_alphas_cumprod, t, x0.ndim)
    b = extract(tables.sqrt_one_minus_alphas_cumprod, t, x0.ndim)
    return a * noise - b * x0


def snr(tables: ScheduleTables, t: jnp.ndarray) -> jnp.ndarray:
    """Signal-to-noise ratio alpha_bar / (1 - alpha_bar) at timestep t."""
    ab = jnp.take(tables.alphas_cumprod, t, axis=0)
    return ab / (1.0 - ab)
