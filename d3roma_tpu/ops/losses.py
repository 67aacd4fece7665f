"""Likelihood / perceptual loss helpers.

iDDPM VLB terms (reference: utils_d3roma/losess.py:10-91) and the SSIM used
by the photometric guidance path (reference: core/guidance.py:12-42), all as
pure jnp.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N(mean1, e^logvar1) || N(mean2, e^logvar2)), broadcasted."""
    logvar1 = jnp.asarray(logvar1, dtype=jnp.result_type(mean1, jnp.float32))
    logvar2 = jnp.asarray(logvar2, dtype=jnp.result_type(mean2, jnp.float32))
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of discretized Gaussian for images in [-1, 1]
    (255-level bins)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    cdf_plus = approx_standard_normal_cdf(inv_stdv * (centered + 1.0 / 255.0))
    cdf_min = approx_standard_normal_cdf(inv_stdv * (centered - 1.0 / 255.0))
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12))
    log_cdf_delta = jnp.log(jnp.clip(cdf_plus - cdf_min, 1e-12))
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, log_cdf_delta),
    )


def mse_to_vlb(t, mse, logvar_clipped):
    """Convert per-timestep MSE to a VLB proxy term (reference:
    utils_d3roma/losess.py:10-23). t: [B] int, mse: [B], logvar_clipped: [T]."""
    lv = jnp.take(logvar_clipped, jnp.maximum(t, 1), axis=0)
    return 0.5 * mse * jnp.exp(-lv) / math.log(2.0)


def ssim(x: jnp.ndarray, y: jnp.ndarray, c1: float = 0.01**2, c2: float = 0.03**2):
    """SSIM distance map (1 - SSIM)/2 with 3x3 mean pooling and replicate
    padding, NHWC (reference: core/guidance.py:12-42)."""
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    xp = jnp.pad(x, pad, mode="edge")
    yp = jnp.pad(y, pad, mode="edge")

    def pool(z):
        return lax.reduce_window(
            z, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
        ) / 9.0

    mu_x = pool(xp)
    mu_y = pool(yp)
    sigma_x = pool(xp**2) - mu_x**2
    sigma_y = pool(yp**2) - mu_y**2
    sigma_xy = pool(xp * yp) - mu_x * mu_y

    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1.0 - num / den) / 2.0, 0.0, 1.0)
