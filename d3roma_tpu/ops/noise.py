"""Noise generation strategies for the forward process.

`pyramid_noise_like` is the reference's multiscale noise
(reference: utils_d3roma/utils.py:122-132). The reference draws a random
downscale factor r ~ U(2,4) per call, which would make shapes data-dependent;
the TPU-native formulation uses the standard static dyadic pyramid (factor 2
per level) so every level has a trace-time shape and the whole thing fuses
into one jitted program. The statistics (unit-variance multiscale noise with
geometric discount) are preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pyramid_noise_like(
    key: jax.Array, shape, dtype=jnp.float32, discount: float = 0.9
) -> jnp.ndarray:
    """Multiscale noise, NHWC shape [B, H, W, C], normalized to unit std."""
    b, h, w, c = shape
    keys = jax.random.split(key, 11)  # base + 10 pyramid levels
    noise = jax.random.normal(keys[0], (b, h, w, c), dtype)
    for i in range(1, 11):
        hh, ww = max(1, h // (2**i)), max(1, w // (2**i))
        level = jax.random.normal(keys[i], (b, hh, ww, c), dtype)
        up = jax.image.resize(level, (b, h, w, c), method="bilinear")
        noise = noise + up * (discount**i)
        if hh == 1 or ww == 1:
            break
    return noise / jnp.std(noise)


def make_noise(key: jax.Array, shape, strategy: str = "randn", dtype=jnp.float32):
    """Dispatch on `config.noise_strategy` (reference: train.py:247-253)."""
    if strategy == "pyramid":
        return pyramid_noise_like(key, shape, dtype)
    if strategy == "randn":
        return jax.random.normal(key, shape, dtype)
    raise ValueError(f"unknown noise strategy: {strategy!r}")
