"""Affine-invariant multi-round depth ensembling (Marigold-style).

Equivalent of the reference's `ensemble_depths`
(reference: utils_d3roma/utils.py:28-120): align R predictions by per-image
(scale, shift) minimizing pairwise RMS distance plus a [0,1]-range
regularizer, then reduce by median/mean. The reference runs scipy BFGS on a
torch closure; this runs a fixed number of Adam steps on a jitted jax
objective — same objective, compiler-friendly fixed iteration count.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax


def _objective(params, images, regularizer_strength, reduction):
    s, t = params
    transformed = images * s[:, None, None] + t[:, None, None]
    n = images.shape[0]
    # pairwise distances over all combinations
    diffs = transformed[:, None] - transformed[None, :]
    iu = jnp.triu_indices(n, k=1)
    sqrt_dist = jnp.sqrt(jnp.mean(diffs[iu] ** 2))
    pred = (
        jnp.median(transformed, axis=0)
        if reduction == "median"
        else jnp.mean(transformed, axis=0)
    )
    near_err = jnp.abs(0.0 - jnp.min(pred))
    far_err = jnp.abs(1.0 - jnp.max(pred))
    return sqrt_dist + (near_err + far_err) * regularizer_strength


@partial(jax.jit, static_argnames=("reduction", "num_iters"))
def ensemble_depths(
    input_images: jnp.ndarray,
    regularizer_strength: float = 0.02,
    reduction: str = "median",
    num_iters: int = 30,
    lr: float = 0.05,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """input_images: [R, H, W] affine-invariant predictions.

    Returns (aligned [H,W] rescaled to [0,1], uncertainty [H,W]).
    """
    n = input_images.shape[0]
    flat = input_images.reshape(n, -1)
    _min = jnp.min(flat, axis=1)
    _max = jnp.max(flat, axis=1)
    s0 = 1.0 / jnp.maximum(_max - _min, 1e-8)
    t0 = -s0 * _min
    if n == 1:
        # nothing to align: the pairwise objective is a mean over an
        # empty index set (NaN). Return the [0,1]-rescaled input with
        # zero uncertainty.
        aligned = input_images[0] * s0[0] + t0[0]
        return aligned, jnp.zeros_like(aligned)
    params = (s0, t0)

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def step(carry, _):
        params, opt_state = carry
        grads = jax.grad(_objective)(params, input_images, regularizer_strength, reduction)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), None

    (params, _), _ = jax.lax.scan(step, (params, opt_state), None, length=num_iters)
    s, t = params

    transformed = input_images * s[:, None, None] + t[:, None, None]
    if reduction == "mean":
        aligned = jnp.mean(transformed, axis=0)
        uncertainty = jnp.std(transformed, axis=0)
    else:
        aligned = jnp.median(transformed, axis=0)
        uncertainty = jnp.median(jnp.abs(transformed - aligned), axis=0)

    _mn = jnp.min(aligned)
    _mx = jnp.max(aligned)
    aligned = (aligned - _mn) / jnp.maximum(_mx - _mn, 1e-8)
    uncertainty = uncertainty / jnp.maximum(_mx - _mn, 1e-8)
    return aligned, uncertainty
