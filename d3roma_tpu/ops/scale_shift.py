"""Closed-form and robust (RANSAC) scale/shift estimation.

TPU-native equivalents of the reference's MiDaS-style least squares
(reference: utils_d3roma/utils.py:488-528) and batched torch RANSAC
(reference: utils_d3roma/ransac.py:39-99). Everything is fixed-shape and
jittable: the RANSAC inner loop is a `lax.fori_loop` with per-iteration
random permutations from a PRNG key instead of host-side randperm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_scale_and_shift(
    prediction: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray = None
) -> jnp.ndarray:
    """Least-squares (s, t) with target ~ s * prediction + t over mask.

    prediction/target/mask: [B, N]. Returns [B, 2].
    """
    if mask is None:
        mask = jnp.ones_like(target)
    mask = mask.astype(prediction.dtype)
    pred = prediction * mask
    tgt = target * mask

    a_00 = jnp.sum(mask * pred * pred, axis=1)
    a_01 = jnp.sum(mask * pred, axis=1)
    a_11 = jnp.sum(mask, axis=1)
    b_0 = jnp.sum(mask * pred * tgt, axis=1)
    b_1 = jnp.sum(mask * tgt, axis=1)

    det = a_00 * a_11 - a_01 * a_01
    # Degenerate systems (empty/near-constant mask) fall back to the
    # identity transform (s=1, t=0) instead of dividing by a tiny or
    # negative determinant. Divergence from the reference (which adds
    # 1e-4 to every det when any is non-positive, utils.py:520-523):
    # identity degrades one sample gracefully; the reference's nudge can
    # still blow up or corrupt the whole batch's solutions.
    valid = det > 1e-6
    safe_det = jnp.where(valid, det, 1.0)
    x_0 = jnp.where(valid, (a_11 * b_0 - a_01 * b_1) / safe_det, 1.0)
    x_1 = jnp.where(valid, (-a_01 * b_0 + a_00 * b_1) / safe_det, 0.0)
    return jnp.stack([x_0, x_1], axis=1)


def _accuracy_inverse(y_true: jnp.ndarray, y_pred: jnp.ndarray, mask: jnp.ndarray):
    """1 / delta-1.25 accuracy over masked pixels (reference:
    utils_d3roma/ransac.py:21-23 computes it unmasked; masked is strictly
    better-behaved and used here)."""
    safe_pred = jnp.where(y_pred == 0, 1e-8, y_pred)
    safe_true = jnp.where(y_true == 0, 1e-8, y_true)
    thresh = jnp.maximum(safe_true / safe_pred, safe_pred / safe_true)
    ok = ((thresh < 1.25) & (mask > 0)).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    acc = jnp.sum(ok, axis=1) / denom
    return 1.0 / jnp.maximum(acc, 1e-8)


def ransac_scale_shift(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    n_frac: float = 0.1,
    k_iters: int = 10,
    d_frac: float = 0.2,
    error_threshold: float = 0.6,
) -> jnp.ndarray:
    """Batched RANSAC over (scale, shift). pred/target/mask: [B, N] -> [B, 2].

    Per iteration: fit on a random n_frac subset, select inliers by squared
    error < threshold, refit on inliers, keep the fit with more than d_frac
    inliers and the best inverse-accuracy metric (reference:
    utils_d3roma/ransac.py:53-99).
    """
    B, N = pred.shape
    n_sample = max(1, int(n_frac * N))
    d_min = int(d_frac * N)
    maskf = mask.astype(pred.dtype)

    init = dict(
        best_fit=jnp.tile(jnp.asarray([[1.0, 0.0]], pred.dtype), (B, 1)),
        best_error=jnp.full((B,), jnp.inf, pred.dtype),
        best_num_inlier=jnp.zeros((B,), jnp.int32),
    )

    def body(i, state):
        it_key = jax.random.fold_in(key, i)
        # one shared permutation per iteration (matches the reference's
        # single randperm repeated over the batch, ransac.py:79)
        perm = jax.random.permutation(it_key, N)
        idx = perm[:n_sample]
        maybe = compute_scale_and_shift(
            jnp.take(pred, idx, axis=1),
            jnp.take(target, idx, axis=1),
            jnp.take(maskf, idx, axis=1),
        )
        fitted = pred * maybe[:, 0:1] + maybe[:, 1:2]
        inlier = (((target - fitted) ** 2) < error_threshold) & (mask > 0)
        inlier_f = inlier.astype(pred.dtype)

        better = compute_scale_and_shift(pred, target, inlier_f)
        refit = pred * better[:, 0:1] + better[:, 1:2]
        this_error = _accuracy_inverse(target, refit, inlier_f)
        this_num = jnp.sum(inlier, axis=1).astype(jnp.int32)

        select = (this_num > d_min) & (this_error < state["best_error"])
        return dict(
            best_fit=jnp.where(select[:, None], better, state["best_fit"]),
            best_error=jnp.where(select, this_error, state["best_error"]),
            best_num_inlier=jnp.where(select, this_num, state["best_num_inlier"]),
        )

    final = jax.lax.fori_loop(0, k_iters, body, init)
    return final["best_fit"]
