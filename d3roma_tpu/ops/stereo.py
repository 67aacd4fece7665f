"""TPU-native block-matching stereo ("sim depth" generator).

Rebuild of the reference's GPU stereo matcher
(reference: scripts/stereo_matching.py:90-320, adapted there from DREDS):
zero-mean NCC block matching over a disparity cost volume, soft-argmax
with parabolic sub-pixel refinement, left-right consistency check, and a
median filter — all expressed as one jitted NHWC program. The per-shift
Python loop building the cost volume becomes a `vmap` over the disparity
axis; box sums are `lax.reduce_window` ops that XLA fuses; the whole thing
runs batched on device, replacing the reference's offline per-file script
(BASELINE.json config #2 device-side SGBM preprocess).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from d3roma_tpu.ops.warp import bilinear_sample


def _box_sum(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Sum over k x k windows (SAME padding), summed over channels.
    x: [B,H,W,C] -> [B,H,W,1]."""
    s = jnp.sum(x, axis=-1, keepdims=True)
    return lax.reduce_window(
        s, 0.0, lax.add, (1, k, k, 1), (1, 1, 1, 1), "SAME"
    )


def ncc_cost_volume(
    left: jnp.ndarray,
    right: jnp.ndarray,
    min_disp: int,
    max_disp: int,
    block_size: int = 11,
    eps: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zero-mean NCC cost volumes for left and right views.

    left/right: [B,H,W,C] float in [0,1]. Returns (costL, costR), each
    [D,B,H,W] where D = max_disp - min_disp + 1. Matches the reference's
    CorrL/CorrR box-filtered formulation (stereo_matching.py:96-159).
    """
    k = block_size
    n = k * k * left.shape[-1]

    def cache(img):
        s = _box_sum(img, k)
        ave = s / n
        s2 = _box_sum(img * img, k)
        return img, s, ave, s2

    L, Ls, La, L2s = cache(left)
    R, Rs, Ra, R2s = cache(right)

    var_l = L2s - 2 * La * Ls + n * La * La + 1e-5
    var_r = R2s - 2 * Ra * Rs + n * Ra * Ra + 1e-5

    def shift_right(x, i):
        """Shift a right-view map i pixels to the right (zero fill)."""
        return jnp.roll(x, i, axis=2) * _valid_left(x.shape, i)

    def shift_left(x, i):
        return jnp.roll(x, -i, axis=2) * _valid_right(x.shape, i)

    def _valid_left(shape, i):
        idx = lax.broadcasted_iota(jnp.int32, (1, 1, shape[2], 1), 2)
        return (idx >= i).astype(jnp.float32)

    def _valid_right(shape, i):
        idx = lax.broadcasted_iota(jnp.int32, (1, 1, shape[2], 1), 2)
        return (idx < shape[2] - i).astype(jnp.float32)

    def corr_at(i):
        # left view: compare L(x) with R(x - i)
        sR = shift_right(R, i)
        sRs = shift_right(Rs, i)
        sR2s = shift_right(R2s, i)
        sRa = shift_right(Ra, i)
        prod = _box_sum(L * sR, k) - La * sRs - sRa * Ls + n * La * sRa
        var_sr = sR2s - 2 * sRa * sRs + n * sRa * sRa + 1e-5
        corr_l = (prod + eps) / (jnp.sqrt(var_l) * jnp.sqrt(jnp.maximum(var_sr, 1e-10)) + eps)
        corr_l = corr_l * _valid_left(L.shape, i)

        # right view: compare R(x) with L(x + i)
        sL = shift_left(L, i)
        sLs = shift_left(Ls, i)
        sL2s = shift_left(L2s, i)
        sLa = shift_left(La, i)
        prod_r = _box_sum(R * sL, k) - Ra * sLs - sLa * Rs + n * Ra * sLa
        var_sl = sL2s - 2 * sLa * sLs + n * sLa * sLa + 1e-5
        corr_r = (prod_r + eps) / (jnp.sqrt(var_r) * jnp.sqrt(jnp.maximum(var_sl, 1e-10)) + eps)
        corr_r = corr_r * _valid_right(R.shape, i)
        return corr_l[..., 0], corr_r[..., 0]

    disps = jnp.arange(min_disp, max_disp + 1)
    costL, costR = jax.vmap(corr_at)(disps)
    return costL, costR


def soft_argmax_disp(
    cost: jnp.ndarray,
    min_disp: int,
    max_disp: int,
    beta: float = 100.0,
    eps: float = 1e-6,
    sub_pixel: bool = True,
) -> jnp.ndarray:
    """Cost volume [D,B,H,W] -> disparity [B,H,W] via temperature-softmax
    expectation, with parabolic sub-pixel refinement
    (reference: scripts/stereo_matching.py:235-249)."""
    D = cost.shape[0]
    disps = jnp.arange(min_disp, max_disp + 1, dtype=cost.dtype)
    disp_vol = disps.reshape(D, 1, 1, 1) * jnp.ones_like(cost)

    if sub_pixel:
        zeros = jnp.zeros_like(cost[:1])
        prev = jnp.concatenate([zeros, cost[: D - 1]], axis=0)
        nxt = jnp.concatenate([cost[1:], zeros], axis=0)
        disp_vol = disp_vol + (prev - nxt + eps) / (2 * (prev + nxt - 2 * cost) + eps)

    attn = jax.nn.softmax(cost * beta, axis=0)
    return jnp.sum(attn * disp_vol, axis=0)


def lrc_check(
    dispL: jnp.ndarray, dispR: jnp.ndarray, threshold: float = 0.5
) -> jnp.ndarray:
    """Left-right consistency: warp the right disparity into the left view
    and invalidate (-1) inconsistent pixels
    (reference: scripts/stereo_matching.py:192-202)."""
    warped_r = bilinear_sample(dispR[..., None], _x_minus_disp(dispL), _ys(dispL))[..., 0]
    # SQUARED difference vs the raw threshold, exactly as the reference
    # writes it (pow(diff,2) > 0.5, stereo_matching.py:199) — the
    # effective pixel tolerance is sqrt(threshold) ~= 0.71 px
    return jnp.where((dispL - warped_r) ** 2 > threshold, -1.0, dispL)


def _x_minus_disp(disp):
    B, H, W = disp.shape
    xs = jnp.arange(W, dtype=disp.dtype)[None, None, :]
    return jnp.broadcast_to(xs, (B, H, W)) - disp


def _ys(disp):
    B, H, W = disp.shape
    ys = jnp.arange(H, dtype=disp.dtype)[None, :, None]
    return jnp.broadcast_to(ys, (B, H, W))


def median_blur(x: jnp.ndarray, k: int = 5) -> jnp.ndarray:
    """k x k median filter, [B,H,W] (the reference's kornia median_blur,
    stereo_matching.py:451-454). Sorting k^2 window elements on the VPU."""
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    # gather all k*k shifted views: [B,H,W,k*k]
    views = [
        xp[:, i : i + x.shape[1], j : j + x.shape[2]]
        for i in range(k)
        for j in range(k)
    ]
    stack = jnp.stack(views, axis=-1)
    return jnp.median(stack, axis=-1)


class StereoMatchOutput(NamedTuple):
    disp: jnp.ndarray  # [B,H,W], -1 where invalid
    valid: jnp.ndarray  # [B,H,W] bool
    depth: jnp.ndarray  # [B,H,W], 0 where invalid


@partial(
    jax.jit,
    static_argnames=("min_disp", "max_disp", "block_size", "sub_pixel",
                     "use_median", "lrc_threshold"),
)
def stereo_match(
    left: jnp.ndarray,
    right: jnp.ndarray,
    fxb: float,
    min_disp: int = 10,
    max_disp: int = 110,
    block_size: int = 11,
    beta: float = 100.0,
    eps: float = 1e-6,
    sub_pixel: bool = True,
    use_median: bool = True,
    lrc_threshold: float = 0.5,
) -> StereoMatchOutput:
    """Full pipeline: NCC cost volumes -> soft-argmax disparities -> LRC ->
    median filter -> depth (reference: StereoMatching.forward,
    scripts/stereo_matching.py:360-475; defaults fx*b and maxDisp=110,
    block=11 from :521-536,604-605).

    left/right: [B,H,W,C] float in [0,1] (grayscale IR tiled to C=1 or 3).
    """
    costL, costR = ncc_cost_volume(left, right, min_disp, max_disp, block_size, eps)
    dispL = soft_argmax_disp(costL, min_disp, max_disp, beta, eps, sub_pixel)
    dispR = soft_argmax_disp(costR, min_disp, max_disp, beta, eps, sub_pixel)
    disp = lrc_check(dispL, dispR, lrc_threshold)
    if use_median:
        disp = median_blur(disp, 5)
    disp = jnp.where((disp < min_disp) | (disp > max_disp), -1.0, disp)
    valid = disp > 0
    depth = jnp.where(valid, fxb / jnp.maximum(disp, eps), 0.0)
    return StereoMatchOutput(disp, valid, depth)


def bilateral_filter(
    x: jnp.ndarray, ksize: int = 5,
    sigma_color: float | None = None, sigma_space: float | None = None,
) -> jnp.ndarray:
    """Edge-preserving bilateral filter, [B,H,W]
    (reference: scripts/stereo_matching.py:29-57: gaussian spatial kernel x
    per-patch color-difference kernel, reflect padding). Expressed as a
    stack of kxk shifted views so XLA fuses the whole weighting into one
    elementwise program."""
    if sigma_space is None:
        sigma_space = 0.15 * ksize + 0.35
    if sigma_color is None:
        sigma_color = sigma_space
    pad = (ksize - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)), mode="reflect")
    views = jnp.stack(
        [xp[:, i : i + x.shape[1], j : j + x.shape[2]]
         for i in range(ksize) for j in range(ksize)],
        axis=-1,
    )  # [B,H,W,k*k]
    diff = views - x[..., None]
    w_color = jnp.exp(-(diff**2) / (2 * sigma_color**2))
    w_color = w_color / jnp.sum(w_color, axis=-1, keepdims=True)

    ax = jnp.arange(ksize, dtype=x.dtype) - (ksize - 1) / 2.0
    g = jnp.exp(-(ax**2) / (2 * sigma_space**2))
    w_space = (g[:, None] * g[None, :]).reshape(-1)
    w_space = w_space / jnp.sum(w_space)

    w = w_color * w_space
    return jnp.sum(w * views, axis=-1) / jnp.sum(w, axis=-1)
