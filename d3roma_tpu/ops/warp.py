"""Differentiable bilinear warping (grid_sample equivalent) for stereo.

TPU-native replacement for the reference's `F.grid_sample` uses in
photometric guidance and stereo matching (reference: core/guidance.py:264-334,
scripts/stereo_matching.py:183-202). Implemented as vectorized gathers —
XLA lowers these to efficient dynamic-slice/gather on TPU. NHWC throughout.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample img [B,H,W,C] at continuous pixel coords x, y [B,H,W].

    Zero padding outside bounds (matches grid_sample padding_mode="zeros",
    align_corners=True pixel convention).
    """
    B, H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1
    y1 = y0 + 1

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(ix, iy):
        valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        bidx = jnp.arange(B)[:, None, None]
        vals = img[bidx, iyc, ixc]  # [B,H,W,C]
        return vals * valid[..., None].astype(img.dtype)

    out = (
        gather(x0, y0) * (wx0 * wy0)[..., None]
        + gather(x1, y0) * (wx1 * wy0)[..., None]
        + gather(x0, y1) * (wx0 * wy1)[..., None]
        + gather(x1, y1) * (wx1 * wy1)[..., None]
    )
    return out


def warp_right_to_left(right: jnp.ndarray, disparity: jnp.ndarray) -> jnp.ndarray:
    """Warp the right image into the left view given left-frame disparity.

    right: [B,H,W,C]; disparity: [B,H,W] (positive shifts leftward).
    Matches the reference's photometric warp (core/guidance.py:308-318).
    """
    B, H, W, _ = right.shape
    xs = jnp.arange(W, dtype=disparity.dtype)[None, None, :]
    ys = jnp.arange(H, dtype=disparity.dtype)[None, :, None]
    x = jnp.broadcast_to(xs, (B, H, W)) - disparity
    y = jnp.broadcast_to(ys, (B, H, W))
    return bilinear_sample(right, x, y)
