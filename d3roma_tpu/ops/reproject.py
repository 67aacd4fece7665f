"""Jittable depth reprojection between camera frames (TPU-friendly).

Device-side counterpart of `DepthCamera._reproject` (the numpy scatter used
by the host streaming path; reference: utils_d3roma/camera.py:654-701):
backproject depth through K_src, transform by T, project through K_dst,
and scatter into the target frame — with the reference's aggressive
4-corner fill. Differences by design: the scatter is a z-buffer
(`.at[].min`), so where multiple sources land on one target pixel the
NEAREST surface wins (the reference's sequential overwrite keeps an
arbitrary last writer); shapes are static and the whole op jits, so it can
run inside a preprocessing program on device.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_INF = 1e10


@partial(jax.jit, static_argnames=("out_hw", "aggressive_fill"))
def reproject_depth(
    depth: jnp.ndarray,
    K_src: jnp.ndarray,
    K_dst: jnp.ndarray,
    T: jnp.ndarray,
    out_hw: Tuple[int, int],
    aggressive_fill: bool = True,
) -> jnp.ndarray:
    """depth [H, W] in the source camera frame -> depth [oH, oW] in the
    destination frame; 0 marks holes."""
    H, W = depth.shape
    oH, oW = out_hw
    ys, xs = jnp.mgrid[0:H, 0:W].astype(jnp.float32)
    pix = jnp.stack([xs.ravel(), ys.ravel(), jnp.ones(H * W, jnp.float32)])
    d = depth.reshape(-1).astype(jnp.float32)
    pts = jnp.linalg.inv(K_src.astype(jnp.float32)) @ pix * d[None, :]
    pts = T[:3, :3].astype(jnp.float32) @ pts + T[:3, 3:].astype(jnp.float32)
    # destination-frame z is what gets scattered AND what wins the
    # z-buffer: for the RealSense depth->color transform (pure
    # translation, the reference even leaves T commented out —
    # camera.py:277) it equals the source depth, but for a general T
    # with rotation the source depth would be the wrong value
    z_dst = pts[2]
    valid = (d > 0.0) & (z_dst > 0.0)  # behind-camera points drop out
    proj = K_dst.astype(jnp.float32) @ pts
    u = proj[0] / jnp.maximum(proj[2], 1e-12)
    v = proj[1] / jnp.maximum(proj[2], 1e-12)

    zbuf = jnp.full((oH, oW), _INF, jnp.float32)

    def scatter(zbuf, uu, vv):
        uu = jnp.round(uu).astype(jnp.int32)
        vv = jnp.round(vv).astype(jnp.int32)
        ok = valid & (uu >= 0) & (uu < oW) & (vv >= 0) & (vv < oH)
        # out-of-bounds / invalid samples write +inf at a clamped index
        val = jnp.where(ok, z_dst, _INF)
        uu = jnp.clip(uu, 0, oW - 1)
        vv = jnp.clip(vv, 0, oH - 1)
        return zbuf.at[vv, uu].min(val)

    if aggressive_fill:
        for fu in (jnp.floor, jnp.ceil):
            for fv in (jnp.floor, jnp.ceil):
                zbuf = scatter(zbuf, fu(u), fv(v))
    else:
        zbuf = scatter(zbuf, u, v)
    return jnp.where(zbuf >= _INF, 0.0, zbuf)
