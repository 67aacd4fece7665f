"""Batched on-device preprocessing.

The reference normalizes per-sample inside torch DataLoader workers
(reference: data/stereo_datasets.py:498-545). TPU-native split: the host
does file IO + crop/flip (shape-defining), and this jitted transform does
the numeric work batched on device — depth->disparity conversion,
Normalizer application, RGB [-1,1] scaling (the BASELINE.json "device-side
batched preprocessing" config)."""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from d3roma_tpu.ops.normalizer import Normalizer


@partial(jax.jit, static_argnames=("normalizer", "space"))
def device_preprocess(
    raw: Dict[str, jnp.ndarray], normalizer: Normalizer, space: str = "disp"
) -> Dict[str, jnp.ndarray]:
    """raw batch (channel-last, float32):
      disp [B,H,W,1], valid [B,H,W,1], depth [B,H,W,1] (m),
      raw_depth [B,H,W,1] (m), rgb/left/right [B,H,W,3] in [0,255],
      fxb [B].

    Returns the reference's standard item dict fields
    (stereo_datasets.py:520-545), normalized and batched.
    """
    disp = raw["disp"]
    valid = raw["valid"]
    depth = raw["depth"]
    raw_depth = raw["raw_depth"]
    fxb = raw["fxb"].reshape(-1, 1, 1, 1)

    if space == "disp":
        gt_data = disp
        normalized, low, up = normalizer.normalize(disp, valid > 0)
        sim_valid = (valid > 0) & (raw_depth > 0)
        sim_disp_unnorm = jnp.where(sim_valid, fxb / jnp.maximum(raw_depth, 1e-8), 0.0)
        normalized_sim, _, _ = normalizer.normalize(sim_disp_unnorm, sim_valid, low, up)
    elif space == "depth":
        gt_data = depth
        normalized, _, _ = normalizer.normalize(depth, valid > 0)
        sim_valid = raw_depth > 0
        # the guidance/SSI alignment target in depth space IS the raw
        # depth (all-zeros here would make the guidance denormer mask
        # empty and silently pull predictions toward zero)
        sim_disp_unnorm = jnp.where(sim_valid, raw_depth, 0.0)
        normalized_sim, _, _ = normalizer.normalize(raw_depth, sim_valid)
    else:
        raise NotImplementedError(space)

    def to_norm_rgb(x):
        return (x / 255.0 - 0.5) * 2.0

    out = {
        "raw_disp": gt_data,
        "normalized_disp": normalized,
        "sim_disp": normalized_sim,
        "sim_mask": sim_valid.astype(jnp.float32),
        "sim_disp_unnorm": sim_disp_unnorm,
        "normalized_rgb": to_norm_rgb(raw["rgb"]),
        "left_image": to_norm_rgb(raw["left"]),
        "right_image": to_norm_rgb(raw["right"]),
        "mask": valid.astype(jnp.float32),
        "depth": depth,
        "raw_depth": raw_depth,
        "fxb": raw["fxb"],
    }
    if "K" in raw:
        out["K"] = raw["K"]
    if "index" in raw:
        out["index"] = raw["index"]
    if "sample_valid" in raw:
        out["sample_valid"] = raw["sample_valid"]
    return out
