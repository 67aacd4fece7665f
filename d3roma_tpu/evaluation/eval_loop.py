"""Evaluation: batch-level denoise + metric computation, quadrant tiling.

Rebuild of the reference eval stack (reference: evaluate.py:28-297,355-427):
`eval_batch` pads conditions, runs R inference rounds, denormalizes (SSI
LSQ/RANSAC through the Normalizer), optionally ensembles, computes
disparity/depth metrics, multi-round sigma-uncertainty and error maps;
`evaluate_dataset` drives a loader with the guidance-weight sweep, the
coarse-to-fine 4-quadrant tiling (270x480 tiles of a 540x960 image —
evaluate.py:362-410, the reference's spatial 'context parallelism' analog),
anomaly-aware running averages, and plot/point-cloud artifacts.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3roma_tpu.evaluation.averager import RunningAverager
from d3roma_tpu.ops import InputPadder, compute_errors, ensemble_depths, metrics_to_dict
from d3roma_tpu.ops.normalizer import Normalizer


def denormalize(config, pred_disps, raw_disp=None, mask=None, key=None):
    """(reference: evaluate.py:59-64) pred_disps: [B,H,W,R]."""
    norm = Normalizer.from_config(config)
    if norm.ssi and norm.safe_ssi and key is None:
        key = jax.random.PRNGKey(0)
    return norm.denormalize(pred_disps, raw_disp, mask, key=key)


def eval_batch(
    config,
    pipeline,
    batch: Dict,
    key: jax.Array,
) -> Tuple[np.ndarray, Tuple[np.ndarray, np.ndarray], Optional[np.ndarray], np.ndarray, object]:
    """batch: device_preprocess output (channel-last).

    Returns (pred_disp_unnorm [B,H,W], (metrics_disp, metrics_depth),
    uncertainty [B,H,W] | None, error_map [B,H,W], last pipeline output).
    Reference: evaluate.py:66-148.
    """
    normalized_rgb = batch.get("normalized_rgb")
    left = batch.get("left_image")
    right = batch.get("right_image")
    sim_disp = batch.get("sim_disp")
    # guidance + SSI alignment target: the UNNORMALIZED raw disparity. The
    # reference's eval path passes the metric raw depth here while its
    # denormalizer produces disparity (units mismatch, evaluate.py:66-102);
    # its inference path passes raw disparity (inference.py:212), which is
    # the consistent convention adopted throughout.
    raw_depth = batch.get("sim_disp_unnorm", batch.get("raw_depth"))
    raw_disp = batch["raw_disp"]
    mask = batch["mask"]
    fxb = batch.get("fxb")

    ref_img = normalized_rgb if normalized_rgb is not None else left
    padder = InputPadder(ref_img.shape, divis_by=config.divis_by)
    normalized_rgb, left, right, sim_disp, raw_depth_p = padder.pad(
        normalized_rgb, left, right, sim_disp, raw_depth
    )

    # guide-source selection (reference: evaluate.py:171-182,
    # distributed_evaluate.py:128-142 — the stereo-match branch is a dead
    # stub there; here it runs the device block matcher on the IR pair)
    if (config.guide_source == "stereo-match" and left is not None
            and right is not None):
        from d3roma_tpu.ops.stereo import stereo_match

        W_img = left.shape[2]
        scale = W_img / 640.0
        fxb_val = float(np.asarray(batch["fxb"])[0]) if "fxb" in batch else 24.0
        sm = stereo_match(
            (left + 1.0) / 2.0, (right + 1.0) / 2.0, fxb_val,
            min_disp=max(1, int(10 * scale)), max_disp=max(8, int(110 * scale)),
        )
        raw_depth_p = sm.depth[..., None]

    def denormer(x):
        return denormalize(config, x, raw_depth_p, None)

    rounds = []
    out = None
    for r in range(config.num_inference_rounds):
        kwargs = dict(
            num_inference_steps=config.num_inference_timesteps,
            num_intermediate_images=config.num_intermediate_images,
            cond_channels=config.cond_channels,
            rgb_images=normalized_rgb,
            left_images=left,
            right_images=right,
            sim_disp=sim_disp,
            add_noise_rgb=config.noise_rgb,
        )
        if hasattr(pipeline, "vae"):  # latent pipeline
            if pipeline.guidance.enabled:
                kwargs["raw_depth"] = raw_depth_p
                kwargs["denormer"] = denormer
            out = pipeline(jax.random.fold_in(key, r), **kwargs)
        else:
            kwargs["depth_channels"] = config.depth_channels
            out = pipeline(jax.random.fold_in(key, r), **kwargs)
        rounds.append(padder.unpad(out.images))

    pred = jnp.concatenate(rounds, axis=-1)  # [B,H,W,R]

    if config.ensemble:
        aligned = [
            ensemble_depths(jnp.moveaxis(pred[i], -1, 0))[0]
            for i in range(pred.shape[0])
        ]
        pred = jnp.stack(aligned)[..., None]

    pred_unnorm = denormalize(config, pred, raw_disp, mask, key=jax.random.fold_in(key, 999))
    gt = np.asarray(raw_disp[..., 0])
    pred_mean = np.asarray(jnp.mean(pred_unnorm, axis=-1))

    if config.eval_dataset and config.eval_dataset[0] == "SceneFlow":
        # SceneFlow disparity clamp window (reference: evaluate.py:126-131)
        scale = 960.0 / float(config.camera_resolution.split("x")[0])
        lo, hi = 0.5 / scale, 192.0 / scale
        m = (gt >= lo) & (gt < hi)
        pred_mean = np.clip(pred_mean, lo, hi)
    else:
        m = np.asarray(mask[..., 0]).astype(bool)

    metrics = compute_errors(
        jnp.asarray(gt), jnp.asarray(pred_mean), config.prediction_space,
        jnp.asarray(m), fxb,
    )
    metrics = (np.asarray(metrics[0]), np.asarray(metrics[1]))

    if pred.shape[-1] > 1:
        unc = np.zeros_like(gt)
        unc[m] = np.asarray(jnp.std(pred, axis=-1))[m]
    else:
        unc = None

    err = np.zeros_like(gt)
    err[m] = np.abs(gt[m] - pred_mean[m])
    return pred_mean, metrics, unc, err, out


QUADRANTS = [
    (slice(0, 270), slice(0, 480)),
    (slice(270, None), slice(0, 480)),
    (slice(0, 270), slice(480, None)),
    (slice(270, None), slice(480, None)),
]
_SLICED_KEYS = ("raw_disp", "normalized_disp", "sim_disp", "left_image",
                "right_image", "normalized_rgb", "mask", "raw_depth", "depth")


def eval_sliced_batch(config, pipeline, batch, key, guidance_weights=None):
    """Sweep over flow_guidance_weights, return results for the LAST weight
    (matching the reference's sweep that reports per-weight metrics —
    evaluate.py:188-194)."""
    import dataclasses as _dc

    weights = guidance_weights or config.flow_guidance_weights
    results = {}
    for w in weights:
        p = pipeline
        if hasattr(pipeline, "guidance"):
            p = _dc.replace(
                pipeline,
                guidance=_dc.replace(pipeline.guidance, flow_guidance_weight=float(w)),
            )
        results[w] = eval_batch(config, p, batch, key)
    return results


def evaluate_dataset(
    config,
    pipeline,
    loader,
    key: jax.Array,
    eval_output_dir: Optional[str] = None,
    preprocess=None,
    max_batches: Optional[int] = None,
    write_artifacts: bool = False,
):
    """Loop a val loader; returns (metrics dict, RunningAverager).

    Reference: evaluate.py:340-427 (incl. coarse_to_fine quadrants) and
    distributed_evaluate.py:109-174 (per-batch metric gathering — here the
    batch is globally sharded so no explicit gather is needed).
    """
    stat = RunningAverager(detect_anomaly={"epe": 10.0})
    all_disp, all_depth = [], []
    limit = max_batches if max_batches is not None else config.eval_num_batch

    for i, raw_batch in enumerate(loader):
        if limit and limit > 0 and i >= limit:
            break
        batch = preprocess(raw_batch) if preprocess is not None else raw_batch
        bkey = jax.random.fold_in(key, i)

        if config.coarse_to_fine:
            B, H, W = batch["raw_disp"].shape[:3]
            pred = np.zeros((B, H, W), np.float32)
            quad_metrics = []
            for (ys, xs) in QUADRANTS:
                mini = {
                    k: (v[:, ys, xs] if k in _SLICED_KEYS and hasattr(v, "ndim") and v.ndim == 4 else v)
                    for k, v in batch.items()
                }
                p_mini, m_mini, _, _, _ = eval_batch(config, pipeline, mini, bkey)
                pred[:, ys, xs] = p_mini
                quad_metrics.append(m_mini)
            md = np.mean([m[0] for m in quad_metrics], axis=0)
            me = np.mean([m[1] for m in quad_metrics], axis=0)
            metrics = (md, me)
            unc = err = None
        else:
            pred, metrics, unc, err, out = eval_batch(config, pipeline, batch, bkey)

        md, me = metrics
        for b in range(md.shape[0]):
            sample = dict(zip(["epe", "d1", "d2", "d3", "d5"], md[b]))
            sample.update(zip(["a1", "a2", "a3", "rmse", "rel", "mae"], me[b]))
            if stat.append(sample, index=(i, b)):
                all_disp.append(md[b])
                all_depth.append(me[b])

        if write_artifacts and eval_output_dir:
            os.makedirs(eval_output_dir, exist_ok=True)
            from d3roma_tpu.utils.viz import plot_error_map, plot_uncertainties, save_colorized

            for b in range(pred.shape[0]):
                save_colorized(
                    os.path.join(eval_output_dir, f"idx{i}_{b}_pred_disp.png"), pred[b]
                )
            if err is not None:
                plot_error_map(
                    np.asarray(batch["raw_disp"][0, ..., 0]), pred[0], None,
                    os.path.join(eval_output_dir, f"idx{i}_error.png"),
                )
            if unc is not None:
                plot_uncertainties(
                    unc[0], os.path.join(eval_output_dir, f"idx{i}_uncertainty.png")
                )
            if config.plot_intermediate_metrics and out is not None and hasattr(out, "intermediates"):
                inter = denormalize(
                    config,
                    jnp.moveaxis(out.intermediates[..., 0], 0, -1),
                    batch["raw_disp"], batch["mask"],
                )  # [B,H,W,S]
                inter = jnp.moveaxis(inter, -1, 0)[..., None]
                imd, ime = evaluate_intermediate_metrics(
                    config, batch.get("fxb"), inter, batch["raw_disp"], batch["mask"]
                )
                from d3roma_tpu.utils.viz import plot_intermediate_metrics

                plot_intermediate_metrics(
                    {"epe": imd[0, :, 0], "rel": ime[0, :, 4]},
                    os.path.join(eval_output_dir, f"idx{i}_intermediate_metrics.png"),
                )
            if config.write_pcd and "fxb" in batch:
                from d3roma_tpu.utils.pointcloud import write_ply, backproject_depth

                fxb = float(np.asarray(batch["fxb"])[0])
                K = np.asarray(batch["K"][0]) if "K" in batch else np.eye(3)
                depth = np.where(pred[0] > 0, fxb / np.maximum(pred[0], 1e-6), 0)
                pts, _ = backproject_depth(depth.astype(np.float32), K)
                write_ply(os.path.join(eval_output_dir, f"idx{i}_pred.ply"), pts)

    if not all_disp:
        return {}, stat
    return metrics_to_dict(np.stack(all_disp), np.stack(all_depth)), stat


def evaluate_intermediate_metrics(
    config, fxb, intermediates: jnp.ndarray, gt_disp: jnp.ndarray,
    gt_mask: jnp.ndarray,
):
    """Metric curves over denoising steps (reference: evaluate.py:28-57).

    intermediates: [S, B, H, W, 1] *denormalized* per-step x_hat0 stacks;
    gt_disp/gt_mask: [B, H, W, 1]. Returns (disp_metrics [B,S,5],
    depth_metrics [B,S,6]).
    """
    S, B, H, W, _ = intermediates.shape
    preds = jnp.moveaxis(intermediates[..., 0], 0, 1).reshape(B * S, H, W)
    gts = jnp.repeat(gt_disp[..., 0], S, axis=0)  # [B*S,H,W], b-major
    masks = jnp.repeat(gt_mask[..., 0] > 0, S, axis=0)

    if config.eval_dataset and config.eval_dataset[0] == "SceneFlow":
        scale = 960.0 / float(config.camera_resolution.split("x")[0])
        lo, hi = 0.5 / scale, 192.0 / scale
        masks = masks & (preds >= lo) & (preds < hi)
        preds = jnp.clip(preds, lo, hi)
    else:
        preds = jnp.maximum(preds, 0.25)  # prevent 0 disparities

    fxb_rep = jnp.repeat(fxb, S, axis=0) if fxb is not None else None
    md, me = compute_errors(gts, preds, config.prediction_space, masks, fxb_rep)
    return (np.asarray(md).reshape(B, S, -1), np.asarray(me).reshape(B, S, -1))
