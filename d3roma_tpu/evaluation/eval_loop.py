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


def _to_host(x) -> np.ndarray:
    """np.asarray that also works for globally-sharded arrays on
    multi-host pods: a jax.Array spanning non-addressable devices cannot
    be fetched directly; gather the global value first (every host then
    computes identical metrics — the reference's gather_for_metrics
    semantics, distributed_evaluate.py:162-167)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _protocol_dataset(config, dataset_name: Optional[str]) -> str:
    """The dataset whose eval protocol (clamp windows, artifact dumps)
    applies. The reference keys every dataset-specific branch on
    config.eval_dataset[0] even while iterating several datasets
    (reference: evaluate.py:126,246) — a bug when eval_dataset lists
    more than one. Callers that know the current dataset pass it;
    the [0] fallback preserves reference behavior otherwise."""
    if dataset_name is not None:
        return dataset_name
    return config.eval_dataset[0] if config.eval_dataset else ""


def eval_batch(
    config,
    pipeline,
    batch: Dict,
    key: jax.Array,
    dataset_name: Optional[str] = None,
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
        # The guidance/SSI target convention is the raw *disparity* (see the
        # docstring above): use the matcher's disparity masked by its LRC
        # validity, converting to metric depth only for depth-space models.
        disp = jnp.where(sm.valid, sm.disp, 0.0)
        if config.prediction_space == "depth":
            raw_depth_p = jnp.where(
                disp > 0, fxb_val / jnp.maximum(disp, 1e-6), 0.0
            )[..., None]
        else:
            raw_depth_p = disp[..., None]

    def denormer(x):
        # SSI re-alignment inside the guidance loop aligns against the raw
        # target over its validity mask (Normalizer.denormalize requires a
        # mask in ssi mode).
        return denormalize(config, x, raw_depth_p, (raw_depth_p > 0))

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
            # sensor-validity mask for pixel imputation guidance (the
            # in-pipeline sim_disp != 0 fallback only works under SSI)
            if raw_depth_p is not None:
                kwargs["raw_mask"] = raw_depth_p > 0
            out = pipeline(jax.random.fold_in(key, r), **kwargs)
        rounds.append(padder.unpad(out.images))

    if out is not None and getattr(out, "intermediates", None) is not None:
        # intermediates [S,B,Hp,Wp,C] leave eval_batch unpadded like
        # images do (consumers denormalize them against the UNPADDED gt)
        inter = out.intermediates
        S = inter.shape[0]
        inter = padder.unpad(inter.reshape((S * inter.shape[1],) + inter.shape[2:]))
        out = out._replace(
            intermediates=inter.reshape((S, -1) + inter.shape[1:]))

    pred = jnp.concatenate(rounds, axis=-1)  # [B,H,W,R]

    if config.ensemble:
        aligned = [
            ensemble_depths(jnp.moveaxis(pred[i], -1, 0))[0]
            for i in range(pred.shape[0])
        ]
        pred = jnp.stack(aligned)[..., None]

    pred_unnorm = denormalize(config, pred, raw_disp, mask, key=jax.random.fold_in(key, 999))
    gt = _to_host(raw_disp[..., 0])
    pred_mean = _to_host(jnp.mean(pred_unnorm, axis=-1))

    if _protocol_dataset(config, dataset_name) == "SceneFlow":
        # SceneFlow disparity clamp window (reference: evaluate.py:126-131)
        scale = 960.0 / float(config.camera_resolution.split("x")[0])
        lo, hi = 0.5 / scale, 192.0 / scale
        m = (gt >= lo) & (gt < hi)
        pred_mean = np.clip(pred_mean, lo, hi)
    else:
        m = _to_host(mask[..., 0]).astype(bool)

    metrics = compute_errors(
        jnp.asarray(gt), jnp.asarray(pred_mean), config.prediction_space,
        jnp.asarray(m), jnp.asarray(_to_host(fxb)) if fxb is not None else None,
    )
    metrics = (np.asarray(metrics[0]), np.asarray(metrics[1]))

    if pred.shape[-1] > 1:
        # std of the NORMALIZED rounds, matching the reference
        # (evaluate.py:141-142 takes std before denormalization)
        unc = np.zeros_like(gt)
        unc[m] = _to_host(jnp.std(pred, axis=-1))[m]
    else:
        unc = None

    err = np.zeros_like(gt)
    err[m] = np.abs(gt[m] - pred_mean[m])
    return pred_mean, metrics, unc, err, out


def quadrants(H: int, W: int):
    """The 4 half-resolution tile slices for coarse_to_fine. At the
    reference's 540x960 protocol resolution these are exactly its
    hard-coded 270x480 tiles (evaluate.py:362-410); deriving them from
    the shape keeps any other eval resolution working instead of
    producing empty slices."""
    h2, w2 = H // 2, W // 2
    return [
        (slice(0, h2), slice(0, w2)),
        (slice(h2, None), slice(0, w2)),
        (slice(0, h2), slice(w2, None)),
        (slice(h2, None), slice(w2, None)),
    ]


_SLICED_KEYS = ("raw_disp", "normalized_disp", "sim_disp", "sim_mask",
                "sim_disp_unnorm", "left_image", "right_image",
                "normalized_rgb", "mask", "raw_depth", "depth")


def _pipelines_per_weight(config, pipeline, guidance_weights=None):
    """One pipeline object per guidance weight, built ONCE so each keeps its
    own jit cache across batches (rebuilding per batch would recompile the
    sampling scan every batch)."""
    import dataclasses as _dc

    weights = [float(w) for w in (guidance_weights or config.flow_guidance_weights or [0.0])]
    pipes = {}
    for w in weights:
        if hasattr(pipeline, "guidance") and w != pipeline.guidance.flow_guidance_weight:
            pipes[w] = _dc.replace(
                pipeline,
                guidance=_dc.replace(pipeline.guidance, flow_guidance_weight=w),
            )
        else:
            pipes[w] = pipeline
    return pipes


def eval_sliced_batch(config, pipeline, batch, key, guidance_weights=None):
    """Sweep over flow_guidance_weights for one batch, returning
    {weight: eval_batch result} (reference: evaluate.py:188-194)."""
    pipes = _pipelines_per_weight(config, pipeline, guidance_weights)
    return {w: eval_batch(config, p, batch, key) for w, p in pipes.items()}


def evaluate_dataset(
    config,
    pipeline,
    loader,
    key: jax.Array,
    eval_output_dir: Optional[str] = None,
    preprocess=None,
    max_batches: Optional[int] = None,
    write_artifacts: bool = False,
    dataset_name: Optional[str] = None,
):
    """Loop a val loader; returns (metrics dict, RunningAverager).

    Sweeps config.flow_guidance_weights per batch with per-weight metric
    tracking (reference: evaluate.py:188-194); the returned dict is the LAST
    weight's aggregate plus a "per_weight" sub-dict when sweeping. Also
    handles coarse_to_fine quadrant tiling — metrics there are computed on
    the REASSEMBLED full-resolution prediction, not averaged per quadrant
    (equal-weight quadrant means would over-weight sparse quadrants).

    Reference: evaluate.py:340-427 (incl. coarse_to_fine quadrants) and
    distributed_evaluate.py:109-174 (per-batch metric gathering — here the
    batch is globally sharded so no explicit gather is needed).
    """
    import logging

    logger = logging.getLogger("d3roma_tpu.eval")
    pipes = _pipelines_per_weight(config, pipeline)
    weights = list(pipes.keys())
    stats = {w: RunningAverager(detect_anomaly={"epe": 10.0}) for w in weights}
    acc = {w: ([], []) for w in weights}  # (disp rows, depth rows)
    limit = max_batches if max_batches is not None else config.eval_num_batch

    def run_one(pipe, batch, bkey):
        if config.coarse_to_fine:
            B, H, W = batch["raw_disp"].shape[:3]
            pred = np.zeros((B, H, W), np.float32)
            for (ys, xs) in quadrants(H, W):
                mini = {
                    k: (v[:, ys, xs] if k in _SLICED_KEYS and hasattr(v, "ndim") and v.ndim == 4 else v)
                    for k, v in batch.items()
                }
                p_mini, _, _, _, _ = eval_batch(config, pipe, mini, bkey,
                                                dataset_name=dataset_name)
                pred[:, ys, xs] = p_mini
            gt = _to_host(batch["raw_disp"][..., 0])
            m = _to_host(batch["mask"][..., 0]).astype(bool)
            fxb = batch.get("fxb")
            md, me = compute_errors(
                jnp.asarray(gt), jnp.asarray(pred), config.prediction_space,
                jnp.asarray(m),
                jnp.asarray(_to_host(fxb)) if fxb is not None else None,
            )
            return pred, (np.asarray(md), np.asarray(me)), None, None, None
        return eval_batch(config, pipe, batch, bkey, dataset_name=dataset_name)

    for i, raw_batch in enumerate(loader):
        if limit and limit > 0 and i >= limit:
            break
        batch = preprocess(raw_batch) if preprocess is not None else raw_batch
        bkey = jax.random.fold_in(key, i)

        # Padded-tail duplicates (pad_batch_to_devices marks them with
        # sample_valid=0) must not enter the averages — the reference
        # de-duplicates via gather_for_metrics even-batches logic
        # (distributed_evaluate.py:162-167).
        sv = batch.get("sample_valid")
        sv = _to_host(sv) if sv is not None else None

        for w in weights:
            pred, metrics, unc, err, out = run_one(pipes[w], batch, bkey)
            md, me = metrics
            for b in range(md.shape[0]):
                if sv is not None and sv[b] == 0.0:
                    continue
                sample = dict(zip(["epe", "d1", "d2", "d3", "d5"], md[b]))
                sample.update(zip(["a1", "a2", "a3", "rmse", "rel", "mae"], me[b]))
                if stats[w].append(sample, index=(i, b)):
                    acc[w][0].append(md[b])
                    acc[w][1].append(me[b])
            if len(weights) > 1:
                logger.info(
                    "batch %d guidance_weight=%g epe=%.4f rel=%.4f",
                    i, w, float(np.mean(md[:, 0])), float(np.mean(me[:, 4])),
                )

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
            if (config.plot_denoised_images and out is not None
                    and hasattr(out, "intermediates")):
                # denoise-step grid (reference: evaluate.py:213-226 via
                # camera.py:887-942)
                from d3roma_tpu.utils.viz import plot_denoised_images

                plot_denoised_images(
                    [np.asarray(out.intermediates[s, 0, ..., 0])
                     for s in range(out.intermediates.shape[0])],
                    os.path.join(eval_output_dir, f"idx{i}_denoised.png"),
                )
            if (_protocol_dataset(config, dataset_name) == "HISS"
                    and "fxb" in batch):
                # per-item predicted sim-depth EXR dump for the HISS protocol
                # (reference: evaluate.py:246-261)
                from d3roma_tpu.utils.exr import write_exr

                fxb0 = float(np.asarray(batch["fxb"])[0])
                for b in range(pred.shape[0]):
                    depth_b = np.where(
                        pred[b] > 0, fxb0 / np.maximum(pred[b], 1e-6), 0.0
                    ).astype(np.float32)
                    write_exr(
                        os.path.join(eval_output_dir, f"idx{i}_{b}_simDepthImage.exr"),
                        depth_b,
                    )
            if config.plot_intermediate_metrics and out is not None and hasattr(out, "intermediates"):
                inter = denormalize(
                    config,
                    jnp.moveaxis(out.intermediates[..., 0], 0, -1),
                    batch["raw_disp"], batch["mask"],
                )  # [B,H,W,S]
                inter = jnp.moveaxis(inter, -1, 0)[..., None]
                imd, ime = evaluate_intermediate_metrics(
                    config, batch.get("fxb"), inter, batch["raw_disp"],
                    batch["mask"], dataset_name=dataset_name,
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

    last_w = weights[-1]
    per_weight = {
        w: (metrics_to_dict(np.stack(d), np.stack(e)) if d else {})
        for w, (d, e) in acc.items()
    }
    for w in weights:
        if per_weight[w]:
            # metrics_to_dict returns {"disp": {...}, "depth": {...}}
            flat = {
                f"{grp}/{k}": round(float(v), 4)
                for grp, sub in per_weight[w].items()
                for k, v in sub.items()
            }
            logger.info("guidance_weight=%g aggregate: %s", w, flat)
    result = dict(per_weight[last_w])
    if len(weights) > 1 and result:
        result["per_weight"] = per_weight
    return result, stats[last_w]


def evaluate_intermediate_metrics(
    config, fxb, intermediates: jnp.ndarray, gt_disp: jnp.ndarray,
    gt_mask: jnp.ndarray, dataset_name: Optional[str] = None,
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

    if _protocol_dataset(config, dataset_name) == "SceneFlow":
        scale = 960.0 / float(config.camera_resolution.split("x")[0])
        lo, hi = 0.5 / scale, 192.0 / scale
        masks = masks & (preds >= lo) & (preds < hi)
        preds = jnp.clip(preds, lo, hi)
    else:
        preds = jnp.maximum(preds, 0.25)  # prevent 0 disparities

    fxb_rep = jnp.repeat(fxb, S, axis=0) if fxb is not None else None
    md, me = compute_errors(gts, preds, config.prediction_space, masks, fxb_rep)
    return (np.asarray(md).reshape(B, S, -1), np.asarray(me).reshape(B, S, -1))
