"""Single-frame inference API — the canonical deployment surface.

Rebuild of the reference's `D3RoMa` class (reference: inference.py:37-250):
composes a config from overrides, loads an exported pipeline directory,
optionally swaps the sampler to MyDDIM, and exposes
``infer(left, right, raw_depth, rgb)`` / ``infer_with_rgb_raw(rgb,
raw_depth)`` returning metric depth in meters. The whole denoise runs as
one jitted scan per input resolution; repeated calls at the same
resolution reuse the compiled program (real-time path — 5-step config of
d3roma_processor.py:38-42).
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from d3roma_tpu.config import Config, TrainingConfig, compose
from d3roma_tpu.evaluation.eval_loop import denormalize
from d3roma_tpu.ops import compute_errors, metrics_to_dict
from d3roma_tpu.ops.normalizer import Normalizer
from d3roma_tpu.pipelines import (
    GuidedDiffusionPipeline,
    GuidedLatentDiffusionPipeline,
    SamplerSpec,
)
from d3roma_tpu.utils.camera import Realsense

logger = logging.getLogger(__name__)


def _cv2():
    import cv2

    cv2.setNumThreads(0)
    return cv2


class D3RoMa:
    """Depth restoration from stereo IR / RGB-D frames."""

    RELEASED_VARIANTS = ("left+right+raw", "rgb+raw")

    def __init__(self, overrides: List[str] = (), camera: Optional[Realsense] = None,
                 variant: str = "left+right+raw", pipeline=None, seed: int = 0):
        assert variant in self.RELEASED_VARIANTS, "not released yet"
        self.camera = camera
        base_cfg: Config = compose(overrides)
        config = base_cfg.task
        if base_cfg.seed is not None and base_cfg.seed != -1:
            seed = base_cfg.seed
        self._key = jax.random.PRNGKey(seed)

        self.camera.change_resolution(
            f"{config.image_size[1]}x{config.image_size[0]}"
        )
        self.pipeline = pipeline if pipeline is not None else self._load_pipeline(config)
        tp = max(1, int(getattr(config, "tensor_parallel", 1) or 1))
        if tp > 1:
            # serve tensor-parallel over a (data, model) mesh — the
            # multi-chip batch-1 latency lever (docs/PERFORMANCE.md).
            # Applied here (not in _load_pipeline) so an explicitly
            # passed pipeline honors the override too.
            from d3roma_tpu.parallel import shard_pipeline_tp

            # fast_inference kernels compose with TP via their shard_map
            # wrappers (shard_pipeline_tp sets tp_mesh on the modules;
            # mesh-ineligible sites fall back to the XLA path). The
            # round-4 gate that forced fast_inference off here is gone.
            self.pipeline, _ = shard_pipeline_tp(self.pipeline, tp, logger)
        if getattr(config, "aot_cache", "") and hasattr(self.pipeline,
                                                        "with_aot_cache"):
            # serving restarts skip trace+compile (serving/aot.py). The
            # token keys the guidance denormalizer closure, which is
            # built from the config (run_pipeline::_denorm_builder) —
            # hash the whole config so any change misses instead of
            # loading a stale program.
            import dataclasses as _dc
            import hashlib as _hl
            import json as _json

            tok = _hl.sha256(_json.dumps(
                _dc.asdict(config), sort_keys=True, default=str,
            ).encode()).hexdigest()[:16]
            self.pipeline = self.pipeline.with_aot_cache(
                config.aot_cache, token=tok)
            logger.info("AOT executable cache at %s", config.aot_cache)

        self.eval_output_dir = f"_outputs.{variant}"
        os.makedirs(self.eval_output_dir, exist_ok=True)
        self.normer = Normalizer.from_config(config)
        self.config = config
        self.variant = variant
        # created lazily on first run_pipeline (shapes fixed by the camera)
        self._jit_pre = None
        self._jit_post = None
        self._jit_pre_b = None
        self._jit_post_b = None
        # stable identity: the pipeline's jit cache keys on this object
        self._denorm_builder = (
            lambda x, raw, mask: denormalize(self.config, x, raw, mask)
        )

    # ------------------------------------------------------------------ #
    def _load_pipeline(self, config: TrainingConfig):
        path = f"{config.resume_pretrained}"
        if not os.path.exists(path):
            raise ValueError(f"pretrained path not exists: {path}")
        logger.info("load weights from %s", path)
        cls = GuidedLatentDiffusionPipeline if config.ldm else GuidedDiffusionPipeline
        pipeline = cls.from_pretrained(path)
        import dataclasses

        pipeline = dataclasses.replace(
            pipeline,
            guidance=dataclasses.replace(
                pipeline.guidance, flow_guidance_mode=config.flow_guidance_mode
            ),
        )
        if config.sampler == "my_ddim":
            # sampler override (reference: inference.py:77-92)
            spec = SamplerSpec("my_ddim", config.schedule_config(train=False))
            pipeline = pipeline.replace_sampler(spec)
            logger.info("Careful! sampler is overriden to %s", config.sampler)
        if config.fast_inference != "off" and hasattr(pipeline, "fast_inference"):
            pipeline = pipeline.fast_inference(config.fast_inference)
            logger.info("fast_inference=%s kernels enabled", config.fast_inference)
        from d3roma_tpu.config import deepcache_active

        if ((deepcache_active(config.deepcache)
             or config.deepcache_depth != 1)
                and hasattr(pipeline, "deepcache")):
            pipeline = pipeline.deepcache(config.deepcache,
                                          depth=config.deepcache_depth)
            logger.info("deepcache schedule=%s depth=%d enabled",
                        config.deepcache, config.deepcache_depth)
        return pipeline

    # ------------------------------------------------------------------ #
    def _prep_rgb_raw(self, rgb: np.ndarray, raw_depth: np.ndarray):
        """Shared host prep: resize to the camera resolution, depth (m) ->
        raw disparity (reference: inference.py:98-134)."""
        cv2 = _cv2()
        assert rgb.dtype == np.uint8
        if rgb.ndim == 2:
            rgb = np.tile(rgb[..., None], (1, 1, 3))
        rgb = rgb[..., :3]
        rgb = cv2.resize(rgb, self.camera.resolution[::-1],
                         interpolation=cv2.INTER_LINEAR)
        if raw_depth.shape[:2] != tuple(self.camera.resolution):
            raw_depth = cv2.resize(raw_depth, self.camera.resolution[::-1],
                                   interpolation=cv2.INTER_NEAREST)
        assert self.config.prediction_space == "disp", "not implemented"
        raw_disp = np.where(
            raw_depth > 0,
            self.camera.fxb_depth / np.maximum(raw_depth, 1e-8), 0.0)
        return rgb, raw_disp.astype(np.float32)

    def infer_with_rgb_raw(self, rgb: np.ndarray, raw_depth: np.ndarray) -> np.ndarray:
        """RGB (uint8, aligned with depth) + raw depth (meters) -> restored
        metric depth (reference: inference.py:98-134)."""
        rgb, raw_disp = self._prep_rgb_raw(rgb, raw_depth)
        return self.run_pipeline(None, None, raw_disp, rgb)

    def infer_with_rgb_raw_batch(self, frames) -> List[np.ndarray]:
        """Batched `infer_with_rgb_raw`: N (rgb, raw_depth) frames in ONE
        pipeline call (batch N x rounds). This is the TPU-efficient path
        for multi-camera / multi-client serving — one batch-16 call costs
        ~4x less per frame than 16 single-frame calls
        (docs/PERFORMANCE.md); `streaming.MicroBatcher` aggregates
        concurrent requests into it.

        `frames`: sequence of (rgb uint8 [H,W,3] or [H,W], raw_depth
        float meters [H,W]). Returns a list of [H,W] float32 metric
        depths, frame order preserved.
        """
        rgbs, disps = [], []
        for rgb, raw_depth in frames:
            rgb, raw_disp = self._prep_rgb_raw(rgb, raw_depth)
            rgbs.append(rgb)
            disps.append(raw_disp)
        depths = self.run_pipeline_batch(np.stack(disps), np.stack(rgbs))
        return [depths[i] for i in range(len(frames))]

    def infer(self, left: np.ndarray, right: np.ndarray,
              raw_depth: Optional[np.ndarray] = None,
              rgb: Optional[np.ndarray] = None) -> np.ndarray:
        """Stereo IR pair (+ raw depth) -> restored metric depth
        (reference: inference.py:136-190)."""
        cv2 = _cv2()

        def prep_gray(x):
            if x.ndim == 2:
                x = np.tile(x[..., None], (1, 1, 3))
            x = x[..., :3]
            return cv2.resize(x, self.camera.resolution[::-1],
                              interpolation=cv2.INTER_LINEAR)

        left = prep_gray(left)
        right = prep_gray(right)
        if rgb is not None:
            rgb = prep_gray(rgb)
        if raw_depth is not None:
            if raw_depth.shape[:2] != tuple(self.camera.resolution):
                raw_depth = cv2.resize(raw_depth, self.camera.resolution[::-1],
                                       interpolation=cv2.INTER_NEAREST)
            raw_disp = np.where(raw_depth > 0,
                                self.camera.fxb_depth / np.maximum(raw_depth, 1e-8), 0.0)
        else:
            raw_disp = np.zeros(self.camera.resolution, np.float32)
        assert left.shape[0] % 8 == 0 and left.shape[1] % 8 == 0, (
            "image size must be multiple of 8"
        )
        return self.run_pipeline(left, right, raw_disp.astype(np.float32), rgb)

    # ------------------------------------------------------------------ #
    def run_pipeline(self, left_image, right_image, raw_disp, rgb) -> np.ndarray:
        """Normalize, batch by inference rounds, denoise, denormalize,
        convert to metric depth (reference: inference.py:191-250).

        Pre- and post-processing each run as ONE jitted program: on a
        remote-attached device every eager jnp op pays a full dispatch
        round trip (~0.3 s here), which turned the streaming API's
        host-side math into tens of seconds per frame."""
        R = self.config.num_inference_rounds
        norm_rgb = lambda x: (x.astype(np.float32) / 255.0 - 0.5) * 2.0

        def rep(x):
            return jnp.broadcast_to(jnp.asarray(x)[None], (R,) + x.shape)

        rgb_b = rep(norm_rgb(rgb)) if rgb is not None else None
        left_b = rep(norm_rgb(left_image)) if left_image is not None else None
        right_b = rep(norm_rgb(right_image)) if right_image is not None else None

        if self._jit_pre is None:
            def pre_fn(raw_disp):
                raw_disp_j = raw_disp[..., None]  # [H,W,1]
                normalized_raw, _, _ = self.normer.normalize(raw_disp_j)
                raw_disp_b = jnp.broadcast_to(raw_disp_j[None],
                                              (R,) + raw_disp_j.shape)
                mask = (raw_disp_b > 0).astype(jnp.float32)
                norm_b = jnp.broadcast_to(normalized_raw[None],
                                          (R,) + normalized_raw.shape)
                return norm_b, raw_disp_b, mask

            def post_fn(pred, raw_disp, raw_disp_b, mask, key):
                # rounds-as-batch -> [1,H,W,R]: SSI alignment over rounds
                pred_r = jnp.transpose(pred, (3, 1, 2, 0))
                pred_unnorm = denormalize(
                    self.config, pred_r, raw_disp_b[:1], mask[:1],
                    key=jax.random.fold_in(key, 1),
                )  # [1,H,W,R]
                unc = jnp.std(pred_r, axis=-1)[0]
                pred_mean = jnp.mean(pred_unnorm, axis=-1)  # [1,H,W]
                md, me = compute_errors(
                    raw_disp[None], pred_mean,
                    self.config.prediction_space,
                    (raw_disp > 0)[None],
                    jnp.asarray([self.camera.fxb_depth]),
                )
                pred_disp = pred_mean[0]
                pred_depth = jnp.where(
                    pred_disp > 0,
                    self.camera.fxb_depth / jnp.maximum(pred_disp, 1e-8), 0.0)
                return pred_depth, unc, md, me

            self._jit_pre = jax.jit(pre_fn)
            self._jit_post = jax.jit(post_fn)

        raw_disp_dev = jnp.asarray(raw_disp)
        normalized_raw_b, raw_disp_b, mask = self._jit_pre(raw_disp_dev)

        self._key, key = jax.random.split(self._key)
        kwargs = dict(
            num_inference_steps=self.config.num_inference_timesteps,
            num_intermediate_images=self.config.num_intermediate_images,
            cond_channels=self.config.cond_channels,
            rgb_images=rgb_b, left_images=left_b, right_images=right_b,
            sim_disp=normalized_raw_b,
            add_noise_rgb=self.config.noise_rgb,
        )
        if isinstance(self.pipeline, GuidedLatentDiffusionPipeline):
            if self.config.split_programs:
                kwargs["split_programs"] = True
            if self.config.scan_chunk:
                kwargs["scan_chunk"] = self.config.scan_chunk
            if self.pipeline.guidance.enabled:
                kwargs["raw_depth"] = raw_disp_b
                # stable builder + traced mask: raw/mask enter the jitted
                # program as arguments, so streaming frames never retrace
                # and never reuse a stale frame's constants
                kwargs["denorm_builder"] = self._denorm_builder
                kwargs["denorm_mask"] = mask
            out = self.pipeline(key, **kwargs)
        else:
            kwargs["depth_channels"] = self.config.depth_channels
            # real sensor-validity mask for imputation guidance: the
            # in-pipeline fallback (sim_disp != 0) is wrong for non-SSI
            # normalizers (raw 0 normalizes to -1)
            kwargs["raw_mask"] = mask
            out = self.pipeline(key, **kwargs)

        pred_depth, unc, md, me = self._jit_post(
            out.images, raw_disp_dev, raw_disp_b, mask, key)
        if R > 1:
            self.last_uncertainty = np.asarray(unc)
        logger.info("metrics vs raw: %s",
                    metrics_to_dict(np.asarray(md), np.asarray(me)))
        return np.asarray(pred_depth, np.float32)

    # ------------------------------------------------------------------ #
    def run_pipeline_batch(self, raw_disps: np.ndarray,
                           rgbs: np.ndarray) -> np.ndarray:
        """Batched `run_pipeline` for the rgb+raw variant: N frames ->
        ONE pipeline call at batch N*rounds. Returns [N,H,W] metric depth.

        Same math per frame as the single path (normalize / denoise /
        per-frame SSI denormalize over rounds / disparity->depth); the
        serving contract pins num_intermediate_images=1 (the reference's
        deployment override, d3roma_processor.py:38-42)."""
        assert self.config.num_intermediate_images == 1, (
            "batched serving decodes only the final prediction")
        R = self.config.num_inference_rounds

        def rep_b(x):  # [N, ...] -> [N*R, ...] (frame-major: rounds adjacent)
            return jnp.broadcast_to(
                x[:, None], (x.shape[0], R) + x.shape[1:]
            ).reshape((x.shape[0] * R,) + x.shape[1:])

        if self._jit_pre_b is None:
            def pre_fn(raw_disp, rgb):  # [N,H,W], [N,H,W,3] uint8
                rgb_n = (rgb.astype(jnp.float32) / 255.0 - 0.5) * 2.0
                raw = raw_disp[..., None]                      # [N,H,W,1]
                normalized, _, _ = self.normer.normalize(raw)  # per-sample
                raw_b = rep_b(raw)
                mask_b = (raw_b > 0).astype(jnp.float32)
                return rep_b(normalized), rep_b(rgb_n), raw_b, mask_b

            def post_fn(pred, raw_disp, key):  # pred [N*R,H,W,1]
                N = raw_disp.shape[0]
                p = pred[..., 0].reshape((N, R) + pred.shape[1:3])
                p = jnp.moveaxis(p, 1, -1)                     # [N,H,W,R]
                raw = raw_disp[..., None]
                mask = (raw > 0).astype(jnp.float32)
                pred_unnorm = denormalize(
                    self.config, p, raw, mask,
                    key=jax.random.fold_in(key, 1))            # [N,H,W,R]
                unc = jnp.std(p, axis=-1)                      # [N,H,W]
                pred_disp = jnp.mean(pred_unnorm, axis=-1)     # [N,H,W]
                pred_depth = jnp.where(
                    pred_disp > 0,
                    self.camera.fxb_depth / jnp.maximum(pred_disp, 1e-8),
                    0.0)
                return pred_depth, unc

            self._jit_pre_b = jax.jit(pre_fn)
            self._jit_post_b = jax.jit(post_fn)

        raw_dev = jnp.asarray(raw_disps)
        norm_b, rgb_b, raw_b, mask_b = self._jit_pre_b(
            raw_dev, jnp.asarray(rgbs))

        self._key, key = jax.random.split(self._key)
        kwargs = dict(
            num_inference_steps=self.config.num_inference_timesteps,
            num_intermediate_images=1,
            cond_channels=self.config.cond_channels,
            rgb_images=rgb_b, sim_disp=norm_b,
            add_noise_rgb=self.config.noise_rgb,
        )
        if isinstance(self.pipeline, GuidedLatentDiffusionPipeline):
            if self.config.split_programs:
                kwargs["split_programs"] = True
            if self.config.scan_chunk:
                kwargs["scan_chunk"] = self.config.scan_chunk
            if self.pipeline.guidance.enabled:
                kwargs["raw_depth"] = raw_b
                kwargs["denorm_builder"] = self._denorm_builder
                kwargs["denorm_mask"] = mask_b
        else:
            kwargs["depth_channels"] = self.config.depth_channels
            kwargs["raw_mask"] = mask_b  # see infer(): non-SSI fallback trap
        out = self.pipeline(key, **kwargs)

        pred_depth, unc = self._jit_post_b(out.images, raw_dev, key)
        if R > 1:
            self.last_uncertainty = np.asarray(unc)
        return np.asarray(pred_depth, np.float32)
