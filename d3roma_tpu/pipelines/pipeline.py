"""Pipeline containers: model params + schedule + guidance + IO.

The reference exports diffusers pipeline directories via `save_pretrained`
(unet/vae/scheduler/guidance subdirs) and reloads them with
`from_pretrained` for eval and inference (reference: train.py:92-114,
evaluate.py:312-314, inference.py:66-96). This module provides the same
directory contract for the Flax models: per-module `config.json` +
`params.msgpack`, plus a root `model_index.json`.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from d3roma_tpu.guidance import FlowGuidance
from d3roma_tpu.models import (
    AutoencoderKL,
    UNet2D,
    UNet2DCondition,
    decode_latent,
    encode_disp_to_latent,
    encode_image_to_latent,
)
from d3roma_tpu.ops.normalizer import Normalizer
from d3roma_tpu.ops.schedules import ScheduleConfig
from d3roma_tpu.pipelines.sampling import (
    PipelineOutput,
    SamplerSpec,
    latent_pipeline,
    pixel_pipeline,
)


def _save_module(path: str, config: dict, params) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))


def _load_module(path: str):
    with open(os.path.join(path, "config.json")) as f:
        config = json.load(f)
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        params = serialization.msgpack_restore(f.read())
    # msgpack_restore yields HOST numpy arrays; as jit arguments those are
    # re-uploaded on EVERY pipeline call (measured 30-65 s/call for the
    # flagship through a remote-attached device). Commit them to the
    # default device once at load.
    import jax

    params = jax.tree.map(jnp.asarray, params)
    return config, params


def _dc_dict(dc) -> dict:
    return dataclasses.asdict(dc)


def _cast_tree_bf16(tree):
    import jax

    return jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if hasattr(p, "dtype") and p.dtype == jnp.float32 else p,
        tree,
    )



@dataclasses.dataclass
class GuidedDiffusionPipeline:
    """Pixel-space pipeline (reference: core/custom_pipelines.py:90-213)."""

    unet: UNet2D
    unet_params: dict
    spec: SamplerSpec
    guidance: FlowGuidance
    normalizer: Normalizer

    def __post_init__(self):
        self._tables = self.spec.schedule.tables()
        self._jitted = {}

    def replace_sampler(self, spec: SamplerSpec) -> "GuidedDiffusionPipeline":
        return GuidedDiffusionPipeline(
            self.unet, self.unet_params, spec, self.guidance, self.normalizer
        )

    def half_precision(self) -> "GuidedDiffusionPipeline":
        """Inference-only: hold params in bf16 (halves weight-streaming HBM
        traffic per denoise step and removes the per-scan-iteration fp32->
        bf16 casts XLA cannot hoist out of the sampling while-loop)."""
        import dataclasses as _dc

        unet = _dc.replace(self.unet, dtype=jnp.bfloat16) if self.unet.dtype != jnp.bfloat16 else self.unet
        return GuidedDiffusionPipeline(
            unet, _cast_tree_bf16(self.unet_params), self.spec,
            self.guidance, self.normalizer,
        )

    def quantize_int8(self) -> "GuidedDiffusionPipeline":
        """Inference-only: run matmuls/convs on the int8 MXU path (2x the
        bf16 rate on v5e). Weights stay bf16 in the param tree and are
        quantized at trace time — XLA hoists the loop-invariant weight
        quantization out of the sampling scan (see ops/quant.py)."""
        import dataclasses as _dc

        return GuidedDiffusionPipeline(
            _dc.replace(self.unet, quant=True), self.unet_params, self.spec,
            self.guidance, self.normalizer,
        )

    def fuse_norms(self) -> "GuidedDiffusionPipeline":
        """Single-pass Pallas GroupNorm+SiLU on TPU (ops/pallas/groupnorm.py;
        numerics-preserving: fp32 statistics either way)."""
        import dataclasses as _dc

        return GuidedDiffusionPipeline(
            _dc.replace(self.unet, fused_norm=True), self.unet_params,
            self.spec, self.guidance, self.normalizer,
        )

    def __call__(
        self,
        key: jax.Array,
        num_inference_steps: int,
        num_intermediate_images: int,
        depth_channels: int,
        cond_channels: str,
        rgb_images=None,
        left_images=None,
        right_images=None,
        sim_disp=None,
        raw_mask=None,
        add_noise_rgb: bool = False,
    ) -> PipelineOutput:
        sig = (num_inference_steps, num_intermediate_images, depth_channels,
               cond_channels, add_noise_rgb,
               tuple(x.shape for x in (rgb_images, left_images, right_images, sim_disp)
                     if x is not None))
        if sig not in self._jitted:
            def fn(params, key, rgb, left, right, raw, mask):
                def unet_apply(model_input, t):
                    return self.unet.apply({"params": params}, model_input, t)
                return pixel_pipeline(
                    unet_apply, self.spec, self._tables, key,
                    num_inference_steps, num_intermediate_images,
                    depth_channels, cond_channels,
                    rgb=rgb, left=left, right=right, sim_disp=raw,
                    guidance=self.guidance, raw_mask=mask,
                    add_noise_rgb=add_noise_rgb,
                )
            self._jitted[sig] = jax.jit(fn)
        return self._jitted[sig](
            self.unet_params, key, rgb_images, left_images, right_images,
            sim_disp, raw_mask,
        )

    # ------------------------------------------------------------------ #
    def save_pretrained(self, out_dir: str) -> None:
        os.makedirs(out_dir, exist_ok=True)
        unet_cfg = {
            k: getattr(self.unet, k)
            for k in ("in_channels", "out_channels", "block_out_channels",
                      "down_block_types", "up_block_types", "layers_per_block",
                      "attention_head_dim", "norm_groups")
        }
        _save_module(os.path.join(out_dir, "unet"), unet_cfg, self.unet_params)
        meta = {
            "pipeline_class": "GuidedDiffusionPipeline",
            "scheduler": {"kind": self.spec.kind, "eta": self.spec.eta,
                          "use_clipped_model_output": self.spec.use_clipped_model_output,
                          "schedule": _dc_dict(self.spec.schedule)},
            "guidance": _dc_dict(self.guidance),
            "normalizer": _dc_dict(self.normalizer),
        }
        with open(os.path.join(out_dir, "model_index.json"), "w") as f:
            json.dump(meta, f, indent=2)

    @classmethod
    def from_pretrained(cls, out_dir: str) -> "GuidedDiffusionPipeline":
        with open(os.path.join(out_dir, "model_index.json")) as f:
            meta = json.load(f)
        unet_cfg, unet_params = _load_module(os.path.join(out_dir, "unet"))
        for k in ("block_out_channels", "down_block_types", "up_block_types"):
            unet_cfg[k] = tuple(unet_cfg[k])
        unet = UNet2D(**unet_cfg)
        sch = meta["scheduler"]
        spec = SamplerSpec(
            kind=sch["kind"], eta=sch["eta"],
            use_clipped_model_output=sch["use_clipped_model_output"],
            schedule=ScheduleConfig(**sch["schedule"]),
        )
        norm = meta["normalizer"]
        for k in ("ch_bounds", "ch_gammas"):
            norm[k] = tuple(norm[k])
        return cls(
            unet=unet, unet_params=unet_params, spec=spec,
            guidance=FlowGuidance(**meta["guidance"]),
            normalizer=Normalizer(**norm),
        )


@dataclasses.dataclass
class GuidedLatentDiffusionPipeline:
    """Latent pipeline with frozen VAE + precomputed empty-prompt embedding
    (reference: core/custom_pipelines.py:208-462). The CLIP tower itself is
    not carried at inference — its empty-prompt output is baked in, matching
    the reference's single empty-prompt use (custom_pipelines.py:241-254)."""

    unet: UNet2DCondition
    unet_params: dict
    vae: AutoencoderKL
    vae_params: dict
    text_embed: jnp.ndarray  # [1, 77, cross_attention_dim]
    spec: SamplerSpec
    guidance: FlowGuidance
    normalizer: Normalizer

    def __post_init__(self):
        self._tables = self.spec.schedule.tables()
        self._jitted = {}

    def replace_sampler(self, spec: SamplerSpec) -> "GuidedLatentDiffusionPipeline":
        return GuidedLatentDiffusionPipeline(
            self.unet, self.unet_params, self.vae, self.vae_params,
            self.text_embed, spec, self.guidance, self.normalizer,
        )

    def half_precision(self) -> "GuidedLatentDiffusionPipeline":
        """Inference-only bf16 params (see GuidedDiffusionPipeline.half_precision)."""
        import dataclasses as _dc

        unet = _dc.replace(self.unet, dtype=jnp.bfloat16) if self.unet.dtype != jnp.bfloat16 else self.unet
        vae = _dc.replace(self.vae, dtype=jnp.bfloat16) if self.vae.dtype != jnp.bfloat16 else self.vae
        return GuidedLatentDiffusionPipeline(
            unet, _cast_tree_bf16(self.unet_params),
            vae, _cast_tree_bf16(self.vae_params),
            self.text_embed, self.spec, self.guidance, self.normalizer,
        )

    def quantize_int8(self) -> "GuidedLatentDiffusionPipeline":
        """Inference-only int8 MXU path for UNet + VAE (see
        GuidedDiffusionPipeline.quantize_int8)."""
        import dataclasses as _dc

        return GuidedLatentDiffusionPipeline(
            _dc.replace(self.unet, quant=True), self.unet_params,
            _dc.replace(self.vae, quant=True), self.vae_params,
            self.text_embed, self.spec, self.guidance, self.normalizer,
        )

    def fuse_norms(self) -> "GuidedLatentDiffusionPipeline":
        """Single-pass Pallas GroupNorm+SiLU on TPU for UNet + VAE."""
        import dataclasses as _dc

        return GuidedLatentDiffusionPipeline(
            _dc.replace(self.unet, fused_norm=True), self.unet_params,
            _dc.replace(self.vae, fused_norm=True), self.vae_params,
            self.text_embed, self.spec, self.guidance, self.normalizer,
        )

    def fast_inference(self, mode: str = "throughput") -> "GuidedLatentDiffusionPipeline":
        """Apply the measured-best TPU inference configuration
        (docs/PERFORMANCE.md): bf16 params, whole-row Pallas
        self-attention (N>=512 sites), fused GEGLU feed-forward, and —
        in "throughput" mode — the static-scale int8 MXU path for
        UNet+VAE. "latency" (batch-1/streaming) skips int8, which is
        latency-bound there. "off" returns self unchanged."""
        import dataclasses as _dc

        if mode in ("off", "", None):
            return self
        if mode not in ("throughput", "latency"):
            raise ValueError(f"unknown fast_inference mode {mode!r}")
        quant = "static" if mode == "throughput" else False
        pipe = self.half_precision()
        return GuidedLatentDiffusionPipeline(
            _dc.replace(pipe.unet, use_flash_attention="pallas-self",
                        fused_ff=True, quant=quant),
            pipe.unet_params,
            _dc.replace(pipe.vae, quant=quant), pipe.vae_params,
            pipe.text_embed, pipe.spec, pipe.guidance, pipe.normalizer,
        )

    # vae helpers bound to params
    def _vae_apply(self, params):
        def apply(x, method):
            return self.vae.apply({"params": params}, x, method=method)
        return apply

    def __call__(
        self,
        key: jax.Array,
        num_inference_steps: int,
        num_intermediate_images: int,
        cond_channels: str,
        rgb_images=None,
        left_images=None,
        right_images=None,
        sim_disp=None,
        raw_depth=None,
        denormer: Optional[Callable] = None,
        denorm_builder: Optional[Callable] = None,
        denorm_mask=None,
        add_noise_rgb: bool = False,
    ) -> PipelineOutput:
        # Two ways to supply the guidance denormalizer:
        # - `denormer`: a ready closure — its captured arrays are baked in
        #   as jit constants, so the cache keys on the closure's identity
        #   (and pins it so a recycled id can never alias a live key).
        # - `denorm_builder` + `denorm_mask`: a STABLE builder
        #   fn(x, raw_depth, mask) — raw/mask enter the program as traced
        #   arguments, so per-frame data (streaming) never forces a
        #   retrace and never goes stale.
        assert denormer is None or denorm_builder is None
        sig = (num_inference_steps, num_intermediate_images, cond_channels,
               add_noise_rgb,
               id(denormer) if denormer is not None else None,
               id(denorm_builder) if denorm_builder is not None else None,
               tuple(x.shape for x in (rgb_images, left_images, right_images,
                                       sim_disp, raw_depth, denorm_mask)
                     if x is not None))
        if sig not in self._jitted:
            def fn(unet_params, vae_params, text_embed, key,
                   rgb, left, right, raw, raw_depth, mask):
                vapply = self._vae_apply(vae_params)

                def unet_apply(model_input, t, ctx):
                    return self.unet.apply({"params": unet_params},
                                           model_input, t, ctx)

                dn = denormer
                if denorm_builder is not None:
                    dn = lambda x: denorm_builder(x, raw_depth, mask)
                return latent_pipeline(
                    unet_apply,
                    vae_encode=lambda x: encode_image_to_latent(vapply, x),
                    vae_encode_disp=lambda x: encode_disp_to_latent(vapply, x),
                    vae_decode=lambda z: decode_latent(vapply, z),
                    text_embed=text_embed,
                    spec=self.spec, tables=self._tables, key=key,
                    num_inference_steps=num_inference_steps,
                    num_intermediate_images=num_intermediate_images,
                    cond_channels=cond_channels,
                    rgb=rgb, left=left, right=right, sim_disp=raw,
                    raw_depth=raw_depth,
                    guidance=self.guidance if raw_depth is not None else None,
                    denormer=dn, add_noise_rgb=add_noise_rgb,
                )
            self._jitted[sig] = (jax.jit(fn), (denormer, denorm_builder))
        return self._jitted[sig][0](
            self.unet_params, self.vae_params, self.text_embed, key,
            rgb_images, left_images, right_images, sim_disp, raw_depth,
            denorm_mask,
        )

    # ------------------------------------------------------------------ #
    def save_pretrained(self, out_dir: str) -> None:
        os.makedirs(out_dir, exist_ok=True)
        unet_cfg = {
            k: getattr(self.unet, k)
            for k in ("in_channels", "out_channels", "block_out_channels",
                      "down_block_types", "up_block_types", "layers_per_block",
                      "attention_head_dim", "cross_attention_dim", "norm_groups")
        }
        _save_module(os.path.join(out_dir, "unet"), unet_cfg, self.unet_params)
        vae_cfg = {
            k: getattr(self.vae, k)
            for k in ("in_channels", "out_channels", "latent_channels",
                      "block_out_channels", "norm_groups")
        }
        _save_module(os.path.join(out_dir, "vae"), vae_cfg, self.vae_params)
        np.save(os.path.join(out_dir, "text_embed.npy"),
                np.asarray(self.text_embed))
        meta = {
            "pipeline_class": "GuidedLatentDiffusionPipeline",
            "scheduler": {"kind": self.spec.kind, "eta": self.spec.eta,
                          "use_clipped_model_output": self.spec.use_clipped_model_output,
                          "schedule": _dc_dict(self.spec.schedule)},
            "guidance": _dc_dict(self.guidance),
            "normalizer": _dc_dict(self.normalizer),
        }
        with open(os.path.join(out_dir, "model_index.json"), "w") as f:
            json.dump(meta, f, indent=2)

    @classmethod
    def from_pretrained(cls, out_dir: str) -> "GuidedLatentDiffusionPipeline":
        with open(os.path.join(out_dir, "model_index.json")) as f:
            meta = json.load(f)
        unet_cfg, unet_params = _load_module(os.path.join(out_dir, "unet"))
        for k in ("block_out_channels", "down_block_types", "up_block_types"):
            unet_cfg[k] = tuple(unet_cfg[k])
        vae_cfg, vae_params = _load_module(os.path.join(out_dir, "vae"))
        vae_cfg["block_out_channels"] = tuple(vae_cfg["block_out_channels"])
        text_embed = jnp.asarray(np.load(os.path.join(out_dir, "text_embed.npy")))
        sch = meta["scheduler"]
        spec = SamplerSpec(
            kind=sch["kind"], eta=sch["eta"],
            use_clipped_model_output=sch["use_clipped_model_output"],
            schedule=ScheduleConfig(**sch["schedule"]),
        )
        norm = meta["normalizer"]
        for k in ("ch_bounds", "ch_gammas"):
            norm[k] = tuple(norm[k])
        return cls(
            unet=UNet2DCondition(**unet_cfg), unet_params=unet_params,
            vae=AutoencoderKL(**vae_cfg), vae_params=vae_params,
            text_embed=text_embed, spec=spec,
            guidance=FlowGuidance(**meta["guidance"]),
            normalizer=Normalizer(**norm),
        )


def create_sampler_spec(config, train: bool = True) -> SamplerSpec:
    """Reference: config.py:182-212. `schedule_config(train=...)` validates
    that only ddpm-family samplers are used for training; SamplerSpec's own
    __post_init__ rejects unknown kinds."""
    return SamplerSpec(
        kind=config.sampler,
        schedule=config.schedule_config(train=train),
        eta=float(getattr(config, "eta", 0.0)),
    )
