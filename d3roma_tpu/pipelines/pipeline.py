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
    encode_image_to_latent,
)
from d3roma_tpu.ops.normalizer import Normalizer
from d3roma_tpu.ops.schedules import ScheduleConfig
from d3roma_tpu.pipelines.sampling import (
    PipelineOutput,
    SamplerSpec,
    latent_decode_images,
    latent_denoise,
    latent_encode_conds,
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
    # compiled-executable cache (serving/aot.py); None = plain jit
    aot_cache_dir: Optional[str] = None
    aot_cache_token: str = ""

    def __post_init__(self):
        self._tables = self.spec.schedule.tables()
        self._jitted = {}

    def with_aot_cache(self, cache_dir: str, token: str = "") -> "GuidedDiffusionPipeline":
        """Persist/reuse compiled serving executables under `cache_dir`
        (serving/aot.py::ExecutableCache): a serving restart on the same
        device kind skips tracing AND XLA compilation. `token` must change
        whenever program-affecting state not visible in the config reprs
        changes."""
        return dataclasses.replace(
            self, aot_cache_dir=cache_dir, aot_cache_token=token)

    def _aot_fingerprint(self, sig) -> str:
        import hashlib

        parts = [repr(self.unet), repr(self.spec), repr(self.guidance),
                 repr(self.normalizer), self.aot_cache_token, repr(sig)]
        return "pixel_" + hashlib.sha256(
            "|".join(parts).encode()).hexdigest()[:24]

    def replace_sampler(self, spec: SamplerSpec) -> "GuidedDiffusionPipeline":
        return dataclasses.replace(self, spec=spec)

    def half_precision(self) -> "GuidedDiffusionPipeline":
        """Inference-only: hold params in bf16 (halves weight-streaming HBM
        traffic per denoise step and removes the per-scan-iteration fp32->
        bf16 casts XLA cannot hoist out of the sampling while-loop)."""
        import dataclasses as _dc

        unet = _dc.replace(self.unet, dtype=jnp.bfloat16) if self.unet.dtype != jnp.bfloat16 else self.unet
        return dataclasses.replace(
            self, unet=unet, unet_params=_cast_tree_bf16(self.unet_params))

    def quantize_int8(self) -> "GuidedDiffusionPipeline":
        """Inference-only: run matmuls/convs on the int8 MXU path (2x the
        bf16 rate on v5e). Weights stay bf16 in the param tree and are
        quantized at trace time — XLA hoists the loop-invariant weight
        quantization out of the sampling scan (see ops/quant.py)."""
        import dataclasses as _dc

        return dataclasses.replace(
            self, unet=_dc.replace(self.unet, quant=True))

    def fuse_norms(self) -> "GuidedDiffusionPipeline":
        """Single-pass Pallas GroupNorm+SiLU on TPU (ops/pallas/groupnorm.py;
        numerics-preserving: fp32 statistics either way)."""
        import dataclasses as _dc

        return dataclasses.replace(
            self, unet=_dc.replace(self.unet, fused_norm=True))

    def serving_fn(self, num_inference_steps: int,
                   num_intermediate_images: int, depth_channels: int,
                   cond_channels: str, add_noise_rgb: bool = False):
        """The EXACT (unjitted) program `__call__` runs, as a pure function
        `fn(params, key, rgb, left, right, raw, mask) -> PipelineOutput`.
        Exposed so the AOT serving exporter (serving/aot.py) serializes the
        same program deployment executes."""
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
        return fn

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
        # The sig must capture EVERY input degree of freedom: when an
        # ExecutableCache entry backs self._jitted[sig], the stored object
        # is a non-retracing jax.stages.Compiled, so a sig collision across
        # differing arg structures/dtypes would crash mid-serving.
        def _sd(x):
            return None if x is None else (tuple(x.shape), str(jnp.asarray(x).dtype))
        sig = (num_inference_steps, num_intermediate_images, depth_channels,
               cond_channels, add_noise_rgb,
               tuple(_sd(x) for x in (rgb_images, left_images, right_images,
                                      sim_disp, raw_mask)))
        args = (self.unet_params, key, rgb_images, left_images,
                right_images, sim_disp, raw_mask)
        if sig not in self._jitted:
            jit_fn = jax.jit(self.serving_fn(
                num_inference_steps, num_intermediate_images,
                depth_channels, cond_channels, add_noise_rgb))
            if self.aot_cache_dir:
                from d3roma_tpu.serving.aot import ExecutableCache

                jit_fn = ExecutableCache(self.aot_cache_dir).get_or_compile(
                    self._aot_fingerprint(sig), jit_fn, args)
            self._jitted[sig] = jit_fn
        return self._jitted[sig](*args)

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
    # Calibrated per-layer activation scales for the static int8 path
    # ({"unet": [...], "vae_encode": [...], "vae_decode": [...]}, floats in
    # call order — see ops/quant.py + calibrate()). None = the global
    # STATIC_ACT_SCALE fallback.
    act_scales: Optional[dict] = None
    # DeepCache interval (Ma et al., CVPR 2024): 1 = off; k > 1 runs the
    # full UNet on every k-th denoise step and a shallow cached pass
    # (conv_in + down block 0 + last up block + conv_out, reusing the
    # deep trunk feature) on the k-1 steps between. See deepcache().
    cache_interval: int = 1
    # Non-uniform DeepCache step pattern (overrides cache_interval): a
    # string over {F, S} of length num_inference_steps — F = full pass,
    # S = shallow cached pass. E.g. "FSFSFSFSFF" spends the saved FLOPs
    # on exact steps at the end of the trajectory, where caching drift
    # accrues fastest. See deepcache() / sampling.parse_cache_schedule.
    cache_schedule: Optional[str] = None
    # compiled-executable cache (serving/aot.py); None = plain jit
    aot_cache_dir: Optional[str] = None
    aot_cache_token: str = ""

    def __post_init__(self):
        self._tables = self.spec.schedule.tables()
        self._jitted = {}
        # in-process guard for the aot_cache_token closure contract
        # (_check_closure_token); maps token -> pinned (denormer, builder)
        self._aot_token_pin = {}

    def _check_closure_token(self, denormer, denorm_builder) -> None:
        """Enforce the with_aot_cache contract in-process: a non-empty
        `aot_cache_token` asserts the denormer/denorm_builder closure is
        DETERMINED by the token. Two different closures under one token
        would map to the same on-disk executable — the second would
        silently run the first's baked numerics. Cross-process reuse of a
        token with a different closure is undetectable (closures don't
        hash); in-process we pin the first closure seen per token and
        refuse a different one."""
        pin = self._aot_token_pin.get(self.aot_cache_token)
        cur = (denormer, denorm_builder)
        if pin is None:
            self._aot_token_pin[self.aot_cache_token] = cur
        elif pin[0] is not cur[0] or pin[1] is not cur[1]:
            raise ValueError(
                "aot_cache_token %r was already used with a different "
                "denormer/denorm_builder closure in this process; the "
                "executable cache would silently serve the first "
                "closure's baked program. Use a distinct token per "
                "closure (see with_aot_cache)." % (self.aot_cache_token,))

    def with_aot_cache(self, cache_dir: str, token: str = "") -> "GuidedLatentDiffusionPipeline":
        """Persist/reuse compiled serving executables under `cache_dir`
        (serving/aot.py::ExecutableCache). On this environment's
        remote-compile relay a cold flagship compile is 15-30 min; a warm
        restart with the cache is a file load. Programs that capture a
        `denormer`/`denorm_builder` closure are cached only when `token`
        is non-empty (the caller asserts the closure is determined by the
        token — e.g. D3RoMa's config-built denormalizer)."""
        return dataclasses.replace(
            self, aot_cache_dir=cache_dir, aot_cache_token=token)

    def _aot_fingerprint(self, sig_stable) -> str:
        import hashlib

        parts = [repr(self.unet), repr(self.vae), repr(self.spec),
                 repr(self.guidance), repr(self.normalizer),
                 json.dumps(self.act_scales or {}, sort_keys=True),
                 str(self.cache_interval), str(self.cache_schedule),
                 self.aot_cache_token, repr(sig_stable)]
        return "ldm_" + hashlib.sha256(
            "|".join(parts).encode()).hexdigest()[:24]

    def replace_sampler(self, spec: SamplerSpec) -> "GuidedLatentDiffusionPipeline":
        return dataclasses.replace(self, spec=spec)

    def half_precision(self) -> "GuidedLatentDiffusionPipeline":
        """Inference-only bf16 params (see GuidedDiffusionPipeline.half_precision)."""
        import dataclasses as _dc

        unet = _dc.replace(self.unet, dtype=jnp.bfloat16) if self.unet.dtype != jnp.bfloat16 else self.unet
        vae = _dc.replace(self.vae, dtype=jnp.bfloat16) if self.vae.dtype != jnp.bfloat16 else self.vae
        return _dc.replace(
            self, unet=unet, unet_params=_cast_tree_bf16(self.unet_params),
            vae=vae, vae_params=_cast_tree_bf16(self.vae_params),
        )

    def quantize_int8(self) -> "GuidedLatentDiffusionPipeline":
        """Inference-only int8 MXU path for UNet + VAE (see
        GuidedDiffusionPipeline.quantize_int8)."""
        import dataclasses as _dc

        return _dc.replace(
            self, unet=_dc.replace(self.unet, quant=True),
            vae=_dc.replace(self.vae, quant=True),
        )

    def fuse_norms(self) -> "GuidedLatentDiffusionPipeline":
        """Single-pass Pallas GroupNorm+SiLU on TPU for UNet + VAE."""
        import dataclasses as _dc

        return _dc.replace(
            self, unet=_dc.replace(self.unet, fused_norm=True),
            vae=_dc.replace(self.vae, fused_norm=True),
        )

    def deepcache(self, interval=2,
                  depth: Optional[int] = None) -> "GuidedLatentDiffusionPipeline":
        """Enable DeepCache deep-feature reuse (Ma et al., CVPR 2024; no
        reference analog — a TPU-side inference accelerator): each group
        of `interval` denoise steps runs ONE full UNet pass (also emitting
        the deep trunk feature) and `interval-1` shallow passes that splice
        the cached trunk in (~34% of the full step's FLOPs at the flagship
        shape). An approximation — gate on end metrics before deploying
        (tests/test_deepcache.py + the on-chip accuracy sweep in
        docs/PERFORMANCE.md). heun is unsupported (its second model
        evaluation has no cached analog).

        `interval` may instead be an F/S pattern STRING (e.g.
        "FSFSFSFSFF") selecting a NON-UNIFORM schedule — full steps where
        drift accrues fastest (sampling.parse_cache_schedule). `depth`
        (default: keep the unet's current cache_depth) selects the
        shallow pass's depth: 1 = classic shallowest split, 2 = medium
        split that also refreshes down block 1 + up block 2 (~2/3 of step
        FLOPs, lower drift). Calibrated static-int8 scale tables are
        schedule- and depth-specific — re-run calibrate() after changing
        either."""
        if depth is not None:
            import dataclasses as _dc

            self = dataclasses.replace(
                self, unet=_dc.replace(self.unet, cache_depth=int(depth)))
        if isinstance(interval, str):
            s = interval.strip().upper()
            if not s or set(s) - {"F", "S"} or s[0] != "F":
                raise ValueError(
                    f"cache schedule must be a nonempty F/S string "
                    f"starting with F, got {interval!r}")
            if "S" in s and self.spec.kind == "heun":
                raise ValueError(
                    "deepcache does not support the heun sampler")
            # the length-vs-num_inference_steps check happens at call time
            # (parse_cache_schedule), where the step count is known
            return dataclasses.replace(self, cache_schedule=s,
                                       cache_interval=1)
        interval = int(interval)
        if interval < 1:
            raise ValueError(f"cache_interval must be >= 1, got {interval}")
        if interval > 1 and self.spec.kind == "heun":
            raise ValueError("deepcache does not support the heun sampler")
        return dataclasses.replace(self, cache_interval=interval,
                                   cache_schedule=None)

    def _unet_cache_fns(self, unet_params):
        """(trunk_apply, cached_apply) for the DeepCache sampling path —
        (None, None) when cache_interval == 1. Each static-int8 pass shape
        replays its OWN calibrated scale table ("unet" for the full/trunk
        pass — identical call order to the plain pass — and "unet_cached"
        for the shallow pass, whose call-site subsequence differs)."""
        if not self.cache_active:
            return None, None
        static_modes = ("static", "mxu", "halo", "wino_static")
        if (self.act_scales and self.act_scales.get("unet")
                and self.unet.quant in static_modes
                and not self.act_scales.get("unet_cached")):
            raise ValueError(
                "deepcache with calibrated static int8 needs the "
                "'unet_cached' scale table — re-run calibrate() (it "
                "captures both passes); replaying the full-pass table "
                "against the shallow pass's different call order would "
                "silently misassign every per-layer scale")

        def trunk_apply(model_input, t, ctx):
            return self.unet.apply({"params": unet_params}, model_input,
                                   t, ctx, return_trunk=True)

        def cached_apply(model_input, t, ctx, trunk):
            return self.unet.apply({"params": unet_params}, model_input,
                                   t, ctx, cached_trunk=trunk)

        return (self._replayed(trunk_apply, "unet"),
                self._replayed(cached_apply, "unet_cached"))

    @property
    def cache_active(self) -> bool:
        """True when any denoise step runs the shallow cached pass."""
        return self.cache_interval > 1 or bool(
            self.cache_schedule and "S" in self.cache_schedule.upper())

    def fast_inference(self, mode: str = "throughput") -> "GuidedLatentDiffusionPipeline":
        """Apply the measured-best TPU inference configuration
        (docs/PERFORMANCE.md): bf16 params, whole-row Pallas
        self-attention (N>=512 sites), fused GEGLU feed-forward, and —
        in "throughput" mode — the static-scale int8 MXU path for
        UNet+VAE (15.39 fps at the release setting). "latency"
        (batch-1/streaming) skips int8, which is latency-bound there
        (static int8 measured 242 ms/frame at batch 1 vs bf16's 106).
        "dense" = latency kernels + dynamic int8 on the dense
        projections only (118 ms at batch 1) — the fastest batch-1
        config that COMPILES when the relay rejects the bf16 program
        (streaming/probe.py auto-selects).
        "wino" routes stride-1 3x3 convs through Winograd F(2x2,3x3)
        (fused Pallas kernel where pick_config admits the shape, static
        int8 elsewhere — ops/winograd.py); measured SLOWER end-to-end
        (12.30 fps) and kept opt-in (docs/PERFORMANCE.md). "off"
        returns self unchanged."""
        import dataclasses as _dc

        if mode in ("off", "", None):
            return self
        if mode not in ("throughput", "latency", "dense", "wino"):
            raise ValueError(f"unknown fast_inference mode {mode!r}")
        quant = {"throughput": "static", "wino": "wino_static",
                 "latency": False, "dense": "dense"}[mode]
        pipe = self.half_precision()
        # remat is a training lever (FLOPs-for-HBM); at inference it only
        # recomputes, and the calibration capture's scale side channel
        # cannot escape an nn.remat trace (UnexpectedTracerError when a
        # train-config UNet reaches calibrate())
        return _dc.replace(
            pipe,
            unet=_dc.replace(pipe.unet, use_flash_attention="pallas-self",
                             fused_ff=True, quant=quant, remat=False),
            vae=_dc.replace(pipe.vae, quant=quant),
        )

    def calibrate(
        self,
        key: jax.Array,
        batches,
        cond_channels: str = "rgb+raw",
        num_inference_steps: int = 10,
        margin: float = 1.25,
        quantiles=None,
    ) -> "GuidedLatentDiffusionPipeline":
        """Post-training calibration of the static int8 activation scales.

        Capture passes record absmax(activation)/127 at every
        static-quantized call site (in call order — ops/quant.py), maxed
        over `batches`, with the UNet driven along the ACTUAL
        `num_inference_steps`-step denoising trajectory (unquantized
        forward) so the captured statistics cover every step's input
        distribution. `margin` widens the scales against activation-tail
        drift between calibration and deployment data (standard PTQ
        practice). Returns a pipeline whose static int8 path replays the
        calibrated per-layer scales as compile-time constants — same
        runtime cost as the global-scale path, per-layer accuracy.

        `batches` is a list of dicts with the __call__ condition arrays
        (rgb_images/left_images/right_images/sim_disp as appropriate).

        `quantiles` (e.g. (0.9995, 0.999, 0.995)): additionally record
        those |activation| quantiles per call site alongside the absmax.
        The flat replay tables stay absmax-based (identical to the
        default); the raw per-call [absmax, q...] vectors are kept under
        "<table>@q" keys so `with_act_clipping` can re-derive
        percentile-clipped tables WITHOUT re-running the capture
        (percentile clipping trades tail clipping for finer rounding —
        a standard PTQ lever against absmax outlier inflation).
        """
        import dataclasses as _dc

        from d3roma_tpu.ops.quant import capture_act_scales
        from d3roma_tpu.ops.scheduler_step import ddim_step
        from d3roma_tpu.ops.schedules import set_timesteps

        pipe = self
        if pipe.unet.quant not in ("static", "mxu", "halo", "wino_static"):
            pipe = _dc.replace(
                pipe, unet=_dc.replace(pipe.unet, quant="static"),
                vae=_dc.replace(pipe.vae, quant="static"),
            )
        def make_capture(apply_fn):
            # params enter as a traced argument, NOT a closure: a captured
            # param tree is baked into the lowered module as constants
            # (1.7-3.5 GB), and on a remote-compile attachment that whole
            # blob ships with the compile request — large enough to take
            # the compile relay down (observed: scan-cell 3.46 GB capture
            # -> relay connection-refused for every later program).
            def fn(params, *args):
                taps = []  # fresh per trace: retraces cannot leak tracers
                with capture_act_scales(taps, quantiles=quantiles):
                    out = apply_fn(params, *args)
                width = 1 + len(quantiles or ())
                empty = ((0,) if width == 1 else (0, width))
                stacked = (jnp.stack(taps) if taps
                           else jnp.zeros(empty, jnp.float32))
                return out, stacked
            return jax.jit(fn)

        # The encode MUST be captured through latent_encode_conds — ONE
        # stacked call over all conditions, exactly as __call__ builds it.
        # Capturing per-condition (batch B) while deployment encodes the
        # 2-4xB stack diverges the wino_static routing: _wino_eligible's
        # liveness cap is batch-dependent, so a conv that fits at B can
        # fall back to static int8 (consuming a scale) at 2B — replay
        # then runs out of scales mid-program (observed on-chip at the
        # 180x320/C=128 VAE sites, batch 16 vs 32).
        enc_all_fn = make_capture(
            lambda p, rgb, left, right, raw: latent_encode_conds(
                lambda x: encode_image_to_latent(pipe._vae_apply(p), x),
                cond_channels, rgb=rgb, left=left, right=right,
                sim_disp=raw))
        dec_fn = make_capture(
            lambda p, z: decode_latent(pipe._vae_apply(p), z))

        def _ctx_for(model_input):
            # broadcast the (1, T, D) embed (T=2: [BOS, EOS]) to the
            # calibration batch, as the sampling loop does
            # (sampling.py::denoise_scan)
            ctx = pipe.text_embed
            if ctx.shape[0] == 1 and model_input.shape[0] > 1:
                ctx = jnp.broadcast_to(
                    ctx, (model_input.shape[0],) + ctx.shape[1:])
            return ctx

        def unet_fwd(params, model_input, t):
            # return_trunk changes nothing about the call sequence (the
            # "unet" table stays valid for the plain pass); the trunk
            # feeds the cached-pass capture below
            return pipe.unet.apply({"params": params}, model_input, t,
                                   _ctx_for(model_input), return_trunk=True)

        def unet_cached_fwd(params, model_input, t, trunk):
            # the DeepCache shallow pass visits a different call-site
            # subsequence, so it gets its OWN scale table ("unet_cached");
            # same-step trunks are exact inputs, and absmax-over-steps
            # with `margin` covers the cross-step reuse drift
            return pipe.unet.apply({"params": params}, model_input, t,
                                   _ctx_for(model_input),
                                   cached_trunk=trunk)

        unet_fn = make_capture(unet_fwd)
        unet_cached_fn = make_capture(unet_cached_fwd)

        tabs = {"unet": None, "unet_cached": None, "vae_encode": None,
                "vae_decode": None}

        def acc(name, arr):
            arr = np.asarray(arr, np.float32)
            tabs[name] = arr if tabs[name] is None else np.maximum(tabs[name], arr)

        cfg = pipe.spec.schedule
        ts = set_timesteps(cfg, num_inference_steps)
        step_ratio = cfg.num_train_timesteps // num_inference_steps

        @jax.jit
        def _step(out, t, prev_t, x):
            # jitted: on a remote-attached device each eager op would cost
            # a dispatch round trip (docs/PERFORMANCE.md)
            s = ddim_step(pipe._tables, cfg, out, t, prev_t, x)
            return s.prev_sample, s.pred_original_sample

        for bi, b in enumerate(batches):
            rgb = b.get("rgb_images")
            left = b.get("left_images")
            right = b.get("right_images")
            raw = b.get("sim_disp")
            as_f32 = lambda a: None if a is None else a.astype(jnp.float32)
            (conds, lat_parts), s = enc_all_fn(
                pipe.vae_params, as_f32(rgb), as_f32(left), as_f32(right),
                as_f32(raw))
            acc("vae_encode", s)
            bkey = jax.random.fold_in(key, bi)
            # the real trajectory: start from pure noise, step with the
            # pipeline's own sampler math (unquantized model forward).
            # With cache_interval > 1 the capture follows the DEPLOYED
            # DeepCache schedule — shallow steps see the STALE reused
            # trunk, whose activation statistics exceed the same-step
            # trunk's (calibrating on exact trunks under-scales the
            # shallow pass and clips at deployment: measured +0.88%
            # AbsRel caching drift under int8 vs +0.50% under bf16 at
            # k=2 before this). cache_interval == 1 captures both
            # tables per step with the exact trunk (the conservative
            # generic fallback for pipes cached after calibration).
            x = jax.random.normal(bkey, conds.shape[:-1] + (4,))
            x0 = x
            # The deployed full/shallow step pattern (uniform interval or
            # an explicit cache_schedule). When it contains NO shallow
            # step (k == 1, or k > len(ts) so no group ever completes) no
            # "unet_cached" statistics would be captured, yet
            # _unet_cache_fns requires the table — fall back to the dual
            # capture, recording the shallow pass per step with exact
            # same-step trunks (conservative: no stale trunk exists).
            from d3roma_tpu.pipelines.sampling import (
                parse_cache_schedule,
                uniform_cache_schedule,
            )

            if pipe.cache_schedule is not None:
                parse_cache_schedule(pipe.cache_schedule, len(ts))
                pattern = pipe.cache_schedule.upper()
            else:
                pattern = uniform_cache_schedule(
                    max(1, int(pipe.cache_interval)), len(ts))
            dual_capture = "S" not in pattern
            trunk = None
            for i, t in enumerate(ts):
                tt = jnp.full((x.shape[0],), int(t), jnp.int32)
                model_input = jnp.concatenate([x, conds], axis=-1)
                if pattern[i] == "S":
                    # deployed shallow step: stale trunk from the group's
                    # full step; its output drives the trajectory
                    out, s = unet_cached_fn(pipe.unet_params, model_input,
                                            tt, trunk)
                    acc("unet_cached", s)
                else:
                    (out, trunk), s = unet_fn(pipe.unet_params,
                                              model_input, tt)
                    acc("unet", s)
                    if dual_capture:
                        _, s = unet_cached_fn(pipe.unet_params,
                                              model_input, tt, trunk)
                        acc("unet_cached", s)
                x, x0 = _step(out, jnp.int32(int(t)),
                              jnp.int32(int(t) - step_ratio), x)
            _, s = dec_fn(pipe.vae_params, x0)
            acc("vae_decode", s)
            if "raw" in lat_parts:  # intermediates also decode cond-scaled z
                _, s = dec_fn(pipe.vae_params, lat_parts["raw"])
                acc("vae_decode", s)

        act_scales = {}
        for k, tab in tabs.items():
            if tab is None or not tab.size:
                continue
            if quantiles:
                # column 0 = absmax; keep the raw per-call vectors for
                # with_act_clipping re-selection without recapture
                act_scales[k] = [float(max(v * margin, 1e-8))
                                 for v in tab[:, 0]]
                act_scales[k + "@q"] = [[float(x) for x in row]
                                        for row in tab]
            else:
                act_scales[k] = [float(max(v * margin, 1e-8)) for v in tab]
        if quantiles:
            act_scales["@quantiles"] = [float(q) for q in quantiles]
        return _dc.replace(pipe, act_scales=act_scales)

    def quant_call_map(self, batch: int = 16, height: int = 360,
                       width: int = 640) -> dict:
        """The static-int8 call-order map — `{"unet": [(kind, shape),
        ...], "unet_cached": [...]}` with kind in {"dot","conv","attn",
        "geglu"} — i.e. which layer each replay-table index belongs to.

        Derived from an ABSTRACT capture trace (`jax.eval_shape` with a
        shape log, ops/quant.py::capture_act_scales) — no device
        compute, no weight reads — so the map always reflects THIS
        pipe's deployed gate configuration (quant mode, fused-kernel
        gates, deepcache depth, tp_mesh). `batch`/`height`/`width` must
        match the DEPLOYMENT shapes: the fused-kernel and wino gates
        are shape-dependent, and a gate flip changes the call order
        (same contract as calibrate()).

        NOTE the classic PTQ "sensitive layers" — conv_in, conv_out and
        the time-embedding MLP — are architecturally EXCLUDED from
        quantization in this design (models/unet2d_condition.py:
        conv_in/TimestepEmbedding plain bf16, conv_out pinned fp32), so
        they never appear here; the int8 drift budget lives entirely in
        the interior resnet/attention/FF calls this map indexes. Use
        `kind_pins` to bf16-pin a whole kind for per-layer-class drift
        ablation (VERDICT r4 #2)."""
        import dataclasses as _dc

        from d3roma_tpu.ops.quant import capture_act_scales

        pipe = self
        if pipe.unet.quant not in ("static", "mxu", "halo", "wino_static"):
            # same normalization as calibrate(): the trace must see the
            # static-int8 injected ops or no call is recorded at all
            pipe = _dc.replace(
                pipe, unet=_dc.replace(pipe.unet, quant="static"))
        unet = pipe.unet

        h, w = height // 8, width // 8
        c_in = int(unet.in_channels)
        x = jax.ShapeDtypeStruct((batch, h, w, c_in), jnp.bfloat16)
        t = jax.ShapeDtypeStruct((batch,), jnp.int32)
        ctx = jax.ShapeDtypeStruct(
            (batch,) + tuple(pipe.text_embed.shape[1:]), jnp.bfloat16)
        params = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
            pipe.unet_params)

        def _trace(fn, *args):
            log = []
            with capture_act_scales([], shape_log=log):
                out = jax.eval_shape(fn, *args)
            return log, out

        full_log, (_, trunk) = _trace(
            lambda p, xx, tt, cc: unet.apply(
                {"params": p}, xx, tt, cc, return_trunk=True),
            params, x, t, ctx)
        cached_log, _ = _trace(
            lambda p, xx, tt, cc, tr: unet.apply(
                {"params": p}, xx, tt, cc, cached_trunk=tr),
            params, x, t, ctx, trunk)
        return {"unet": full_log, "unet_cached": cached_log}

    def kind_pins(self, kinds, batch: int = 16, height: int = 360,
                  width: int = 640) -> dict:
        """Pin dict (`with_act_clipping(pins=...)` form) selecting every
        unet/unet_cached call whose kind is in `kinds` — one-command
        per-layer-class bf16 ablation of the int8 drift budget, e.g.
        `pipe.with_act_clipping(pins=pipe.kind_pins(("attn",)))` runs
        the self-attention stack unquantized while everything else keeps
        its calibrated int8 scales. Kinds: "dot" (dense/proj matmuls),
        "conv" (resnet/up/downsample convs), "attn" (whole-row fused
        attention), "geglu" (fused feed-forward)."""
        kinds = frozenset(kinds)
        cmap = self.quant_call_map(batch=batch, height=height, width=width)
        return {tab: [i for i, (kind, _) in enumerate(log) if kind in kinds]
                for tab, log in cmap.items()}

    def with_act_clipping(self, percentile=None, margin: float = 1.25,
                          pins=None) -> "GuidedLatentDiffusionPipeline":
        """Re-derive the flat static-int8 replay tables from a
        quantile-recording calibration (calibrate(quantiles=...)) —
        no recapture needed.

        percentile: one of the captured quantiles (e.g. 0.999) to clip
        activation scales at, or None for absmax (the default strategy).
        margin: scale widening, as in calibrate().
        pins: {table_name: [call indices]} to run UNQUANTIZED (bf16) at
        replay — for pinning measured drift-sensitive layers; indices
        refer to the static-quant call order of that table.
        """
        import dataclasses as _dc

        assert self.act_scales, "calibrate() first"
        new = {k: v for k, v in self.act_scales.items()
               if not k.endswith("@pins")}
        has_q = any(k.endswith("@q") for k in new)
        if percentile is not None:
            qlist = list(self.act_scales.get("@quantiles") or ())
            if float(percentile) not in [float(q) for q in qlist]:
                raise ValueError(
                    f"percentile {percentile} not captured; available: "
                    f"{qlist} (re-run calibrate(quantiles=...))")
            col = 1 + [float(q) for q in qlist].index(float(percentile))
            for k in list(new):
                if k.endswith("@q"):
                    new[k[:-2]] = [float(max(row[col] * margin, 1e-8))
                                   for row in new[k]]
        elif has_q and margin != 1.25:
            # margin-only re-derivation from the raw absmax column (a
            # margin ablation costs no recapture)
            for k in list(new):
                if k.endswith("@q"):
                    new[k[:-2]] = [float(max(row[0] * margin, 1e-8))
                                   for row in new[k]]
        for name, idx in (pins or {}).items():
            if new.get(name):
                new[name + "@pins"] = sorted(int(i) for i in idx)
        return _dc.replace(self, act_scales=new)

    # vae helpers bound to params
    def _vae_apply(self, params):
        def apply(x, method):
            return self.vae.apply({"params": params}, x, method=method)
        return apply

    def _replayed(self, fn, table_name):
        """Wrap an apply fn so its static int8 ops consume the calibrated
        per-call scales at trace time (no-op without a table)."""
        scales = (self.act_scales or {}).get(table_name)
        if not scales:
            return fn
        pins = (self.act_scales or {}).get(table_name + "@pins") or ()
        from d3roma_tpu.ops.quant import replay_act_scales

        def wrapped(*args):
            with replay_act_scales(scales, pins=pins):
                return fn(*args)
        return wrapped

    def _cached_jit(self, jit_fn, token, enabled: bool = True):
        """Route a jitted program through the executable cache
        (serving/aot.py) lazily — the concrete args (whose shapes key the
        cache entry) only exist at first call. One loaded/compiled
        executable is memoized per argument-shape fingerprint (the
        scan_chunk tail chunk can be shorter than the body chunks)."""
        if not (self.aot_cache_dir and enabled):
            return jit_fn
        from d3roma_tpu.serving.aot import ExecutableCache, _tree_fingerprint

        cache = ExecutableCache(self.aot_cache_dir)
        fingerprint = self._aot_fingerprint(token)
        box = {}
        # Per-arg key memo: hashing the full 866M-param tree on EVERY
        # dispatch (20+ calls/frame on the split/chunked streaming path)
        # is pure host overhead — param trees are stable objects on the
        # pipeline, so fingerprint them once per identity. The memo keeps
        # a strong ref to the keyed object, so a recycled id() can never
        # alias a live entry.
        fp_memo = {}

        def _arg_key(a):
            if a is None or isinstance(a, (bool, int, float, str)):
                return a
            if hasattr(a, "shape"):  # array leaf: O(1)
                return (tuple(a.shape), str(jnp.result_type(a)))
            hit = fp_memo.get(id(a))
            if hit is not None and hit[0] is a:
                return hit[1]
            fp = _tree_fingerprint(a)
            fp_memo[id(a)] = (a, fp)
            return fp

        def wrapper(*args):
            k = tuple(_arg_key(a) for a in args)
            if k not in box:
                box[k] = cache.get_or_compile(fingerprint, jit_fn, args)
            return box[k](*args)
        return wrapper

    def serving_fn(self, num_inference_steps: int,
                   num_intermediate_images: int, cond_channels: str,
                   add_noise_rgb: bool = False, denormer=None,
                   denorm_builder=None):
        """The EXACT (unjitted) monolithic program `__call__` runs, as a
        pure function
        `fn(unet_params, vae_params, text_embed, key, rgb, left, right,
            raw, raw_depth, mask) -> PipelineOutput`.
        Exposed so the AOT serving exporter (serving/aot.py) serializes the
        same program deployment executes (incl. calibrated int8 scale
        replay and guidance when a denormer/builder is supplied)."""
        def fn(unet_params, vae_params, text_embed, key,
               rgb, left, right, raw, raw_depth, mask):
            vapply = self._vae_apply(vae_params)

            def unet_apply(model_input, t, ctx):
                return self.unet.apply({"params": unet_params},
                                       model_input, t, ctx)

            dn = denormer
            if denorm_builder is not None:
                dn = lambda x: denorm_builder(x, raw_depth, mask)
            trunk_apply, cached_apply = self._unet_cache_fns(unet_params)
            return latent_pipeline(
                self._replayed(unet_apply, "unet"),
                vae_encode=self._replayed(
                    lambda x: encode_image_to_latent(vapply, x),
                    "vae_encode"),
                vae_decode=self._replayed(
                    lambda z: decode_latent(vapply, z), "vae_decode"),
                text_embed=text_embed,
                spec=self.spec, tables=self._tables, key=key,
                num_inference_steps=num_inference_steps,
                num_intermediate_images=num_intermediate_images,
                cond_channels=cond_channels,
                rgb=rgb, left=left, right=right, sim_disp=raw,
                raw_depth=raw_depth,
                guidance=self.guidance if raw_depth is not None else None,
                denormer=dn, add_noise_rgb=add_noise_rgb,
                cache_interval=self.cache_interval,
                unet_apply_trunk=trunk_apply,
                unet_apply_cached=cached_apply,
                cache_schedule=self.cache_schedule,
            )
        return fn

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
        split_programs: bool = False,
        scan_chunk: Optional[int] = None,
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
               add_noise_rgb, split_programs, scan_chunk,
               id(denormer) if denormer is not None else None,
               id(denorm_builder) if denorm_builder is not None else None,
               # dtype is part of the key: the split path bakes the noise
               # dtype into its closure, so a dtype change must re-build
               tuple((x.shape, str(x.dtype))
                     for x in (rgb_images, left_images, right_images,
                               sim_disp, raw_depth, denorm_mask)
                     if x is not None))
        if split_programs or scan_chunk:
            return self._call_split(
                sig, key, num_inference_steps, num_intermediate_images,
                cond_channels, rgb_images, left_images, right_images,
                sim_disp, raw_depth, denormer, denorm_builder, denorm_mask,
                add_noise_rgb, scan_chunk)
        args = (self.unet_params, self.vae_params, self.text_embed, key,
                rgb_images, left_images, right_images, sim_disp, raw_depth,
                denorm_mask)
        if sig not in self._jitted:
            jit_fn = jax.jit(self.serving_fn(
                num_inference_steps, num_intermediate_images,
                cond_channels, add_noise_rgb,
                denormer=denormer, denorm_builder=denorm_builder))
            has_closure = denormer is not None or denorm_builder is not None
            if self.aot_cache_dir and (not has_closure
                                       or self.aot_cache_token):
                if has_closure:
                    self._check_closure_token(denormer, denorm_builder)
                # sig contains closure ids (process-local); the cache key
                # uses the stable part + the caller's token instead
                sig_stable = sig[:6] + sig[8:] + (has_closure,)
                from d3roma_tpu.serving.aot import ExecutableCache

                jit_fn = ExecutableCache(self.aot_cache_dir).get_or_compile(
                    self._aot_fingerprint(sig_stable), jit_fn, args)
            self._jitted[sig] = (jit_fn, (denormer, denorm_builder))
        return self._jitted[sig][0](*args)

    def _call_split(self, sig, key, num_inference_steps,
                    num_intermediate_images, cond_channels, rgb_images,
                    left_images, right_images, sim_disp, raw_depth,
                    denormer, denorm_builder, denorm_mask, add_noise_rgb,
                    scan_chunk=None):
        """Same math as the monolithic program, as THREE jitted programs
        (VAE encode / denoise scan / VAE decode). For latency/streaming
        deployments: each program is a fraction of the monolithic one's
        size (the remote compile helper has been observed to fail on the
        full batch-1 program), and the three dispatches pipeline through
        the device queue, so steady-state cost is unchanged. Bit-identical
        to the monolithic path (tests/test_pipelines.py).

        With `scan_chunk=c`, the denoise scan itself additionally runs as
        ceil(S/c) calls of ONE compiled c-step program (the timestep slice
        enters as a traced argument, so equal-length chunks share the
        compilation); the carry (x, PRNG key) threads between calls, so
        the step/key sequence — and the result — is identical."""
        ref = next(x for x in (rgb_images, left_images, right_images,
                               sim_disp) if x is not None)
        noise_dtype = ref.dtype
        if scan_chunk and self.cache_schedule is not None:
            # each equal-length chunk shares ONE compiled program; a
            # non-uniform pattern would need a different step pattern per
            # chunk (a different program each), defeating the mode's
            # purpose. Use split_programs without scan_chunk instead.
            raise ValueError(
                "scan_chunk is not supported with a non-uniform "
                "cache_schedule; use split_programs=True without "
                "scan_chunk, or a uniform deepcache(interval)")
        if scan_chunk and self.cache_interval > 1 \
                and scan_chunk % self.cache_interval != 0:
            # each non-tail chunk restarts the group pattern (a full pass
            # first), so chunk length must be a whole number of groups for
            # the step pattern to match the monolithic program's
            raise ValueError(
                f"scan_chunk={scan_chunk} must be a multiple of "
                f"cache_interval={self.cache_interval}")

        if sig not in self._jitted:
            def enc_fn(vae_params, rgb, left, right, raw):
                vapply = self._vae_apply(vae_params)
                return latent_encode_conds(
                    self._replayed(
                        lambda x: encode_image_to_latent(vapply, x),
                        "vae_encode"),
                    cond_channels, rgb=rgb, left=left, right=right,
                    sim_disp=raw)

            def scan_fn(unet_params, vae_params, text_embed, key, conds,
                        lat, raw_depth, mask):
                def unet_apply(model_input, t, ctx):
                    return self.unet.apply({"params": unet_params},
                                           model_input, t, ctx)

                trunk_apply, cached_apply = self._unet_cache_fns(unet_params)
                return latent_denoise(
                    self._replayed(unet_apply, "unet"), text_embed,
                    self.spec, self._tables, key, num_inference_steps,
                    num_intermediate_images, conds, lat, cond_channels,
                    guidance_fn=_guidance_fn(vae_params, raw_depth, mask),
                    add_noise_rgb=add_noise_rgb, noise_dtype=noise_dtype,
                    cache_interval=self.cache_interval,
                    unet_apply_trunk=trunk_apply,
                    unet_apply_cached=cached_apply,
                    cache_schedule=self.cache_schedule)

            def dec_fn(vae_params, kept):
                vapply = self._vae_apply(vae_params)
                return latent_decode_images(
                    self._replayed(
                        lambda z: decode_latent(vapply, z), "vae_decode"),
                    kept)

            def _guidance_fn(vae_params, raw_depth, mask):
                if (raw_depth is None or self.guidance is None
                        or not self.guidance.enabled):
                    return None
                assert self.spec.is_ode
                vapply = self._vae_apply(vae_params)
                dn = denormer
                if denorm_builder is not None:
                    dn = lambda x: denorm_builder(x, raw_depth, mask)
                assert dn is not None
                return self.guidance.make_latent_guidance_fn(
                    self._replayed(
                        lambda z: decode_latent(vapply, z), "vae_decode"),
                    dn, raw_depth)

            def init_fn(key, conds):
                # exactly latent_denoise's noise init (bit-parity)
                key, k_init = jax.random.split(key)
                x_init = jax.random.normal(
                    k_init, conds.shape[:-1] + (4,), noise_dtype)
                return x_init, key

            def chunk_fn(unet_params, vae_params, text_embed, key, x,
                         conds, lat, ts, prev_ts, raw_depth, mask):
                from d3roma_tpu.pipelines.sampling import run_sampler_steps

                B = conds.shape[0]
                if text_embed.shape[0] == 1 and B > 1:
                    text_embed = jnp.broadcast_to(
                        text_embed, (B,) + text_embed.shape[1:])

                def unet_apply(model_input, t, ctx):
                    return self.unet.apply({"params": unet_params},
                                           model_input, t, ctx)

                model_fn = self._replayed(
                    lambda mi, t: unet_apply(mi, t, text_embed), "unet")
                noise_rgb_cfg = None
                if add_noise_rgb and "rgb" in lat and "rgb" in cond_channels:
                    noise_rgb_cfg = {"rgb": lat["rgb"],
                                     "slice": (0, lat["rgb"].shape[-1])}
                mf_trunk = mf_cached = None
                if self.cache_active:
                    t_apply, c_apply = self._unet_cache_fns(unet_params)
                    mf_trunk = lambda mi, t: t_apply(mi, t, text_embed)
                    mf_cached = (lambda mi, t, trunk:
                                 c_apply(mi, t, text_embed, trunk))
                return run_sampler_steps(
                    model_fn, self.spec, self._tables, x, conds, key,
                    ts, prev_ts, _guidance_fn(vae_params, raw_depth, mask),
                    noise_rgb_cfg, cache_interval=self.cache_interval,
                    model_fn_trunk=mf_trunk, model_fn_cached=mf_cached)

            # executable-cache the split programs too: the split path IS
            # the latency/streaming deployment (the monolithic batch-1
            # program is the one the remote compile helper rejects), so
            # restart caching matters most here. Same closure policy as
            # the monolithic path: programs that bake a denormer/builder
            # need an explicit aot_cache_token.
            has_closure = denormer is not None or denorm_builder is not None
            cacheable = not has_closure or bool(self.aot_cache_token)
            if has_closure and cacheable and self.aot_cache_dir:
                self._check_closure_token(denormer, denorm_builder)
            tok = sig[:6] + sig[8:] + (has_closure,)
            self._jitted[sig] = (
                (self._cached_jit(jax.jit(enc_fn), tok + ("enc",)),
                 self._cached_jit(jax.jit(scan_fn), tok + ("scan",),
                                  enabled=cacheable),
                 self._cached_jit(jax.jit(dec_fn), tok + ("dec",)),
                 jax.jit(init_fn),  # trivial program — not worth caching
                 self._cached_jit(jax.jit(chunk_fn), tok + ("chunk",),
                                  enabled=cacheable)),
                (denormer, denorm_builder))
        enc_j, scan_j, dec_j, init_j, chunk_j = self._jitted[sig][0]
        conds, lat = enc_j(self.vae_params, rgb_images, left_images,
                           right_images, sim_disp)
        if not scan_chunk:
            kept = scan_j(self.unet_params, self.vae_params,
                          self.text_embed, key, conds, lat, raw_depth,
                          denorm_mask)
        else:
            from d3roma_tpu.pipelines.sampling import (
                _kept_indices,
                _timestep_arrays,
            )

            ts, prev_ts = _timestep_arrays(self.spec.schedule,
                                           num_inference_steps)
            # host-side slicing: no per-chunk device dispatch for the tables
            ts, prev_ts = np.asarray(ts), np.asarray(prev_ts)
            x, key = init_j(key, conds)
            parts = []
            for s0 in range(0, num_inference_steps, scan_chunk):
                s1 = min(s0 + scan_chunk, num_inference_steps)
                x, key, x0_part = chunk_j(
                    self.unet_params, self.vae_params, self.text_embed,
                    key, x, conds, lat, ts[s0:s1], prev_ts[s0:s1],
                    raw_depth, denorm_mask)
                parts.append(x0_part)
            stack = jnp.concatenate(parts, axis=0)
            kept = stack[_kept_indices(num_inference_steps,
                                       num_intermediate_images)]
        return dec_j(self.vae_params, kept)

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
        if self.act_scales:
            # calibrated int8 activation scales travel with the export
            # (BASELINE release bench default uses them)
            with open(os.path.join(out_dir, "act_scales.json"), "w") as f:
                json.dump(self.act_scales, f)

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
        act_scales = None
        scales_path = os.path.join(out_dir, "act_scales.json")
        if os.path.exists(scales_path):
            with open(scales_path) as f:
                act_scales = json.load(f)
        return cls(
            unet=UNet2DCondition(**unet_cfg), unet_params=unet_params,
            vae=AutoencoderKL(**vae_cfg), vae_params=vae_params,
            text_embed=text_embed, spec=spec,
            guidance=FlowGuidance(**meta["guidance"]),
            normalizer=Normalizer(**norm), act_scales=act_scales,
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
