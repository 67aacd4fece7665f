"""Sampling pipelines: the whole T-step denoise as one jitted `lax.scan`.

TPU-native rebuild of the reference's GuidedDiffusionPipeline /
GuidedLatentDiffusionPipeline Python loops
(reference: core/custom_pipelines.py:90-213, 208-462). Differences by
design:

- The loop body (cond concat -> UNet -> scheduler step [-> guidance Adam])
  is a single scan over a static timestep table — one XLA program, no host
  round-trips.
- Condition latents are VAE-encoded exactly once before the loop (the
  reference re-encodes sim_disp every step in the rgb+raw branch,
  custom_pipelines.py:353-355 — same value each time).
- The final image is the decoded x_hat0 of the LAST step
  (custom_pipelines.py:414-415,454), not the final latent.
- Intermediates: x_hat0 at every step is stacked by the scan; callers
  subsample every T//num_intermediate_images (custom_pipelines.py:177-183).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from d3roma_tpu.guidance import FlowGuidance
from d3roma_tpu.ops.schedules import ScheduleConfig, ScheduleTables, add_noise, set_timesteps
from d3roma_tpu.ops.scheduler_step import ddim_step, ddpm_step, euler_step, heun_correct

#: sampler kinds run_sampler can execute (reference registers the same set at
#: config.py:12-19; its factory raises for euler/heun — here they are real).
SAMPLER_KINDS = ("ddpm", "my_ddpm", "ddim", "my_ddim", "euler", "heun")


class PipelineOutput(NamedTuple):
    """Final prediction + per-step x_hat0 intermediates
    (reference: core/custom_pipelines.py:63-88 returns five stacks; they are
    all the same decoded x_hat0 in the current reference code, so one stack
    is kept here)."""

    images: jnp.ndarray  # [B, H, W, C] final (decoded) x_hat0, clamped
    intermediates: jnp.ndarray  # [S, B, H, W, C] decoded x_hat0 per kept step


@dataclasses.dataclass(frozen=True)
class SamplerSpec:
    """Static sampler choice + schedule (reference: config.py:182-212)."""

    kind: str  # one of SAMPLER_KINDS
    schedule: ScheduleConfig
    eta: float = 0.0
    use_clipped_model_output: bool = False

    def __post_init__(self):
        if self.kind not in SAMPLER_KINDS:
            raise ValueError(
                f"unknown sampler kind {self.kind!r}; supported: {SAMPLER_KINDS}"
            )

    @property
    def is_ddim(self) -> bool:
        return "ddim" in self.kind

    @property
    def is_ode(self) -> bool:
        """Deterministic ODE samplers that support the in-step guidance hook."""
        return self.is_ddim or self.kind in ("euler", "heun")


def build_cond_concat(
    cond_channels: str,
    rgb: Optional[jnp.ndarray] = None,
    left: Optional[jnp.ndarray] = None,
    right: Optional[jnp.ndarray] = None,
    raw: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Channel-concat conditions per combo (reference:
    custom_pipelines.py:158-171, 353-367). Channel-last."""
    parts = {
        "rgb": [rgb],
        "rgb+raw": [rgb, raw],
        "left+right": [left, right],
        "left+right+raw": [left, right, raw],
        "rgb+left+right": [rgb, left, right],
        "rgb+left+right+raw": [rgb, left, right, raw],
    }
    if cond_channels not in parts:
        raise ValueError(f"Unknown cond_channels: {cond_channels}")
    chosen = parts[cond_channels]
    assert all(p is not None for p in chosen), f"missing conds for {cond_channels}"
    return jnp.concatenate(chosen, axis=-1)


def _timestep_arrays(schedule: ScheduleConfig, num_inference_steps: int):
    ts = set_timesteps(schedule, num_inference_steps)
    # The reference steppers derive the previous timestep as
    # t - T // num_inference_steps, NOT the next element of the spaced
    # sequence (scheduler_ddim.py:413, scheduler_ddpm.py:388-401). The two
    # agree for leading/trailing spacing but differ under linspace
    # (e.g. T=1000, S=10: 999 -> 899, not 888); implementation parity
    # requires the reference convention.
    prev = (ts.astype(np.int64)
            - schedule.num_train_timesteps // num_inference_steps)
    return jnp.asarray(ts), jnp.asarray(prev.astype(np.int32))


def _kept_indices(num_inference_steps: int, num_intermediate_images: int) -> np.ndarray:
    """Indices of the x_hat0 stack kept as intermediates: every
    T//num_intermediate_images steps (custom_pipelines.py:177-183), with the
    LAST step always forced into the set — the final image must be the last
    step's x_hat0 (custom_pipelines.py:414-415,454) even when the stride
    does not divide T evenly."""
    every = max(1, num_inference_steps // max(1, num_intermediate_images))
    idx = np.arange(every - 1, num_inference_steps, every)
    if len(idx) == 0 or idx[-1] != num_inference_steps - 1:
        idx = np.append(idx, num_inference_steps - 1)
    return idx


def run_sampler(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    spec: SamplerSpec,
    tables: ScheduleTables,
    x_init: jnp.ndarray,
    conds: jnp.ndarray,
    key: jax.Array,
    num_inference_steps: int,
    guidance_fn=None,
    noise_rgb_cfg: Optional[Dict] = None,
    cache_interval: int = 1,
    model_fn_trunk=None,
    model_fn_cached=None,
    cache_schedule: Optional[str] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Core scan. model_fn(model_input, t) -> model output (same shape as
    x_init). Returns (final prev_sample, per-step x_hat0 stack [T, ...]) —
    the pixel pipeline's output contract is the final prev_sample
    (custom_pipelines.py:173-205) while the latent one takes the last
    x_hat0 from the stack (custom_pipelines.py:414-415).

    noise_rgb_cfg, when given, is {"rgb": latent/image, "slice": (start,
    stop)} implementing the reference's add_noise_rgb option: the rgb slice
    of `conds` is blended 50/50 with its noised version at each t
    (custom_pipelines.py:343-350).

    cache_interval > 1 enables DeepCache-style deep-feature reuse (see
    run_sampler_steps); cache_schedule generalizes it to arbitrary
    full/shallow step patterns (see parse_cache_schedule).
    """
    ts, prev_ts = _timestep_arrays(spec.schedule, num_inference_steps)
    x_final, _, x0_stack = run_sampler_steps(
        model_fn, spec, tables, x_init, conds, key, ts, prev_ts,
        guidance_fn, noise_rgb_cfg, cache_interval=cache_interval,
        model_fn_trunk=model_fn_trunk, model_fn_cached=model_fn_cached,
        cache_schedule=cache_schedule,
    )
    return x_final, x0_stack


def _step_conds(conds, noise_rgb_cfg, tables, t, k_rgb):
    """Per-step conditions, with the add_noise_rgb 50/50 blend when
    configured (custom_pipelines.py:343-350)."""
    if noise_rgb_cfg is None:
        return conds
    rgb = noise_rgb_cfg["rgb"]
    s0, s1 = noise_rgb_cfg["slice"]
    noise = jax.random.normal(k_rgb, rgb.shape, rgb.dtype)
    noisy = add_noise(tables, rgb, noise, t)
    final_rgb = rgb * 0.5 + noisy * 0.5
    return jnp.concatenate([conds[..., :s0], final_rgb, conds[..., s1:]],
                           axis=-1)


def _scheduler_apply(spec, tables, model_output, t, prev_t, x, k_noise,
                     guidance_fn):
    """One scheduler update for the non-heun samplers (heun needs a second
    model evaluation and stays inline in the scan body)."""
    cfg = spec.schedule
    if spec.is_ddim:
        return ddim_step(
            tables, cfg, model_output, t, prev_t, x,
            eta=spec.eta,
            key=k_noise if spec.eta > 0 else None,
            use_clipped_model_output=spec.use_clipped_model_output,
            guidance_fn=guidance_fn,
        )
    if spec.kind == "euler":
        return euler_step(
            tables, cfg, model_output, t, prev_t, x, guidance_fn=guidance_fn,
        )
    if spec.kind in ("ddpm", "my_ddpm"):
        return ddpm_step(
            tables, cfg, model_output, t, prev_t, x,
            key=k_noise, guidance_fn=guidance_fn,
        )
    raise ValueError(f"unknown sampler kind {spec.kind!r}")


def parse_cache_schedule(schedule: str, num_steps: int) -> tuple:
    """Validate + canonicalize a DeepCache step pattern.

    `schedule` is a string over {F, S} (case-insensitive): F = full UNet
    pass (refreshes the cached trunk), S = shallow cached pass (reuses
    the trunk of the most recent F). It must start with F (an S with no
    trunk to reuse is meaningless) and match `num_steps` in length.
    Returns a tuple of segment lengths: each segment is one F plus its
    trailing S run — e.g. "FSFSFF" -> (2, 2, 1, 1). A uniform interval k
    over N steps is the pattern ("F"+"S"*(k-1)) * (N//k) + "F"*(N%k).
    """
    s = schedule.strip().upper()
    if not s or set(s) - {"F", "S"}:
        raise ValueError(
            f"cache_schedule must be a nonempty string over F/S, got "
            f"{schedule!r}")
    if s[0] != "F":
        raise ValueError(
            f"cache_schedule must start with F (a shallow step needs a "
            f"prior full step's trunk), got {schedule!r}")
    if len(s) != num_steps:
        raise ValueError(
            f"cache_schedule length {len(s)} != num_inference_steps "
            f"{num_steps}: {schedule!r}")
    segs = []
    for c in s:
        if c == "F":
            segs.append(1)
        else:
            segs[-1] += 1
    return tuple(segs)


def uniform_cache_schedule(interval: int, num_steps: int) -> str:
    """The pattern string equivalent of the uniform DeepCache interval."""
    k = max(1, int(interval))
    groups, rem = divmod(num_steps, k)
    return ("F" + "S" * (k - 1)) * groups + "F" * rem


def run_sampler_steps(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    spec: SamplerSpec,
    tables: ScheduleTables,
    x_init: jnp.ndarray,
    conds: jnp.ndarray,
    key: jax.Array,
    ts: jnp.ndarray,
    prev_ts: jnp.ndarray,
    guidance_fn=None,
    noise_rgb_cfg: Optional[Dict] = None,
    cache_interval: int = 1,
    model_fn_trunk=None,
    model_fn_cached=None,
    cache_schedule: Optional[str] = None,
) -> tuple[jnp.ndarray, jax.Array, jnp.ndarray]:
    """run_sampler over an explicit (ts, prev_ts) slice, returning the
    carry key too: `(x_final, key_final, x0_stack)`. The timestep arrays
    may be TRACED — one compiled program then serves every equal-length
    chunk of a denoise trajectory (the scan_chunk deployment mode, where
    very long single-program scans cannot compile through the remote
    relay).

    With ``cache_interval=k > 1`` (DeepCache, Ma et al. CVPR 2024): steps
    run in groups of k — the group's first step evaluates
    ``model_fn_trunk(input, t) -> (output, trunk)`` (the full model, also
    returning its deep trunk feature), the k-1 following steps evaluate
    ``model_fn_cached(input, t, trunk)`` (the shallow path splicing the
    cached trunk in). The scan runs over whole groups; a remainder of
    len(ts) % k steps is finished with full-model steps. The per-step RNG
    split pattern is identical to the uncached scan. heun is not
    supported (its second model evaluation has no cached analog).

    ``cache_schedule`` (a full/shallow pattern string, see
    parse_cache_schedule) generalizes the uniform interval to
    NON-UNIFORM schedules — e.g. "FSFSFSFSFF" concentrates full steps at
    the trajectory's end, where caching drift accrues fastest (measured:
    docs/deepcache_accuracy.json). It overrides cache_interval. Runs of
    equal-length segments share one compiled scan body, so program size
    stays bounded by the number of DISTINCT segment lengths, not the
    step count."""
    if cache_schedule is not None:
        segs = parse_cache_schedule(cache_schedule, int(ts.shape[0]))
        if any(n > 1 for n in segs):
            assert spec.kind != "heun", (
                "cache_schedule does not support heun")
            assert model_fn_trunk is not None and model_fn_cached is not None, (
                "cache_schedule needs model_fn_trunk and model_fn_cached")
            return _run_pattern_steps(
                model_fn, spec, tables, x_init, conds, key, ts, prev_ts,
                guidance_fn, noise_rgb_cfg, segs,
                model_fn_trunk, model_fn_cached)
        # all-F pattern == the plain scan
    elif cache_interval and cache_interval > 1:
        assert spec.kind != "heun", "cache_interval>1 does not support heun"
        assert model_fn_trunk is not None and model_fn_cached is not None, (
            "cache_interval>1 needs model_fn_trunk and model_fn_cached")
        return _run_cached_steps(
            model_fn, spec, tables, x_init, conds, key, ts, prev_ts,
            guidance_fn, noise_rgb_cfg, int(cache_interval),
            model_fn_trunk, model_fn_cached)

    cfg = spec.schedule

    def body(carry, step_in):
        x, k = carry
        t, prev_t = step_in
        k, k_noise, k_rgb = jax.random.split(k, 3)

        step_conds = _step_conds(conds, noise_rgb_cfg, tables, t, k_rgb)
        model_input = jnp.concatenate([x, step_conds], axis=-1)
        model_output = model_fn(model_input, t)

        if spec.kind == "heun":
            e = euler_step(
                tables, cfg, model_output, t, prev_t, x, guidance_fn=guidance_fn,
            )
            # second model evaluation at the Euler-predicted point
            model_input2 = jnp.concatenate([e.prev_sample, step_conds], axis=-1)
            model_output2 = model_fn(model_input2, jnp.maximum(prev_t, 0))
            out = heun_correct(
                tables, cfg, model_output, model_output2, t, prev_t, x,
                e.prev_sample, guidance_fn=guidance_fn,
            )
        else:
            out = _scheduler_apply(spec, tables, model_output, t, prev_t,
                                   x, k_noise, guidance_fn)
        # scheduler-table math runs in f32; cast back so the scan carry
        # keeps the caller's noise dtype (bf16 inputs otherwise fail the
        # scan's carry-type invariance on step 1)
        return ((out.prev_sample.astype(x_init.dtype), k),
                out.perturbed_original_sample)

    (x_final, key_final), x0_stack = jax.lax.scan(
        body, (x_init, key), (ts, prev_ts))
    return x_final, key_final, x0_stack


def _scan_cached_groups(spec, tables, conds, guidance_fn, noise_rgb_cfg,
                        carry, ts_run, prev_run, interval, n_groups,
                        x_dtype, model_fn_trunk, model_fn_cached):
    """One `lax.scan` over `n_groups` DeepCache groups of `interval` steps
    each (1 full + interval-1 shallow). Returns (carry, x0_stack)."""

    def gbody(carry, step_in):
        x, k = carry
        ts_g, prev_g = step_in  # each [interval]
        x0s = []
        trunk = None
        for j in range(interval):
            t, prev_t = ts_g[j], prev_g[j]
            k, k_noise, k_rgb = jax.random.split(k, 3)
            step_conds = _step_conds(conds, noise_rgb_cfg, tables, t, k_rgb)
            model_input = jnp.concatenate([x, step_conds], axis=-1)
            if j == 0:
                model_output, trunk = model_fn_trunk(model_input, t)
            else:
                model_output = model_fn_cached(model_input, t, trunk)
            out = _scheduler_apply(spec, tables, model_output, t, prev_t,
                                   x, k_noise, guidance_fn)
            x = out.prev_sample.astype(x_dtype)
            x0s.append(out.perturbed_original_sample)
        return (x, k), jnp.stack(x0s)

    gts = ts_run.reshape(n_groups, interval)
    gprev = prev_run.reshape(n_groups, interval)
    carry, ys = jax.lax.scan(gbody, carry, (gts, gprev))
    return carry, ys.reshape((n_groups * interval,) + ys.shape[2:])


def _run_cached_steps(model_fn, spec, tables, x_init, conds, key, ts,
                      prev_ts, guidance_fn, noise_rgb_cfg, interval,
                      model_fn_trunk, model_fn_cached):
    """The uniform DeepCache grouped scan (see run_sampler_steps)."""
    num_steps = int(ts.shape[0])
    groups, rem = divmod(num_steps, interval)

    carry = (x_init, key)
    stacks = []
    if groups:
        carry, ys = _scan_cached_groups(
            spec, tables, conds, guidance_fn, noise_rgb_cfg, carry,
            ts[: groups * interval], prev_ts[: groups * interval],
            interval, groups, x_init.dtype, model_fn_trunk, model_fn_cached)
        stacks.append(ys)
    if rem:
        # finish the remainder with full-model steps (same RNG pattern)
        x_f, key_f, tail = run_sampler_steps(
            model_fn, spec, tables, carry[0], conds, carry[1],
            ts[groups * interval:], prev_ts[groups * interval:],
            guidance_fn, noise_rgb_cfg)
        carry = (x_f, key_f)
        stacks.append(tail)
    x0_stack = stacks[0] if len(stacks) == 1 else jnp.concatenate(stacks, 0)
    return carry[0], carry[1], x0_stack


def _run_pattern_steps(model_fn, spec, tables, x_init, conds, key, ts,
                       prev_ts, guidance_fn, noise_rgb_cfg, segs,
                       model_fn_trunk, model_fn_cached):
    """The non-uniform DeepCache runner: `segs` is the tuple of segment
    lengths from parse_cache_schedule (each segment = 1 full step +
    seg_len-1 shallow steps). Consecutive equal-length segments share one
    scan body; length-1 runs (consecutive full steps) reuse the PLAIN
    scan body — for the uniform-equivalent pattern this compiles the
    exact same two program bodies as _run_cached_steps."""
    runs = []  # [seg_len, count], consecutive equal seg_lens merged
    for n in segs:
        if runs and runs[-1][0] == n:
            runs[-1][1] += 1
        else:
            runs.append([n, 1])

    carry = (x_init, key)
    stacks = []
    pos = 0
    for seg_len, count in runs:
        n_steps = seg_len * count
        ts_r = ts[pos:pos + n_steps]
        prev_r = prev_ts[pos:pos + n_steps]
        if seg_len == 1:
            x_f, key_f, tail = run_sampler_steps(
                model_fn, spec, tables, carry[0], conds, carry[1],
                ts_r, prev_r, guidance_fn, noise_rgb_cfg)
            carry = (x_f, key_f)
            stacks.append(tail)
        else:
            carry, ys = _scan_cached_groups(
                spec, tables, conds, guidance_fn, noise_rgb_cfg, carry,
                ts_r, prev_r, seg_len, count, x_init.dtype,
                model_fn_trunk, model_fn_cached)
            stacks.append(ys)
        pos += n_steps
    x0_stack = stacks[0] if len(stacks) == 1 else jnp.concatenate(stacks, 0)
    return carry[0], carry[1], x0_stack


# ---------------------------------------------------------------------- #
# Pixel-space pipeline
# ---------------------------------------------------------------------- #


def pixel_pipeline(
    unet_apply: Callable,
    spec: SamplerSpec,
    tables: ScheduleTables,
    key: jax.Array,
    num_inference_steps: int,
    num_intermediate_images: int,
    depth_channels: int,
    cond_channels: str,
    rgb: Optional[jnp.ndarray] = None,
    left: Optional[jnp.ndarray] = None,
    right: Optional[jnp.ndarray] = None,
    sim_disp: Optional[jnp.ndarray] = None,
    guidance: Optional[FlowGuidance] = None,
    raw_mask: Optional[jnp.ndarray] = None,
    add_noise_rgb: bool = False,
) -> PipelineOutput:
    """Pixel-space sampling (reference: custom_pipelines.py:90-213).

    All image tensors NHWC at full resolution; starts from noise at image
    resolution; final images are the last step's clamped prev_sample
    (reference: custom_pipelines.py:175,196-199 — NOT x_hat0; the
    intermediates stack, in contrast, holds per-step x_hat0).
    """
    ref = next(x for x in (rgb, left) if x is not None)
    B, H, W, _ = ref.shape
    conds = build_cond_concat(cond_channels, rgb, left, right, sim_disp)

    key, k_init = jax.random.split(key)
    x_init = jax.random.normal(k_init, (B, H, W, depth_channels), ref.dtype)

    guidance_fn = None
    if guidance is not None and guidance.enabled and sim_disp is not None:
        if guidance.flow_guidance_mode != "imputation":
            # loud, like the latent path's unsupported-mode error —
            # silently sampling unguided would report unguided output
            # as guided results
            raise NotImplementedError(
                f"pixel pipeline supports only imputation guidance, got "
                f"{guidance.flow_guidance_mode!r}")
        # fallback mask (sim_disp != 0) is only correct when invalid raw
        # pixels normalize to exactly 0 (SSI); non-SSI normalizers map
        # raw 0 to -1, so callers must pass the real raw_mask
        mask = raw_mask if raw_mask is not None else (sim_disp != 0)
        guidance_fn = guidance.make_pixel_imputation_fn(
            sim_disp[..., :depth_channels], mask[..., :depth_channels]
        )

    noise_rgb_cfg = None
    if add_noise_rgb and rgb is not None and cond_channels.startswith("rgb"):
        noise_rgb_cfg = {"rgb": rgb, "slice": (0, rgb.shape[-1])}

    final, stack = run_sampler(
        unet_apply, spec, tables, x_init, conds, key,
        num_inference_steps, guidance_fn, noise_rgb_cfg,
    )
    inter = jnp.clip(
        stack[_kept_indices(num_inference_steps, num_intermediate_images)],
        -1.0, 1.0,
    )
    return PipelineOutput(jnp.clip(final, -1.0, 1.0), inter)


# ---------------------------------------------------------------------- #
# Latent pipeline
# ---------------------------------------------------------------------- #


def latent_pipeline(
    unet_apply: Callable,
    vae_encode: Callable[[jnp.ndarray], jnp.ndarray],
    vae_decode: Callable[[jnp.ndarray], jnp.ndarray],
    text_embed: jnp.ndarray,
    spec: SamplerSpec,
    tables: ScheduleTables,
    key: jax.Array,
    num_inference_steps: int,
    num_intermediate_images: int,
    cond_channels: str,
    rgb: Optional[jnp.ndarray] = None,
    left: Optional[jnp.ndarray] = None,
    right: Optional[jnp.ndarray] = None,
    sim_disp: Optional[jnp.ndarray] = None,
    raw_depth: Optional[jnp.ndarray] = None,
    guidance: Optional[FlowGuidance] = None,
    denormer: Optional[Callable] = None,
    add_noise_rgb: bool = False,
    cache_interval: int = 1,
    unet_apply_trunk=None,
    unet_apply_cached=None,
    cache_schedule: Optional[str] = None,
) -> PipelineOutput:
    """Latent-space sampling (reference: custom_pipelines.py:208-462).

    Conditions are encoded once; latent noise starts at H/8 x W/8; the
    model is conditioned on the (empty-prompt) text embedding; guidance in
    "gradient" mode runs inside the scan; the returned images are VAE
    decodes of x_hat0 (channel-mean -> 1 channel), clamped to [-1, 1].

    cache_interval > 1 = DeepCache (see run_sampler_steps); callers supply
    `unet_apply_trunk(model_input, t, ctx) -> (out, trunk)` and
    `unet_apply_cached(model_input, t, ctx, trunk) -> out`.
    """
    guidance_fn = None
    if guidance is not None and guidance.enabled:
        assert spec.is_ode, (
            "in-step guidance is routed only for deterministic samplers "
            "(reference routes it only for MyDDIM, custom_pipelines.py:390-402; "
            "euler/heun also support the hook here)"
        )
        assert raw_depth is not None and denormer is not None
        guidance_fn = guidance.make_latent_guidance_fn(
            vae_decode, denormer, raw_depth
        )

    ref = next(x for x in (rgb, left, right, sim_disp) if x is not None)
    conds, lat = latent_encode_conds(
        vae_encode, cond_channels, rgb=rgb, left=left, right=right,
        sim_disp=sim_disp,
    )
    kept = latent_denoise(
        unet_apply, text_embed, spec, tables, key, num_inference_steps,
        num_intermediate_images, conds, lat, cond_channels,
        guidance_fn=guidance_fn, add_noise_rgb=add_noise_rgb,
        noise_dtype=ref.dtype, cache_interval=cache_interval,
        unet_apply_trunk=unet_apply_trunk,
        unet_apply_cached=unet_apply_cached,
        cache_schedule=cache_schedule,
    )
    return latent_decode_images(vae_decode, kept)


def latent_encode_conds(
    vae_encode: Callable[[jnp.ndarray], jnp.ndarray],
    cond_channels: str,
    rgb: Optional[jnp.ndarray] = None,
    left: Optional[jnp.ndarray] = None,
    right: Optional[jnp.ndarray] = None,
    sim_disp: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Stage 1 of the latent pipeline: one batched VAE encode for all
    conditions (better MXU utilization than 2-4 separate encodes;
    disparity tiled to 3 channels first). Returns the channel-concat
    condition latents and the per-name latent dict."""
    to_encode = []
    names = []
    for name, img in (("rgb", rgb), ("left", left), ("right", right)):
        if img is not None:
            to_encode.append(img)
            names.append(name)
    if sim_disp is not None:
        to_encode.append(jnp.tile(sim_disp, (1, 1, 1, 3)))
        names.append("raw")
    stacked = jnp.concatenate(to_encode, axis=0)
    encoded = vae_encode(stacked)
    parts = jnp.split(encoded, len(names), axis=0)
    lat = dict(zip(names, parts))

    conds = build_cond_concat(
        cond_channels, lat.get("rgb"), lat.get("left"), lat.get("right"), lat.get("raw")
    )
    return conds, lat


def latent_denoise(
    unet_apply: Callable,
    text_embed: jnp.ndarray,
    spec: SamplerSpec,
    tables: ScheduleTables,
    key: jax.Array,
    num_inference_steps: int,
    num_intermediate_images: int,
    conds: jnp.ndarray,
    lat: Dict[str, jnp.ndarray],
    cond_channels: str,
    guidance_fn=None,
    add_noise_rgb: bool = False,
    noise_dtype=None,
    cache_interval: int = 1,
    unet_apply_trunk=None,
    unet_apply_cached=None,
    cache_schedule: Optional[str] = None,
) -> jnp.ndarray:
    """Stage 2: latent-noise init + the T-step denoise scan. Returns the
    kept x_hat0 latents [S, B, h, w, 4] (last kept index = final step).

    `noise_dtype` is the dtype of the initial latent noise — the INPUT
    image dtype in the monolithic pipeline (not the latent dtype, which
    may be bf16): PRNG bits drawn at a different precision are different
    values, so split/monolithic parity requires matching it."""
    B = conds.shape[0]

    key, k_init = jax.random.split(key)
    x_init = jax.random.normal(
        k_init, conds.shape[:-1] + (4,),
        noise_dtype if noise_dtype is not None else conds.dtype)

    if text_embed.shape[0] == 1 and B > 1:
        text_embed = jnp.broadcast_to(text_embed, (B,) + text_embed.shape[1:])

    def model_fn(model_input, t):
        return unet_apply(model_input, t, text_embed)

    model_fn_trunk = model_fn_cached = None
    if (cache_interval and cache_interval > 1) or (
            cache_schedule is not None and "S" in cache_schedule.upper()):
        def model_fn_trunk(model_input, t):
            return unet_apply_trunk(model_input, t, text_embed)

        def model_fn_cached(model_input, t, trunk):
            return unet_apply_cached(model_input, t, text_embed, trunk)

    noise_rgb_cfg = None
    if add_noise_rgb and "rgb" in lat and "rgb" in cond_channels:
        noise_rgb_cfg = {"rgb": lat["rgb"], "slice": (0, lat["rgb"].shape[-1])}

    _, x0_stack = run_sampler(
        model_fn, spec, tables, x_init, conds, key,
        num_inference_steps, guidance_fn, noise_rgb_cfg,
        cache_interval=cache_interval, model_fn_trunk=model_fn_trunk,
        model_fn_cached=model_fn_cached, cache_schedule=cache_schedule,
    )
    return x0_stack[_kept_indices(num_inference_steps, num_intermediate_images)]


def latent_decode_images(
    vae_decode: Callable[[jnp.ndarray], jnp.ndarray],
    kept: jnp.ndarray,
) -> PipelineOutput:
    """Stage 3: decode the kept x_hat0 latents. The last kept intermediate
    IS the final step's x_hat0 (the last index is forced into the kept
    set), so one decode pass serves both (each full-res VAE decode costs
    ~2 UNet steps)."""
    decoded = jax.vmap(vae_decode)(kept)
    inter = jnp.clip(decoded, -1.0, 1.0)
    final = inter[-1]
    return PipelineOutput(final, inter)
