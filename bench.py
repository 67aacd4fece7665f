#!/usr/bin/env python
"""Benchmark: denoised depth frames/sec/chip at the release inference
setting — 640x360 input, 10-step DDIM (BASELINE.md: target >= 20 fps/chip
on TPU v5e).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Env knobs:
  BENCH_MODEL=ldm|pixel   flagship latent model (default) or pixel family
  BENCH_BATCH=N           frames per pipeline call (default 16; throughput
                          saturates at batch 8-16 on v5e, see docs/PERFORMANCE.md)
  BENCH_REPS=N            timed repetitions (default 12; the one terminal
                          completion round-trip amortizes across reps)
  BENCH_FLASH=0..4        UNet attention impl (default 3): 0 = XLA,
                          1 = library flash kernel, 2 = whole-row Pallas
                          kernel for self+cross, 3 = whole-row kernel for
                          self-attention only (measured best), 4 = fully
                          fused QKV+attention+out kernel
  BENCH_QUANT=0|1|dense|static|mxu|vae8|wino_static  int8/conv path
                          (default "static" — calibrated int8 UNet+VAE,
                          the measured best: 15.39 fps vs "wino_static"
                          12.30, "vae8" 12.71 (bf16 UNet + int8 VAE),
                          "0" (bf16 everywhere) 11.73; "dense" =
                          projections only; "mxu" = static + Pallas
                          implicit-GEMM conv)
  BENCH_FF=0|1            fused Pallas GEGLU feed-forward (default 1;
                          A/B at the release config: ff=1 15.39 fps,
                          ff=0 15.24 — the round-2 conclusion stands)
  BENCH_STEPS=N           denoise steps (default 10 — the release setting;
                          differencing N=20 vs N=10 isolates per-step UNet
                          cost from the VAE encode/decode overhead)
  BENCH_FUSED_GN=0|1      fused Pallas GroupNorm+SiLU kernel (default 0:
                          measured -2% end-to-end vs XLA's fusion — a
                          pallas_call is a fusion barrier; kept as an
                          opt-in building block)
  BENCH_AUTOSELECT=0|1    default 1: with BENCH_QUANT unset, flip from
                          the default mode to the fastest quant mode
                          MEASURED by prior runs at the same setting
                          (recorded in .bench_cache/results.jsonl, latest
                          record per config), requiring a >2% recorded
                          win over the latest default-mode run; governs
                          quant/wc only — never the DeepCache interval
  BENCH_DEEPCACHE=N|pat   DeepCache (1 = off/exact): an interval N > 1
                          runs the full UNet every N-th denoise step and
                          a shallow cached pass between (deep-trunk
                          reuse, Ma et al. CVPR 2024); an F/S pattern
                          string (e.g. FSFSFSFSFF) selects a NON-UNIFORM
                          schedule (full steps where drift accrues).
                          An approximation — the schedule is disclosed
                          in the output JSON; the default
                          (DEFAULT_DEEPCACHE) is accuracy-gated by the
                          measured drift table committed at
                          docs/deepcache_accuracy.json (see
                          docs/PERFORMANCE.md for the analysis).
  BENCH_DEEPCACHE_DEPTH=D shallow-pass depth (default 1): 2 = medium
                          split (also refreshes down block 1 + up block
                          2, ~2/3 of step FLOPs, lower drift)
  BENCH_CLIP_PCT=p        calibrate with |act| quantile recording and
                          clip activation scales at percentile p (e.g.
                          0.999) instead of absmax (PTQ outlier
                          clipping); default absmax
"""

import importlib.util
import json
import os
import re
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))


def _machine_cache_dir(base):
    """d3roma_tpu.utils.compile_cache.machine_cache_dir, loaded from the
    file WITHOUT importing the package: the package import pulls in jax,
    and jax snapshots JAX_COMPILATION_CACHE_DIR at import — the env var
    must be set first. Machine-keying prevents the round-3 cross-host
    poisoning (cpu_aot_loader "machine feature mismatch" on every entry)."""
    spec = importlib.util.spec_from_file_location(
        "_d3roma_compile_cache",
        os.path.join(_HERE, "d3roma_tpu", "utils", "compile_cache.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.machine_cache_dir(base)


# guarded (not setdefault): _machine_cache_dir has side effects (mkdir +
# legacy purge) that must not run when the user already pointed
# JAX_COMPILATION_CACHE_DIR elsewhere
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    os.environ["JAX_COMPILATION_CACHE_DIR"] = _machine_cache_dir(
        os.path.join(_HERE, ".jax_bench_cache"))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 20.0  # BASELINE.json north-star


def _metric_name():
    # stable name at the release setting (the driver tracks it across
    # rounds); custom-step runs are labeled with their own step count
    steps = os.environ.get("BENCH_STEPS", "10")
    return f"depth_fps_per_chip_640x360_{steps}step"


DEFAULT_QUANT = "static"  # measured best (15.39 fps; wino 12.30, vae8 12.71, bf16 11.73)
DEFAULT_FF = "1"  # fused GEGLU default; tests/test_bench_select.py tracks this
# DeepCache schedule for the default run. The default is ACCURACY-GATED:
# it may only name a config whose measured end-metric drift (combined
# with the default int8 path, on the capstone checkpoint — the sweep in
# scripts/deepcache_accuracy.py, committed at docs/deepcache_accuracy.json)
# is inside the <1% AbsRel parity bar from BASELINE.md;
# tests/test_bench_select.py::test_default_deepcache_is_accuracy_gated
# enforces the coupling. Speed alone never moves this constant, and
# _maybe_autoselect_quant never escalates past it (accuracy is not a
# dimension the speed records can see). "1" = exact numerics.
#
# Round-5 selection (docs/PERFORMANCE.md): the MEDIUM-depth uniform k=2
# schedule ("2" + depth 2 — shallow pass also refreshes down block 1 +
# up block 2, ~2/3 of step FLOPs) measures 16.15 fps at +0.73% combined
# AbsRel (64 frames; +0.79% at the 128-frame confirmation) — inside the
# bar WITH margin. The faster measured configs sit at or over the bar
# and stay opt-in: 6F4S "FSFSFSFSFF" 17.43 fps at +0.96%/+0.99%
# (64/128 frames — AT the bar, no margin), uniform k=2 18.04 fps at
# +1.22% (over).
# The config string accepts an optional depth suffix ("2d2"); a user
# pinning BENCH_DEEPCACHE without a suffix gets the classic depth 1
# (BENCH_DEEPCACHE_DEPTH still overrides explicitly).
DEFAULT_DEEPCACHE = "2d2"


def _parse_deepcache():
    """(schedule, depth) from BENCH_DEEPCACHE[+depth suffix] +
    BENCH_DEEPCACHE_DEPTH. schedule is an int interval or an F/S pattern
    string; depth is forced to 1 when no shallow step exists."""
    raw = os.environ.get("BENCH_DEEPCACHE", DEFAULT_DEEPCACHE)
    m = re.fullmatch(r"([0-9]+|[FSfs]+)(?:d([0-9]+))?", raw)
    if not m:
        raise ValueError(f"bad BENCH_DEEPCACHE {raw!r}")
    sched = m.group(1)
    depth = int(os.environ.get("BENCH_DEEPCACHE_DEPTH",
                               m.group(2) or "1"))
    if sched.isdigit():
        sched = int(sched)
        if sched <= 1:
            depth = 1
    else:
        sched = sched.upper()
        if "S" not in sched:
            depth = 1
    return sched, depth


def bench_ldm(batch, reps):
    """Flagship: SD2.1-geometry latent pipeline, bf16 compute, rgb+raw."""
    from d3roma_tpu.guidance import FlowGuidance
    from d3roma_tpu.models import AutoencoderKL, UNet2DCondition, widened_in_channels
    from d3roma_tpu.ops import Normalizer, ScheduleConfig
    from d3roma_tpu.pipelines import GuidedLatentDiffusionPipeline, SamplerSpec

    H, W = 360, 640
    in_ch = widened_in_channels("rgb+raw")  # 12
    flash_env = os.environ.get("BENCH_FLASH", "3")
    use_flash = {"0": False, "1": True, "2": "pallas",
                 "3": "pallas-self", "4": "fused"}.get(flash_env, True)
    fused_ff = os.environ.get("BENCH_FF", DEFAULT_FF) == "1"
    unet = UNet2DCondition(in_channels=in_ch, out_channels=4,
                           use_flash_attention=use_flash, fused_ff=fused_ff,
                           dtype=jnp.bfloat16)
    vae = AutoencoderKL(dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, H // 8, W // 8, in_ch))
    ctx = jnp.zeros((1, 2, 1024))
    unet_params = jax.jit(unet.init)(key, lat, jnp.array([0]), ctx)["params"]
    vae_params = jax.jit(vae.init)(jax.random.fold_in(key, 1), jnp.zeros((1, 64, 64, 3)))["params"]

    sched = ScheduleConfig(
        num_train_timesteps=1000, beta_schedule="scaled_linear",
        beta_start=0.00085, beta_end=0.012, prediction_type="v_prediction",
        clip_sample=False, timestep_spacing="leading", steps_offset=1,
    )
    pipe = GuidedLatentDiffusionPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        text_embed=jnp.zeros((1, 2, 1024)),
        spec=SamplerSpec("my_ddim", sched),
        guidance=FlowGuidance(flow_guidance_weight=0.0, flow_guidance_mode="gradient"),
        normalizer=Normalizer(ssi=False, mode="average", num_chs=1,
                              ch_bounds=(128.0,), ch_gammas=(1.0,)),
    ).half_precision()
    if os.environ.get("BENCH_FUSED_GN", "0") == "1":
        pipe = pipe.fuse_norms()
    quant = os.environ.get("BENCH_QUANT", DEFAULT_QUANT)
    if quant in ("1", "all"):
        pipe = pipe.quantize_int8()
    elif quant == "vae8":
        # bf16 UNet + calibrated static-int8 VAE. A scan-length-confounded
        # probe briefly suggested this beat full static int8; end-to-end
        # it measures 12.71 fps vs static's 15.24 — kept as the measured
        # mixed-precision point, not the default.
        import dataclasses as _dc

        pipe = _dc.replace(pipe, vae=_dc.replace(pipe.vae, quant="static"))
    elif quant in ("dense", "static", "mxu", "halo", "wino", "wino_static"):
        import dataclasses as _dc

        pipe = _dc.replace(
            pipe,
            unet=_dc.replace(pipe.unet, quant=quant),
            vae=_dc.replace(pipe.vae, quant=quant),
        )
    # random (not zero) inputs so dynamic activation-quant scales are realistic
    rgb = jax.random.normal(jax.random.PRNGKey(7), (batch, H, W, 3)) * 0.5
    raw = jnp.abs(jax.random.normal(jax.random.PRNGKey(8), (batch, H, W, 1))) * 0.5

    steps = int(os.environ.get("BENCH_STEPS", "10"))

    # DeepCache BEFORE calibration: with a cached schedule the capture
    # follows the deployed grouped trajectory (stale trunks on shallow
    # steps — pipelines/pipeline.py::calibrate), which is what the
    # quantized program replays against
    dc_sched, dc_depth = _parse_deepcache()
    dc_is_pattern = isinstance(dc_sched, str)
    dc_interval = 1 if dc_is_pattern else dc_sched
    if dc_is_pattern:
        pipe = pipe.deepcache(dc_sched, depth=dc_depth)
    elif dc_interval > 1 or dc_depth != 1:
        pipe = pipe.deepcache(dc_interval, depth=dc_depth)

    if (quant in ("static", "mxu", "halo", "wino_static", "vae8")
            # "1" = calibrate (cached); "force" = recapture ignoring the
            # disk cache; anything else disables calibration
            and os.environ.get("BENCH_CALIB", "1") in ("1", "force")):
        # release default: per-layer calibrated activation scales (one
        # capture pass on the bench conditions; replayed scales are
        # compile-time constants, so the timed path's cost is unchanged).
        # Scales are cached on disk keyed by the bench config — in
        # production they ship with the pipeline export (act_scales.json),
        # so reusing a prior capture is the deployed behavior, and it
        # keeps the bench calibrated even when the remote-compile relay
        # drops the (large) capture programs that day.
        import dataclasses as _dc

        # keyed by EVERY knob that changes the quantized call sequence —
        # replay is call-order-strict: quant mode, the wino-eligibility
        # env (D3ROMA_WINO_CHUNK moves big-slab convs between the static
        # and wino paths), the attention impl (kernel vs unfused paths
        # consume scales at different sites), and the GEGLU fusion flag
        # (the fused kernel consumes one scale where the unfused path
        # consumes none/different ones)
        wc = os.environ.get("D3ROMA_WINO_CHUNK", "0")
        ff = os.environ.get("BENCH_FF", DEFAULT_FF)
        fl = os.environ.get("BENCH_FLASH", "3")
        clip_pct = os.environ.get("BENCH_CLIP_PCT", "")
        dc_key = str(dc_sched) + (f"d{dc_depth}" if dc_depth != 1 else "")
        # "act_scales3": capture now follows the deployed DeepCache
        # schedule when an interval is set (stale-trunk statistics for
        # the "unet_cached" table), so scales are keyed by the interval
        # too; act_scales2 (exact-trunk capture) files are superseded
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache",
                             f"act_scales3_{quant}_b{batch}_s{steps}"
                             f"_ff{ff}_fl{fl}_dc{dc_key}"
                             + (f"_q{clip_pct}" if clip_pct else "")
                             + (f"_wc{wc}" if quant == "wino_static" else "")
                             + ".json")
        if os.path.exists(cache) and os.environ.get("BENCH_CALIB") != "force":
            with open(cache) as f:
                pipe = _dc.replace(pipe, act_scales=json.load(f))
            if clip_pct:
                pipe = pipe.with_act_clipping(percentile=float(clip_pct))
            print(f"# calibrated scales loaded from {cache}", file=sys.stderr)
        else:
            # The relay can drop mid-calibration (the batch-16 capture
            # program is large) — retry at the full batch, then at batch 8
            # (smaller capture programs; batches 1/2/4 are avoided — small
            # batches crash today's compile helper outright), then batch 8
            # at half width (scales are activation statistics, roughly
            # size-invariant; absmax + the 1.25 margin absorbs the smaller
            # sample), then fall back to the global static scale.
            for cb, w_step in ((batch, 1), (min(8, batch), 1),
                               (min(8, batch), 2)):
                try:
                    pipe = pipe.calibrate(
                        jax.random.PRNGKey(99),
                        [dict(rgb_images=rgb[:cb, :, ::w_step],
                              sim_disp=raw[:cb, :, ::w_step])],
                        cond_channels="rgb+raw", num_inference_steps=steps,
                        quantiles=((float(clip_pct),) if clip_pct
                                   else None),
                    )
                    if clip_pct:
                        pipe = pipe.with_act_clipping(
                            percentile=float(clip_pct))
                    os.makedirs(os.path.dirname(cache), exist_ok=True)
                    with open(cache, "w") as f:
                        json.dump(pipe.act_scales, f)
                    print(f"# calibrated at batch {cb} w/{w_step} -> {cache}",
                          file=sys.stderr)
                    break
                except Exception as e:  # noqa: BLE001
                    print(f"# calibration at batch {cb} w/{w_step} failed: "
                          f"{type(e).__name__}: {str(e)[:400]}", file=sys.stderr)
                    time.sleep(20)

    # Run-unique key base: with a fixed base, two bench PROCESSES at the
    # same config enqueue byte-identical (program, input) dispatches, and
    # the remote-device transport can serve repeats from its cache —
    # observed as impossibly identical fps (12.695 twice to 3 decimals)
    # across separate runs. A per-process nonce keeps every dispatch
    # unique so each run measures real device execution.
    seed_base = int(os.environ.get("BENCH_SEED", str(time.time_ns() % (1 << 20))))

    def run(i, block=True):
        # deployment setting decodes only the final x_hat0
        # (reference: d3roma_processor.py overrides num_intermediate_images=1)
        out = pipe(jax.random.PRNGKey(seed_base + i), num_inference_steps=steps,
                   num_intermediate_images=1, cond_channels="rgb+raw",
                   rgb_images=rgb, sim_disp=raw)
        if block:
            jax.block_until_ready(out.images)
        return out

    from d3roma_tpu.utils.flops import latent_pipeline_flops_per_frame

    flops = latent_pipeline_flops_per_frame(
        H, W, steps, n_conds=2, in_channels=in_ch,
        cache_interval=dc_interval,
        cache_schedule=dc_sched if dc_is_pattern else None,
        cache_depth=dc_depth)
    return run, f"ldm_rgb+raw_640x360_ddim{steps}", flops["total"]


def bench_pixel(batch, reps):
    from d3roma_tpu.guidance import FlowGuidance
    from d3roma_tpu.models import UNet2D, pixel_in_channels
    from d3roma_tpu.ops import Normalizer, ScheduleConfig
    from d3roma_tpu.pipelines import GuidedDiffusionPipeline, SamplerSpec

    H, W = 360, 640
    in_ch = pixel_in_channels("rgb+raw", 1)
    unet = UNet2D(in_channels=in_ch, out_channels=1, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = jax.jit(unet.init)(key, jnp.zeros((1, H + 8, W, in_ch)), jnp.array([0]))["params"]

    sched = ScheduleConfig(num_train_timesteps=128, beta_schedule="squaredcos_cap_v2",
                           prediction_type="sample", clip_sample=True)
    pipe = GuidedDiffusionPipeline(
        unet=unet, unet_params=params,
        spec=SamplerSpec("my_ddpm", sched),
        guidance=FlowGuidance(flow_guidance_weight=0.0),
        normalizer=Normalizer(ssi=True, safe_ssi=False),
    ).half_precision()
    rgb = jnp.zeros((batch, H + 8, W, 3))  # divis_by-padded
    raw = jnp.zeros((batch, H + 8, W, 1))

    def run(i, block=True):
        out = pipe(jax.random.PRNGKey(i), num_inference_steps=10,
                   num_intermediate_images=5, depth_channels=1,
                   cond_channels="rgb+raw", rgb_images=rgb, sim_disp=raw)
        if block:
            jax.block_until_ready(out.images)
        return out

    return run, "pixel_rgb+raw_640x360_ddpm10", None


def _bench_setting():
    """The knobs that define comparability between bench runs."""
    return {
        "model": os.environ.get("BENCH_MODEL", "ldm"),
        "batch": int(os.environ.get("BENCH_BATCH", "16")),
        "steps": int(os.environ.get("BENCH_STEPS", "10")),
        "flash": os.environ.get("BENCH_FLASH", "3"),
        "ff": os.environ.get("BENCH_FF", DEFAULT_FF),
        "fused_gn": os.environ.get("BENCH_FUSED_GN", "0"),
        # wino backend knobs: runs with a different kernel routing are
        # not comparable to the default run they would steer
        "wino_fused": os.environ.get("D3ROMA_WINO_FUSED", ""),
        "wino_slab": os.environ.get("D3ROMA_WINO_SLAB_MB", ""),
        # "1" and "force" both yield a calibrated run
        "calib": ("1" if os.environ.get("BENCH_CALIB", "1") in ("1", "force")
                  else "0"),
    }


def _deepcache_key():
    """The full DeepCache identity of this run (schedule + depth + act
    clipping) — results.jsonl records and autoselect comparability key."""
    sched, depth = _parse_deepcache()
    clip = os.environ.get("BENCH_CLIP_PCT", "")
    key = str(sched)
    if depth != 1:
        key += f"d{depth}"
    if clip:
        key += f"q{clip}"
    return key


def _records_path():
    return os.environ.get("BENCH_RECORDS") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".bench_cache", "results.jsonl")


def _maybe_autoselect_quant():
    """With BENCH_QUANT unset, pick the fastest MEASURED quant mode.

    Every bench run appends its measured fps to .bench_cache/results.jsonl;
    a default run scans records at the SAME bench setting, takes the
    LATEST record of each (quant, wc) config (so a perf regression in a
    mode updates its standing instead of an old fast record pinning the
    winner forever), and flips from "static" only when another config has
    a >2% win over the latest "static" record (noise guard; no static
    record -> no flip). This lets an unattended measurement campaign
    (e.g. the tunnel-recovery watcher benching wino_static variants)
    carry its winner into later default runs without a code change.
    BENCH_AUTOSELECT=0 disables; an explicitly set D3ROMA_WINO_CHUNK is
    never overridden; records are per-checkout, not committed artifacts.
    """
    if (os.environ.get("BENCH_QUANT") is not None
            or os.environ.get("BENCH_AUTOSELECT", "1") != "1"):
        return
    setting = _bench_setting()
    latest = {}  # (quant, wc) -> last matching record in file order
    try:
        with open(_records_path()) as f:
            lines = f.readlines()
    except OSError:
        return
    for line in lines:
        try:
            r = json.loads(line)
        except ValueError:
            continue
        if any(r.get(k) != v for k, v in setting.items()):
            continue
        if not isinstance(r.get("fps"), (int, float)):
            continue
        latest[(r.get("quant"), r.get("wc", "0"),
                r.get("deepcache", "1"))] = r
    user_wc = os.environ.get("D3ROMA_WINO_CHUNK")
    if user_wc is not None:
        # the user pinned the chunking env: configs measured under a
        # different wc are not what this run would execute
        latest = {k: v for k, v in latest.items() if k[1] == user_wc}
    # deepcache is NOT an autoselect dimension: the interval changes the
    # model's NUMERICS, and the speed records carry no accuracy — an
    # unattended measurement campaign must never steer the default run to
    # a lossier approximation on an fps win alone (advisor r3). Only
    # records measured at THIS run's interval (pinned or the accuracy-
    # gated default) are comparable; autoselect governs quant/wc only.
    run_dc = _deepcache_key()
    latest = {k: v for k, v in latest.items() if k[2] == run_dc}
    static_best = max(
        (r for (q, _, _), r in latest.items() if q == DEFAULT_QUANT),
        key=lambda r: r["fps"], default=None)
    best = max(latest.values(), key=lambda r: r["fps"], default=None)
    if (best and static_best and best.get("quant") != DEFAULT_QUANT
            and best["fps"] > 1.02 * static_best["fps"]):
        os.environ["BENCH_QUANT"] = best["quant"]
        if user_wc is None:
            os.environ["D3ROMA_WINO_CHUNK"] = best.get("wc", "0")
        print(f"# auto-selected quant={best['quant']} wc="
              f"{os.environ.get('D3ROMA_WINO_CHUNK', '0')} from records "
              f"at deepcache={run_dc} "
              f"({best['fps']} vs static {static_best['fps']} fps)",
              file=sys.stderr)


def _record_result(fps):
    rec = dict(_bench_setting(),
               quant=os.environ.get("BENCH_QUANT", DEFAULT_QUANT),
               wc=os.environ.get("D3ROMA_WINO_CHUNK", "0"),
               deepcache=_deepcache_key(),
               fps=round(fps, 3), ts=int(time.time()))
    try:
        os.makedirs(os.path.dirname(_records_path()), exist_ok=True)
        with open(_records_path(), "a") as f:
            f.write(json.dumps(rec) + "\n")
    except OSError as e:
        print(f"# bench record write failed: {e}", file=sys.stderr)


def _device_liveness_probe():
    """Fail fast when the axon TPU transport is down.

    A dead tunnel makes axon client-creation HANG (uninterruptible from
    inside the process) rather than error, which would hang the whole
    bench. Probe in a child process killed on timeout; on failure emit
    the bench-contract error JSON, attaching the most recent measured
    record at this setting as context (clearly marked — NOT the value).
    """
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True  # local backends (cpu/tpu) init synchronously
    import subprocess

    timeout = int(os.environ.get("BENCH_PROBE_TIMEOUT", "300"))
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout, capture_output=True)
        if r.returncode == 0:
            return True
        detail = (r.stderr or b"").decode(errors="replace")[-200:]
    except subprocess.TimeoutExpired:
        detail = f"device probe hung > {timeout}s (tunnel down?)"
    setting = _bench_setting()
    last = None
    try:
        with open(_records_path()) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if all(rec.get(k) == v for k, v in setting.items()):
                    last = rec
    except OSError:
        pass
    out = {"metric": _metric_name(),
           "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
           "error": f"TPU unreachable: {detail}".strip()}
    if last:
        out["last_measured_not_this_run"] = last
    print(json.dumps(out))
    return False


def main():
    if not _device_liveness_probe():
        return 1
    _maybe_autoselect_quant()
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    reps = int(os.environ.get("BENCH_REPS", "12"))
    model = os.environ.get("BENCH_MODEL", "ldm")

    try:
        run, tag, flops_per_frame = (
            bench_ldm if model == "ldm" else bench_pixel)(batch, reps)
        # the environment's remote-compile relay occasionally drops the
        # connection / 500s on large programs; retries usually succeed
        for attempt in range(4):
            try:
                run(0)  # compile + warmup
                break
            except Exception:
                if attempt == 3:
                    raise
                time.sleep(20)
        # Sustained-throughput protocol: enqueue all reps (distinct PRNG
        # keys -> distinct programs, so the transport cannot dedupe them),
        # then block once on the LAST output. The device executes the
        # queued programs back-to-back; per-dispatch host/transport
        # round-trip latency overlaps with device compute instead of
        # serializing with it (it is not part of per-frame cost in a
        # deployed serving loop either).
        t0 = time.time()
        outs = [run(i, block=False) for i in range(1, reps + 1)]
        # fetch a tiny slice of the LAST output: the device executes queued
        # programs in submission order, so last-done implies all-done, and
        # a host fetch is the only reliable completion barrier through the
        # remote-device transport (see .claude/skills/verify)
        np.asarray(outs[-1].images[0, 0, :8])
        dt = (time.time() - t0) / reps
        fps = batch / dt
        _record_result(fps)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({
            "metric": _metric_name(),
            "value": 0.0, "unit": "frames/s",
            "vs_baseline": 0.0, "error": f"{type(e).__name__}: {e}"[:300],
        }))
        return 1

    result = {
        "metric": _metric_name(),
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "config": tag,
        "batch": batch,
        "ms_per_frame": round(1000.0 * dt / batch, 2),
        "quant": os.environ.get("BENCH_QUANT", DEFAULT_QUANT),
    }
    dc_sched, dc_depth = _parse_deepcache()
    if model == "ldm" and (dc_sched != 1 or dc_depth != 1):
        # disclose the approximation: this run reuses deep UNet features
        # across steps (accuracy deltas: docs/PERFORMANCE.md)
        if isinstance(dc_sched, int):
            result["deepcache_interval"] = dc_sched
        else:
            result["deepcache_schedule"] = dc_sched
        if dc_depth != 1:
            result["deepcache_depth"] = dc_depth
    if model == "ldm" and os.environ.get("BENCH_CLIP_PCT"):
        result["act_clip_pct"] = float(os.environ["BENCH_CLIP_PCT"])
    if flops_per_frame:
        # analytic model FLOPs (utils/flops.py, XLA-validated): the MFU
        # convention — contraction FLOPs only, no kernel padding waste
        from d3roma_tpu.utils.flops import V5E_BF16_PEAK, V5E_INT8_PEAK

        sustained = flops_per_frame * fps
        result.update({
            "tflop_per_frame": round(flops_per_frame / 1e12, 3),
            "tflops_sustained": round(sustained / 1e12, 1),
            "mfu_bf16_peak": round(sustained / V5E_BF16_PEAK, 4),
            "mfu_int8_peak": round(sustained / V5E_INT8_PEAK, 4),
        })
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
