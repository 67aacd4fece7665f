#!/usr/bin/env python
"""DeepCache accuracy sweep on a trained flagship checkpoint.

Measures the end-metric drift of the DeepCache approximation (deep-trunk
reuse across denoise steps, Ma et al. CVPR 2024) against the exact
10-step DDIM run, on the capstone-trained flagship LDM checkpoint
(_scratch/capstone_ldm.py writes it to /tmp/capstone_ldm/run). The
checkpoint is weakly trained (procedural data only — no real DREDS
exists in this environment), so ABSOLUTE metrics are poor; the
k-vs-exact DELTAS are the signal.

Two modes per interval (advisor r3: the shipped config must be what is
measured):
  bf16  exact bf16 compute per step — isolates the caching approximation
  int8  the SHIPPED serving config: fast_inference("throughput") =
        calibrated static-int8 UNet+VAE + whole-row self-attention +
        fused GEGLU, calibrated once on the first eval batch (scales
        disk-cached and shared across intervals; calibrate() captures
        the "unet_cached" shallow-pass table too)

Drift columns: every row reports drift vs the bf16 exact baseline
(mode=bf16, k=1) — for int8 rows that is the COMBINED
quantization+caching deviation, the number the <1% AbsRel parity bar
(BASELINE.md) gates bench.py's DEFAULT_DEEPCACHE on — plus, for int8,
drift vs the int8 k=1 row (isolating caching under quantization).

Process architecture: each flagship eval program retains ~28 GB of host
RSS that survives jax.clear_caches() (third-party client state), so the
parent spawns a SUBPROCESS per row-group (DC_ROWS_PER_CHILD rows each,
default 2) and each row lands in WORK/dc_row_<mode>_<k>.json — crashed
or killed sweeps resume from completed row files. Two full-sweep OOM
kills at 130 GB RSS motivated this.

Writes the committed gate artifact docs/deepcache_accuracy.json
(consumed by tests/test_bench_select.py::test_default_deepcache_is_accuracy_gated).

Run (on the TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/deepcache_accuracy.py
Env:
  DC_KS=1,2,3,5      DeepCache configs (1 = exact baseline, required).
                     Each entry is <schedule>[d<depth>][q<pct>]:
                       schedule = uniform interval int OR an F/S pattern
                                  string (e.g. FSFSFSFSFF)
                       d<depth> = shallow-pass depth (default 1; 2 =
                                  medium split, ~2/3 step FLOPs)
                       q<pct>   = int8 activation-scale percentile
                                  clipping (e.g. q0.999; int8 rows only)
                       p<kind>  = bf16-pin a whole layer class at replay
                                  (dot|conv|attn|geglu — pipeline.kind_pins;
                                  int8 rows only, shares the unpinned
                                  config's capture)
                     e.g. DC_KS=1,2,FSFSFSFSFF,2d2,1q0.999,1pattn
  DC_MODES=bf16,int8 precision modes
  DC_FRAMES=64       eval frames (generated procedurally if absent)
  DC_BATCH=4         eval batch size — the RELAY-PROVEN compile shape
                     (batch 8 hangs the remote compile helper)
  DC_RUN=/tmp/capstone_ldm   capstone work dir (datasets/ + run/checkpoints)
  DC_OUT=docs/deepcache_accuracy.json   output table (repo-relative)
  DC_ROWS=mode:k,... (internal) child marker: evaluate exactly these rows
"""
import json
import os
import sys
import time

import re


def parse_cfg(cfg):
    """"2" | "2d2" | "FSFSFSFSFF" | "FSFSFSFSFFd2" | "1q0.999" |
    "1m1.0" | "1pattn" -> (schedule: int|str, depth, clip_pct, margin,
    pin_kind).
    m<margin> re-derives absmax scales at a different PTQ margin from the
    quantile capture (no recapture; int8 rows only). p<kind> bf16-pins a
    whole layer class at replay (kind in dot/conv/attn/geglu —
    pipeline.kind_pins; int8 rows only) for per-layer-class drift
    ablation: the classic PTQ-sensitive layers (conv_in/conv_out/
    time-embed) are architecturally unquantized in this design, so the
    int8 drift budget decomposes over these interior classes."""
    m = re.fullmatch(
        r"([0-9]+|[FSfs]+)(?:d([0-9]+))?(?:q(0\.[0-9]+))?"
        r"(?:m([0-9.]+))?(?:p(dot|conv|attn|geglu))?", cfg)
    assert m, f"bad DC_KS entry {cfg!r}"
    sched = m.group(1)
    if sched.isdigit():
        sched = int(sched)
    else:
        sched = sched.upper()
    depth = int(m.group(2) or 1)
    clip = float(m.group(3)) if m.group(3) else None
    margin = float(m.group(4)) if m.group(4) else None
    pin_kind = m.group(5) or None
    return sched, depth, clip, margin, pin_kind


KS = os.environ.get("DC_KS", "1,2,3,5").split(",")
for _k in KS:
    parse_cfg(_k)  # validate early
MODES = os.environ.get("DC_MODES", "bf16,int8").split(",")
FRAMES = int(os.environ.get("DC_FRAMES", "64"))
BATCH = int(os.environ.get("DC_BATCH", "4"))
WORK = os.environ.get("DC_RUN", "/tmp/capstone_ldm")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("DC_OUT", os.path.join(REPO, "docs",
                                            "deepcache_accuracy.json"))
assert "1" in KS, "config 1 (exact) is the baseline — include it in DC_KS"
assert "bf16" in MODES, "bf16 (exact-compute) is the baseline mode"

sys.path.insert(0, REPO)
os.makedirs(WORK, exist_ok=True)
os.chdir(WORK)  # datasets/HISS resolves relative to the capstone work dir


def _row_path(mode, k):
    return os.path.join(WORK, f"dc_row_{mode}_{k}.json")


METS = (("disp", "epe"), ("depth", "rel"), ("depth", "rmse"),
        ("depth", "mae"))


def _row(m, baselines):
    row = {}
    for space, met in METS:
        v = float(m[space][met])
        row[f"{space}_{met}"] = round(v, 4)
        for tag, base_m in baselines.items():
            b = float(base_m[space][met])
            if base_m is not m and b:
                row[f"{space}_{met}_drift_pct{tag}"] = round(
                    100.0 * (v - b) / b, 2)
    return row


def parent():
    import subprocess

    wanted = [(m, k) for m in MODES for k in KS
              # clipping (q...) and pinning (p...) are int8-only levers
              if not (m == "bf16" and parse_cfg(k)[2:] != (None, None, None))]
    missing = [(m, k) for (m, k) in wanted
               if not os.path.exists(_row_path(m, k))]
    group_n = int(os.environ.get("DC_ROWS_PER_CHILD", "2"))
    for i in range(0, len(missing), group_n):
        grp = missing[i:i + group_n]
        spec = ",".join(f"{m}:{k}" for m, k in grp)
        env = dict(os.environ, DC_ROWS=spec)
        for attempt in (1, 2):
            print(f"# spawning row child [{spec}] (attempt {attempt})",
                  file=sys.stderr, flush=True)
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env)
            if r.returncode == 0:
                break
            print(f"# row child [{spec}] failed rc={r.returncode}",
                  file=sys.stderr, flush=True)
            if attempt == 2:
                sys.exit(1)
            time.sleep(30)

    results = {(m, k): json.load(open(_row_path(m, k))) for m, k in wanted}
    exact = results[("bf16", "1")]
    doc = {
        "checkpoint_step": results[("bf16", "1")].get("_checkpoint_step"),
        "frames": FRAMES,
        "steps": 10,
        "note": ("drift_pct = vs bf16 exact (mode=bf16,k=1) — for int8 "
                 "rows this is the COMBINED quantization+caching "
                 "deviation; drift_pct_vs_int8 isolates caching under "
                 "quantization. Procedural HISS val frames on the "
                 "capstone checkpoint (no real DREDS in this "
                 "environment)."),
        "bf16": {k: _row(results[("bf16", k)], {"": exact})
                 for k in KS if ("bf16", k) in results},
    }
    if "int8" in MODES:
        int8_base = results[("int8", "1")]
        doc["combined_int8"] = {
            k: _row(results[("int8", k)],
                    {"": exact, "_vs_int8": int8_base})
            for k in KS
        }
    print(json.dumps(doc, indent=1))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"# wrote {OUT}", file=sys.stderr)


def child(rows):
    import jax

    from d3roma_tpu.config import compose
    from d3roma_tpu.data import fetch_dataloader
    from d3roma_tpu.evaluation import evaluate_dataset
    from d3roma_tpu.ops import Normalizer
    from d3roma_tpu.synthetic import SceneConfig, generate_dataset
    from d3roma_tpu.training.checkpoint import load_state
    from d3roma_tpu.training.state import create_train_state
    from d3roma_tpu.training.train_loop import (
        _preprocess_eval,
        build_models,
        create_pipeline,
    )

    # ensure a properly-powered eval set (the r3 sweep used 8 frames —
    # too noisy for sub-1% effects; same seed => deterministic superset)
    import glob as _glob

    val_dir = os.path.join(WORK, "datasets", "HISS", "val", "scene_0000")
    have = len(_glob.glob(os.path.join(val_dir, "*_depth.exr")))
    if have < FRAMES:
        print(f"# extending val split {have} -> {FRAMES} frames",
              file=sys.stderr)
        generate_dataset(os.path.join(WORK, "datasets", "HISS"), FRAMES,
                         "val", SceneConfig(height=360, width=640), seed=97)

    # identical model config to _scratch/capstone_ldm.py (the ckpt's run)
    base = compose([
        "task=train_ldm_mixed_rgb+raw",
        "task.train_dataset=[HISS]",
        "task.dataset_weight=[16]",
        "task.eval_dataset=[HISS]",
        "task.train_batch_size=8",
        f"task.eval_batch_size={BATCH}",
        f"task.eval_num_batch={max(1, FRAMES // BATCH)}",
        "task.mixed_precision=bf16",
        "task.optimizer=adafactor",
    ])
    config = base.task

    ckpt = os.path.join(WORK, "run", "checkpoints", "last")
    assert os.path.isdir(ckpt), (
        f"no capstone checkpoint at {ckpt} — run _scratch/capstone_ldm.py")

    models = build_models(config, jax.random.PRNGKey(0))
    template = create_train_state(config, models["unet_params"],
                                  steps_per_epoch=128)
    state, counter = load_state(ckpt, template)
    print(f"# loaded checkpoint @ step {counter.global_step}",
          file=sys.stderr)
    models = {**models, "unet_params": state.params}
    del state, template

    import dataclasses as _dc
    from functools import partial

    base_pipe = create_pipeline(config, models).half_precision()
    # remat is a training lever; at inference it only bloats the traced
    # program (a remat-laden k=5 grouped body OOM'd the host at lowering)
    base_pipe = _dc.replace(base_pipe,
                            unet=_dc.replace(base_pipe.unet, remat=False))
    normalizer = Normalizer.from_config(config)
    _, val_loaders = fetch_dataloader(config, seed=0)
    loader = val_loaders[0]
    preprocess = partial(_preprocess_eval, config=config,
                         normalizer=normalizer)

    def apply_deepcache(pipe, sched, depth):
        if isinstance(sched, str) or sched > 1 or depth != 1:
            return pipe.deepcache(sched, depth=depth)
        return pipe

    def calibrated_int8(cfg):
        """The shipped serving config at DeepCache config `cfg`,
        calibrated on the first eval batch (normalized conditions —
        exactly what eval_batch feeds __call__). A cached schedule
        calibrates ALONG THE DEPLOYED trajectory (stale trunks —
        pipeline.calibrate drives the pattern). Scales disk-cached per
        (checkpoint step, batch, cfg); q<pct> configs capture quantiles
        and clip (with_act_clipping) after loading."""
        sched, depth, clip, margin, pin_kind = parse_cfg(cfg)
        pipe = apply_deepcache(base_pipe.fast_inference("throughput"),
                               sched, depth)
        if pin_kind:
            # pinning changes REPLAY only — reuse the unpinned base
            # config's capture (same scale file)
            cfg = cfg[:cfg.rindex("p" + pin_kind)] or "1"
        tag = cfg.replace(".", "p")
        cache = os.path.join(WORK, f"dc_act_scales_step"
                                   f"{counter.global_step}_b{BATCH}"
                                   f"_k{tag}.json")
        if margin is not None and clip is None:
            # a margin ablation replays the SAME capture as the matching
            # q-config (raw absmax column) — reuse its scale file
            base_cfg = cfg[:cfg.index("m")] + "q0.999"
            alt = os.path.join(WORK, f"dc_act_scales_step"
                                     f"{counter.global_step}_b{BATCH}"
                                     f"_k{base_cfg.replace('.', 'p')}.json")
            if not os.path.exists(cache) and os.path.exists(alt):
                cache = alt
        if cfg == "1":  # pre-rework capture file (same schedule for k=1)
            for legacy in (
                    os.path.join(WORK, f"dc_act_scales_step"
                                       f"{counter.global_step}_b{BATCH}_k1.json"),
                    os.path.join(WORK, f"dc_act_scales_step"
                                       f"{counter.global_step}_b{BATCH}.json")):
                if not os.path.exists(cache) and os.path.exists(legacy):
                    cache = legacy
        if os.path.exists(cache):
            with open(cache) as f:
                pipe = _dc.replace(pipe, act_scales=json.load(f))
            print(f"# calibrated scales loaded from {cache}",
                  file=sys.stderr)
        else:
            raw = next(iter(loader))
            b = preprocess(raw)
            t0 = time.time()
            pipe = pipe.calibrate(
                jax.random.PRNGKey(99),
                [dict(rgb_images=b["normalized_rgb"],
                      sim_disp=b["sim_disp"])],
                cond_channels=config.cond_channels,
                num_inference_steps=config.num_inference_timesteps,
                # margin-only configs still need the raw-absmax capture
                # (@q col 0); capture one cheap quantile to get it
                quantiles=((clip,) if clip
                           else ((0.999,) if margin else None)),
            )
            with open(cache, "w") as f:
                json.dump(pipe.act_scales, f)
            print(f"# int8 {cfg} calibration done in "
                  f"{time.time() - t0:.0f}s -> {cache}", file=sys.stderr)
        if clip:
            pipe = pipe.with_act_clipping(percentile=clip)
        elif margin is not None:
            pipe = pipe.with_act_clipping(margin=margin)
        if pin_kind:
            pipe = pipe.with_act_clipping(
                pins=pipe.kind_pins((pin_kind,), batch=BATCH,
                                    height=360, width=640))
        return pipe

    for mode, k in rows:
        if mode == "int8":
            pipe = calibrated_int8(k)
        else:
            sched, depth, _, _, _ = parse_cfg(k)
            pipe = apply_deepcache(base_pipe, sched, depth)
        for attempt in (1, 2):
            t0 = time.time()
            try:
                # same key per (mode, k) -> identical noise draws; deltas
                # isolate the numerics change
                m, _ = evaluate_dataset(config, pipe, loader,
                                        jax.random.PRNGKey(1234),
                                        preprocess=preprocess,
                                        max_batches=config.eval_num_batch,
                                        dataset_name="HISS")
                break
            except Exception as e:  # noqa: BLE001 - relay drops happen
                print(f"# {mode} k={k} attempt {attempt} failed: "
                      f"{type(e).__name__}: {str(e)[:300]}",
                      file=sys.stderr)
                if attempt == 2:
                    raise
                time.sleep(30)
        m = {s: {kk: float(v) for kk, v in d.items()}
             if isinstance(d, dict) else d for s, d in m.items()}
        m["_checkpoint_step"] = int(counter.global_step)
        with open(_row_path(mode, k), "w") as f:
            json.dump(m, f, default=float)
        print(f"# {mode} k={k} done in {time.time() - t0:.0f}s: "
              f"epe={m['disp']['epe']:.4f} absrel={m['depth']['rel']:.4f}",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    spec = os.environ.get("DC_ROWS")
    if spec:
        child([(m, k) for m, k in
               (item.split(":") for item in spec.split(","))])
    else:
        parent()
