"""Startup compile-probe for the streaming deployment.

The fastest measured batch-1 streaming config (bf16, 106 ms/frame) is not
always COMPILABLE on this platform: the remote compile helper has crashed
on the bf16 batch-1 5-step scan with a persistent HTTP 500 while the
dense-int8 variant of the same program compiled fine
(docs/PERFORMANCE.md, round 3-4). Round 4 hand-re-verified that outage
every session; this module automates it: at serving startup, candidate
configs are compile-probed IN A KILLABLE CHILD PROCESS (a dead relay can
hang a compile forever with 0%% CPU — in-process probing would hang the
server), in measured-speed preference order, and the first config that
compiles wins. The probe outcome ships in the server's /metrics and is
appended to .bench_cache/results.jsonl so perf logs stop relying on
hand-run checks.

No reference analog (the reference assumes CUDA always compiles); this is
TPU-deployment plumbing.
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time
from typing import List, Optional, Sequence

logger = logging.getLogger(__name__)

#: streaming candidates in measured-speed preference order at batch 1
#: (docs/PERFORMANCE.md: bf16 106 ms > dense-int8 118 ms > static 242 ms)
STREAMING_CANDIDATES = ("latency", "dense", "throughput")

_CANDIDATE_OVERRIDES = {
    "latency": ["task.fast_inference=latency"],
    "dense": ["task.fast_inference=dense"],
    "throughput": ["task.fast_inference=throughput"],
}


def probe_child_main(argv: Optional[List[str]] = None) -> int:
    """Child entry: build the serving pipeline at the candidate config and
    push ONE frame through it (the cold trace+compile IS the probe).
    Exit 0 = the config compiles and runs."""
    import argparse

    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    from d3roma_tpu.inference import D3RoMa
    from d3roma_tpu.utils.camera import Realsense

    droma = D3RoMa(args.overrides, Realsense.default_real("fxm"),
                   variant="rgb+raw")
    rgb = np.zeros((args.height, args.width, 3), np.uint8)
    raw = np.ones((args.height, args.width), np.float32)
    frames = [(rgb, raw)] * args.batch
    out = droma.infer_with_rgb_raw_batch(frames)
    assert len(out) == args.batch and np.all(np.isfinite(out[0]))
    print("probe ok", flush=True)
    return 0


def select_streaming_mode(
    overrides: Sequence[str],
    candidates: Sequence[str] = STREAMING_CANDIDATES,
    timeout_s: float = 2400.0,
    batch: int = 1,
    height: int = 360,
    width: int = 640,
    records_path: Optional[str] = None,
) -> dict:
    """Compile-probe `candidates` in order; return
    ``{"mode": <winner or None>, "overrides": [...], "probe": [...]}``.

    Each candidate runs in a subprocess (killed at `timeout_s` — a hung
    relay compile burns a slot, not the server). `overrides` are the
    caller's config overrides; the candidate's are appended after them so
    the probe compiles exactly what serving would run. The winning
    candidate's full override list is returned for the caller to build
    the real pipeline with (its compile is then warm from the probe via
    the persistent compile cache, when configured)."""
    results = []
    winner = None
    win_overrides = list(overrides)
    for cand in candidates:
        extra = _CANDIDATE_OVERRIDES[cand]
        cmd = [sys.executable, "-m", "d3roma_tpu.streaming.probe",
               "--height", str(height), "--width", str(width),
               "--batch", str(batch)] + list(overrides) + extra
        t0 = time.time()
        try:
            r = subprocess.run(cmd, timeout=timeout_s, capture_output=True)
            ok = r.returncode == 0
            err = ("" if ok else
                   (r.stderr or b"").decode(errors="replace")[-300:])
        except subprocess.TimeoutExpired:
            ok, err = False, f"probe timed out after {timeout_s:.0f}s"
        dt = time.time() - t0
        results.append({"mode": cand, "ok": ok,
                        "seconds": round(dt, 1),
                        **({"error": err} if err else {})})
        logger.info("streaming probe %s: %s in %.1fs",
                    cand, "ok" if ok else "FAILED", dt)
        if ok:
            winner = cand
            win_overrides = list(overrides) + extra
            break
    out = {"mode": winner, "overrides": win_overrides, "probe": results}
    _record(out, records_path)
    return out


def _record(outcome: dict, records_path: Optional[str]) -> None:
    path = records_path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".bench_cache", "results.jsonl")
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "a") as f:
            f.write(json.dumps({"kind": "streaming_probe",
                                "ts": int(time.time()), **outcome}) + "\n")
    except OSError as e:  # records are best-effort telemetry
        logger.warning("streaming probe record write failed: %s", e)


if __name__ == "__main__":
    sys.exit(probe_child_main())
