#!/usr/bin/env python
"""Serve the D3RoMa rgb+raw depth-restoration model over HTTP.

The non-ROS deployment front end (streaming/http_server.py): concurrent
client requests micro-batch into one batched pipeline call. Pair with
`task.aot_cache=...` so restarts skip the trace+compile cold start.

  python scripts/serve_http.py --port 8080 -- \\
      task=eval_ldm_mixed_rgb+raw task.resume_pretrained=... \\
      task.fast_inference=throughput

Client:
  import numpy as np, io, urllib.request
  buf = io.BytesIO(); np.savez_compressed(buf, rgb=rgb, raw_depth=raw)
  r = urllib.request.urlopen(urllib.request.Request(
      "http://host:8080/v1/infer_rgb_raw", buf.getvalue(), method="POST"))
  depth = np.load(io.BytesIO(r.read()))["depth"]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--max-wait-ms", type=float, default=25.0)
    ap.add_argument("--auto-mode", action="store_true",
                    help="compile-probe the streaming configs "
                         "(latency > dense > throughput) in a killable "
                         "child and serve the fastest one that compiles "
                         "(the bf16 batch-1 program is not always "
                         "compilable on this platform — "
                         "docs/PERFORMANCE.md); probe outcome lands in "
                         "/metrics")
    ap.add_argument("--probe-timeout", type=float, default=2400.0)
    ap.add_argument("overrides", nargs="*",
                    help="config overrides (task=..., task.*=...)")
    args = ap.parse_args()

    from d3roma_tpu.inference import D3RoMa
    from d3roma_tpu.streaming import InferenceHTTPServer
    from d3roma_tpu.utils.camera import Realsense

    import numpy as np

    overrides = list(args.overrides)
    probe_info = None
    if args.auto_mode:
        from d3roma_tpu.streaming.probe import select_streaming_mode

        sel = select_streaming_mode(overrides, batch=args.max_batch,
                                    timeout_s=args.probe_timeout)
        probe_info = sel
        if sel["mode"] is None:
            print("# streaming probe: NO candidate compiled; serving the "
                  "caller's config as-is", flush=True)
        else:
            print(f"# streaming probe selected mode={sel['mode']}",
                  flush=True)
            overrides = sel["overrides"]

    droma = D3RoMa(overrides, Realsense.default_real("fxm"),
                   variant="rgb+raw")
    # one synthetic frame drives the cold trace+compile before /healthz
    # reports ready (any HxW works — the server resizes on ingest)
    warm = (np.zeros((360, 640, 3), np.uint8),
            np.ones((360, 640), np.float32))
    server = InferenceHTTPServer(
        droma.infer_with_rgb_raw_batch, max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms, host=args.host, port=args.port,
        warmup_input=warm, probe_info=probe_info)
    port = server.start()
    print(f"serving on http://{args.host}:{port} "
          f"(POST /v1/infer_rgb_raw, GET /healthz /metrics)", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
