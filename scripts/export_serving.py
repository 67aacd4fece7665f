#!/usr/bin/env python
"""Export an AOT serving artifact for a pipeline directory.

Writes `<out>/{program.jaxexport,manifest.json}` — the traced+lowered
serving program at a pinned signature (serving/aot.py). Parameters stay
in the pipeline directory; the artifact carries only the program, and can
be lowered for a platform this host doesn't have (`--platforms tpu`).

Example (the flagship release serving setting):
  python scripts/export_serving.py --pipeline-dir _exports/flagship \\
      --batch 16 --height 360 --width 640 --steps 10 \\
      --fast-inference throughput --platforms tpu
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pipeline-dir", required=True,
                    help="directory written by save_pretrained")
    ap.add_argument("--out", default=None,
                    help="artifact dir (default: <pipeline-dir>/serving_<tag>)")
    ap.add_argument("--batch", type=int, default=16,
                    help="TOTAL pipeline batch (frames x rounds)")
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--intermediates", type=int, default=1)
    ap.add_argument("--cond-channels", default="rgb+raw")
    ap.add_argument("--depth-channels", type=int, default=1,
                    help="pixel family only")
    ap.add_argument("--fast-inference", default="off",
                    choices=["off", "throughput", "latency", "wino"])
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms, e.g. 'tpu' "
                         "or 'tpu,cpu' (default: the current backend)")
    args = ap.parse_args()

    from d3roma_tpu.pipelines import (
        GuidedDiffusionPipeline,
        GuidedLatentDiffusionPipeline,
    )
    from d3roma_tpu.serving import ServingSignature, save_serving

    with open(os.path.join(args.pipeline_dir, "model_index.json")) as f:
        meta = json.load(f)
    is_latent = meta["pipeline_class"] == "GuidedLatentDiffusionPipeline"
    cls = GuidedLatentDiffusionPipeline if is_latent else GuidedDiffusionPipeline
    pipe = cls.from_pretrained(args.pipeline_dir)
    if args.fast_inference != "off":
        if not hasattr(pipe, "fast_inference"):
            ap.error("--fast-inference applies to the latent family only")
        pipe = pipe.fast_inference(args.fast_inference)

    sig = ServingSignature(
        batch=args.batch, height=args.height, width=args.width,
        num_inference_steps=args.steps,
        num_intermediate_images=args.intermediates,
        cond_channels=args.cond_channels,
        depth_channels=args.depth_channels,
    )
    out = args.out or os.path.join(
        args.pipeline_dir,
        f"serving_{args.width}x{args.height}_b{args.batch}_s{args.steps}")
    platforms = args.platforms.split(",") if args.platforms else None
    save_serving(pipe, out, sig, platforms=platforms)
    print(f"serving artifact written to {out}")
    print(json.dumps(sig.to_json()))


if __name__ == "__main__":
    main()
