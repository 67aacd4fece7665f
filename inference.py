#!/usr/bin/env python
"""Single-frame inference demo — the reference output-file contract.

    python inference.py [--variant rgb+raw|left+right+raw] [--assets DIR]

Runs D3RoMa on the bundled example frames (``assets/examples/0000_*``),
writing ``_outputs.<variant>/pred.png`` (Spectral colormap), ``pred.ply``
and ``raw.ply`` (reference: inference.py:253-322).
"""

import argparse
import logging
import os
import sys

import numpy as np

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("inference")

_REPO_ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "assets", "examples")
DEFAULT_ASSET_DIRS = ("assets/examples", _REPO_ASSETS)


def find_assets(explicit=None):
    for d in ([explicit] if explicit else []) + list(DEFAULT_ASSET_DIRS):
        if d and os.path.exists(os.path.join(d, "0000_rgb.png")):
            return d
    # bare checkout without the committed frames: generate them
    # procedurally (reference bundles assets/examples/0000_*,
    # inference.py:283-288 — here the demo is self-sufficient)
    from d3roma_tpu.synthetic.procedural import generate_example_assets

    logger.info("generating procedural demo assets -> %s", _REPO_ASSETS)
    return generate_example_assets(_REPO_ASSETS)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="rgb+raw",
                   choices=["rgb+raw", "left+right+raw"])
    p.add_argument("--assets", default=None)
    p.add_argument("--pretrained", default=None,
                   help="exported pipeline dir (task.resume_pretrained)")
    p.add_argument("overrides", nargs="*", default=[])
    args = p.parse_args(argv)

    import cv2

    from d3roma_tpu.inference import D3RoMa
    from d3roma_tpu.utils.camera import Realsense
    from d3roma_tpu.utils.pointcloud import backproject_depth, write_ply
    from d3roma_tpu.utils.viz import save_colorized

    camera = Realsense.default_real("fxm")
    preset = ("task=eval_ldm_mixed_rgb+raw" if args.variant == "rgb+raw"
              else "task=eval_ldm_mixed")
    # demo defaults go BEFORE the user's overrides so an explicit
    # task.image_size / task.num_inference_timesteps on the CLI wins
    overrides = [preset, "task.image_size=[360,640]",
                 "task.num_inference_timesteps=10"] + list(args.overrides)
    if args.pretrained:
        overrides.append(f"task.resume_pretrained={args.pretrained}")

    droma = D3RoMa(overrides, camera, variant=args.variant)

    assets = find_assets(args.assets)
    rgb = cv2.cvtColor(cv2.imread(os.path.join(assets, "0000_rgb.png")), cv2.COLOR_BGR2RGB)
    depth_raw = cv2.imread(os.path.join(assets, "0000_depth.png"), cv2.IMREAD_ANYDEPTH)
    depth_m = depth_raw.astype(np.float32) / 1000.0  # mm -> m

    if args.variant == "rgb+raw":
        # align raw depth into the color frame (reference: inference.py:290-298)
        aligned = camera.transform_depth_to_rgb_frame(depth_m)
        save_colorized(os.path.join(droma.eval_output_dir, "raw_aligned.png"), aligned)
        pred_depth = droma.infer_with_rgb_raw(rgb, aligned)
    else:
        left = cv2.imread(os.path.join(assets, "0000_ir_l.png"), cv2.IMREAD_GRAYSCALE)
        right = cv2.imread(os.path.join(assets, "0000_ir_r.png"), cv2.IMREAD_GRAYSCALE)
        pred_depth = droma.infer(left, right, raw_depth=depth_m, rgb=rgb)

    out_dir = droma.eval_output_dir
    save_colorized(os.path.join(out_dir, "pred.png"), pred_depth)

    K = camera.K.arr
    rgb_resized = cv2.resize(rgb, camera.resolution[::-1])
    # backproject the COLOR-FRAME-aligned raw depth (what the model
    # consumed) with the color intrinsics: the raw depth-frame map would
    # be misprojected by the depth->color extrinsics and inconsistent
    # with pred.ply
    raw_src = aligned if args.variant == "rgb+raw" else depth_m
    raw_resized = cv2.resize(raw_src, camera.resolution[::-1],
                             interpolation=cv2.INTER_NEAREST)
    pts, cols = backproject_depth(raw_resized, K, rgb_resized)
    write_ply(os.path.join(out_dir, "raw.ply"), pts, cols)
    pts, cols = backproject_depth(pred_depth, K, rgb_resized)
    write_ply(os.path.join(out_dir, "pred.ply"), pts, cols)
    logger.info("wrote %s/{pred.png, pred.ply, raw.ply}", out_dir)


if __name__ == "__main__":
    main(sys.argv[1:])
