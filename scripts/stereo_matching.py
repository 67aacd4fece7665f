#!/usr/bin/env python
"""Offline "sim depth" generation over a dataset tree.

CLI rebuild of the reference generator (reference:
scripts/stereo_matching.py:521-618): walks scenes of `*_ir_l.png` /
`*_ir_r.png` pairs, runs the TPU-batched NCC block matcher, and writes
`*_simDepthImage.exr` + `*_simDispImage.png` next to the inputs. Defaults
match the reference HISS run: fx=446.31, baseline=0.055, maxDisp=110,
block=11 (stereo_matching.py:521-536,604-605). Batches frames through one
jitted program instead of the reference's per-file loop.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("root", help="dataset tree containing *_ir_l.png pairs")
    p.add_argument("--fx", type=float, default=446.31)
    p.add_argument("--baseline", type=float, default=0.055)
    p.add_argument("--min-disp", type=int, default=10)
    p.add_argument("--max-disp", type=int, default=110)
    p.add_argument("--block", type=int, default=11)
    p.add_argument("--beta", type=float, default=100.0)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--overwrite", action="store_true")
    args = p.parse_args(argv)

    import cv2
    import jax.numpy as jnp

    from d3roma_tpu.ops.stereo import stereo_match

    lefts = sorted(glob.glob(os.path.join(args.root, "**/*_ir_l.png"), recursive=True))
    pairs = []
    for lf in lefts:
        rf = lf.replace("_ir_l.png", "_ir_r.png")
        out = lf.replace("_ir_l.png", "_simDepthImage.exr")
        if os.path.exists(rf) and (args.overwrite or not os.path.exists(out)):
            pairs.append((lf, rf, out))
    print(f"{len(pairs)} pairs to process")

    fxb = args.fx * args.baseline
    for i in range(0, len(pairs), args.batch):
        chunk = pairs[i : i + args.batch]
        imgs_l, imgs_r = [], []
        for lf, rf, _ in chunk:
            imgs_l.append(cv2.imread(lf, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0)
            imgs_r.append(cv2.imread(rf, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0)
        L = jnp.asarray(np.stack(imgs_l))[..., None]
        R = jnp.asarray(np.stack(imgs_r))[..., None]
        out = stereo_match(L, R, fxb, args.min_disp, args.max_disp,
                           args.block, args.beta)
        depth = np.asarray(out.depth)
        disp = np.asarray(out.disp)
        from d3roma_tpu.utils.exr import write_exr

        for j, (lf, rf, out_path) in enumerate(chunk):
            write_exr(out_path, depth[j].astype(np.float32))
            disp_png = np.clip(disp[j], 0, 255).astype(np.uint8)
            cv2.imwrite(out_path.replace("_simDepthImage.exr", "_simDispImage.png"), disp_png)
        print(f"[{i + len(chunk)}/{len(pairs)}] wrote {len(chunk)} sim depth maps")


if __name__ == "__main__":
    main()
