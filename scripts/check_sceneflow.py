#!/usr/bin/env python
"""SceneFlow raw-disparity quality filter.

Rebuild of the reference checker (reference: scripts/check_sceneflow.py:
54-86): per frame, compute precision (fraction of valid raw pixels within
1px of GT) and recall (fraction of GT pixels covered by valid raw) of the
precomputed SGM disparity vs ground truth; frames with precision < 0.2 go
into the `bad_his.txt` exclusion list consumed at dataset load.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check(pairs, out_file: str, precision_threshold: float = 0.2, px: float = 1.0):
    """pairs: list of (left_png_path, gt_disp, sim_disp) arrays or paths."""
    from d3roma_tpu.utils import frame_utils

    bad = []
    for item in pairs:
        path, gt, sim = item
        if isinstance(gt, str):
            gt = np.asarray(frame_utils.read_gen(gt), np.float32)
        if isinstance(sim, str):
            sim = np.asarray(frame_utils.read_gen(sim), np.float32)
        valid_sim = (sim > 0) & np.isfinite(sim)
        valid_gt = (gt > 0) & np.isfinite(gt)
        close = np.abs(sim - gt) < px
        tp = (valid_sim & valid_gt & close).sum()
        precision = tp / max(1, valid_sim.sum())
        recall = tp / max(1, valid_gt.sum())
        print(f"precision={precision:.3f} recall={recall:.3f} {path}")
        if precision < precision_threshold:
            bad.append(path)
    with open(out_file, "w") as f:
        f.write("\n".join(bad))
    print(f"{len(bad)} bad frames -> {out_file}")
    return bad


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="datasets/SceneFlow")
    p.add_argument("--dstype", default="frames_cleanpass")
    p.add_argument("--out", default="bad_his.txt")
    p.add_argument("--threshold", type=float, default=0.2)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    import glob

    lefts = sorted(glob.glob(
        os.path.join(args.root, "**", args.dstype, "**/left/*.png"), recursive=True
    ))
    if args.limit:
        lefts = lefts[: args.limit]
    pairs = []
    for lf in lefts:
        gt = lf.replace(args.dstype, "disparity").replace(".png", ".pfm")
        sim = lf.replace(args.dstype, args.dstype.replace("frames", "raw")).replace(".png", ".pfm")
        if os.path.exists(gt) and os.path.exists(sim):
            pairs.append((lf, gt, sim))
    check(pairs, args.out, args.threshold)


if __name__ == "__main__":
    main()
