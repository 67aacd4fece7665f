#!/usr/bin/env python
"""Dataset-quality check by photometric re-warping.

Rebuild of the reference checker (reference: scripts/check_stereo.py:
104-187): for each sample, warp the right image into the left view by the
GT and by the sim disparity, compare L1 photometric losses, and write a
`bad_his.txt` exclusion list of samples whose sim disparity photometric
loss is anomalously worse than GT's.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check(dataset, out_file: str, ratio: float = 2.0, limit=None):
    """Returns the list of bad sample paths and writes them to out_file."""
    import jax.numpy as jnp

    from d3roma_tpu.ops.warp import warp_right_to_left

    bad = []
    n = len(dataset) if limit is None else min(limit, len(dataset))
    for i in range(n):
        item = dataset[i]
        left = jnp.asarray(item["left"])[None] / 255.0
        right = jnp.asarray(item["right"])[None] / 255.0
        disp_gt = jnp.asarray(item["disp"][..., 0])[None]
        valid = np.asarray(item["valid"][..., 0]) > 0

        fxb = float(item["fxb"])
        raw_depth = np.asarray(item["raw_depth"][..., 0])
        disp_sim = np.where(raw_depth > 0, fxb / np.maximum(raw_depth, 1e-6), 0.0)

        w_gt = np.asarray(warp_right_to_left(right, disp_gt))[0]
        w_sim = np.asarray(warp_right_to_left(right, jnp.asarray(disp_sim)[None]))[0]
        l = np.asarray(left)[0]

        loss_gt = np.abs(l - w_gt)[valid].mean() if valid.any() else 0.0
        loss_sim = np.abs(l - w_sim)[valid].mean() if valid.any() else 0.0
        print(f"[{i}] photometric L1 gt={loss_gt:.4f} sim={loss_sim:.4f} {item['path']}")
        if loss_gt > 0 and loss_sim > ratio * loss_gt:
            bad.append(item["path"])

    with open(out_file, "w") as f:
        f.write("\n".join(bad))
    print(f"{len(bad)} bad samples -> {out_file}")
    return bad


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="HISS")
    p.add_argument("--root", default="datasets/HISS")
    p.add_argument("--split", default="train")
    p.add_argument("--out", default="bad_his.txt")
    p.add_argument("--ratio", type=float, default=2.0)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    from d3roma_tpu.config import TrainingConfig
    from d3roma_tpu.data import create_dataset

    cfg = TrainingConfig(camera_resolution="480x270", image_size=(270, 480))
    ds = create_dataset(cfg, args.dataset, args.split)
    check(ds, args.out, args.ratio, args.limit)


if __name__ == "__main__":
    main()
