"""Point-cloud construction and .ply export.

The reference builds clouds with Open3D (reference:
utils_d3roma/utils.py:753-775, utils_d3roma/camera.py:142-178,
utils_d3roma/realsense.py:85-127). Open3D is not a framework dependency
here: back-projection is plain (vectorizable, jittable) math and PLY
export is a ~30-line writer. Voxel downsampling reproduces Open3D's
voxel-average semantics with a numpy grid hash.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def backproject_depth(
    depth: np.ndarray, K: np.ndarray, rgb: Optional[np.ndarray] = None,
    mask: Optional[np.ndarray] = None,
):
    """depth [H,W] (meters) + intrinsics -> points [N,3] (+colors [N,3]).

    Equivalent to Open3D's create_from_rgbd_image with depth_scale=1
    (reference: camera.py:160-178).
    """
    H, W = depth.shape[:2]
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    z = depth.astype(np.float32)
    valid = z > 0
    if mask is not None:
        valid &= mask.astype(bool)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    x = (xs - cx) * z / fx
    y = (ys - cy) * z / fy
    pts = np.stack([x[valid], y[valid], z[valid]], axis=1)
    if rgb is not None:
        cols = rgb.reshape(H * W, -1)[valid.ravel()]
        return pts, cols
    return pts, None


def transform_points(pts: np.ndarray, T: np.ndarray) -> np.ndarray:
    return pts @ T[:3, :3].T + T[:3, 3]


def voxel_downsample(
    pts: np.ndarray, colors: Optional[np.ndarray], voxel_size: float
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Average points (and colors) per occupied voxel (Open3D
    voxel_down_sample semantics — reference: realsense.py:104-110)."""
    if len(pts) == 0:
        return pts, colors
    keys = np.floor(pts / voxel_size).astype(np.int64)
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
    n = counts.shape[0]
    out = np.zeros((n, 3), np.float64)
    np.add.at(out, inv, pts)
    out /= counts[:, None]
    out_c = None
    if colors is not None:
        out_c = np.zeros((n, colors.shape[1]), np.float64)
        np.add.at(out_c, inv, colors)
        out_c /= counts[:, None]
    return out.astype(np.float32), None if out_c is None else out_c


def write_ply(path: str, pts: np.ndarray, colors: Optional[np.ndarray] = None) -> None:
    """Binary little-endian PLY with optional uint8 colors."""
    n = len(pts)
    has_color = colors is not None
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if has_color:
        header += ["property uchar red", "property uchar green", "property uchar blue"]
    header.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if has_color:
            c = colors
            if c.dtype != np.uint8:
                # n == 0: c.max() on a zero-size array raises; an empty
                # .ply (header only) is the right artifact
                scale = 255.0 if (c.size and c.max() <= 1.0 + 1e-6) else 1.0
                c = np.clip(c * scale, 0, 255).astype(np.uint8)
            dt = np.dtype([("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
            rec = np.empty(n, dt)
            rec["xyz"] = pts.astype(np.float32)
            rec["rgb"] = c[:, :3]
            rec.tofile(f)
        else:
            pts.astype(np.float32).tofile(f)


def read_ply(path: str):
    """Minimal reader for the files written by `write_ply` (tests/tools)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        n = int(next(h.split()[-1] for h in header if h.startswith("element vertex")))
        has_color = any("uchar red" in h for h in header)
        if has_color:
            dt = np.dtype([("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
            rec = np.fromfile(f, dt, n)
            return rec["xyz"].copy(), rec["rgb"].copy()
        pts = np.fromfile(f, np.float32, n * 3).reshape(n, 3)
        return pts, None


def viz_cropped_pointcloud(
    K: np.ndarray, rgb: np.ndarray, depth: np.ndarray, fname: str,
    mask: Optional[np.ndarray] = None,
) -> None:
    """Depth+RGB -> .ply on disk (reference: utils_d3roma/utils.py:753-775)."""
    pts, cols = backproject_depth(depth, K, rgb, mask)
    write_ply(fname, pts, cols)
