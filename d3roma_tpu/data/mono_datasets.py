"""Monocular RGB-D datasets (pseudo-disparity from depth).

Rebuild of the reference mono zoo (reference: data/mono_datasets.py,
data/dataset.py): RGB + depth (+mask) items, RandomResizedCrop/hflip aug,
pseudo-baseline fxb=24 so raw_disp = fxb / depth
(mono_datasets.py:73-74), percentile depth normalization handled on device,
and bad-sample skip-and-retry (mono_datasets.py:48-51).
"""

from __future__ import annotations

import glob
import os.path as osp
from typing import List

import numpy as np

from d3roma_tpu.data.datasets import BaseDataset, _to_rgb3
from d3roma_tpu.utils import frame_utils

PSEUDO_FXB = 24.0  # reference: data/mono_datasets.py:73


def _cv2():
    import cv2

    cv2.setNumThreads(0)
    return cv2


class MonoDataset(BaseDataset):
    """Base: rgb + depth (+valid) -> raw item dict with pseudo disparity."""

    def __init__(self, image_size, split="train", seed=None,
                 resizedcrop_scale=(0.6, 1.0), resizedcrop_ratio=(1.0, 4 / 3)):
        self.image_size = tuple(image_size)
        self.split = split
        self.rng = np.random.default_rng(seed)
        self.rgb_list: List[str] = []
        self.depth_list: List[str] = []
        self.mask_list: List[str] = []
        self.scale = resizedcrop_scale
        self.ratio = resizedcrop_ratio

    def __len__(self):
        return len(self.rgb_list)

    # per-dataset raw loading; override as needed
    def _load(self, index):
        rgb = _to_rgb3(np.array(frame_utils.read_gen(self.rgb_list[index])).astype(np.uint8))
        depth = np.asarray(frame_utils.read_gen(self.depth_list[index]), np.float32)
        if depth.ndim == 3:
            depth = depth[..., 0]
        mask = None
        if self.mask_list:
            mask = np.asarray(frame_utils.read_gen(self.mask_list[index])) > 0
        return rgb, depth, mask

    def _resized_crop(self, rgb, depth, mask):
        """torchvision RandomResizedCrop semantics
        (reference: data/dataset.py:24-69)."""
        cv2 = _cv2()
        H, W = rgb.shape[:2]
        th, tw = self.image_size
        area = H * W
        for _ in range(10):
            target_area = area * self.rng.uniform(*self.scale)
            ar = np.exp(self.rng.uniform(np.log(self.ratio[0]), np.log(self.ratio[1])))
            w = int(round(np.sqrt(target_area * ar)))
            h = int(round(np.sqrt(target_area / ar)))
            if 0 < w <= W and 0 < h <= H:
                y0 = int(self.rng.integers(0, H - h + 1))
                x0 = int(self.rng.integers(0, W - w + 1))
                break
        else:
            w, h = min(W, int(H * self.ratio[0])), H
            y0, x0 = 0, (W - w) // 2
        rgb = cv2.resize(rgb[y0:y0 + h, x0:x0 + w], (tw, th), interpolation=cv2.INTER_LINEAR)
        depth = cv2.resize(depth[y0:y0 + h, x0:x0 + w], (tw, th), interpolation=cv2.INTER_NEAREST)
        if mask is not None:
            mask = cv2.resize(mask[y0:y0 + h, x0:x0 + w].astype(np.uint8), (tw, th),
                              interpolation=cv2.INTER_NEAREST) > 0
        return rgb, depth, mask

    def _center_fit(self, rgb, depth, mask):
        cv2 = _cv2()
        th, tw = self.image_size
        rgb = cv2.resize(rgb, (tw, th), interpolation=cv2.INTER_LINEAR)
        depth = cv2.resize(depth, (tw, th), interpolation=cv2.INTER_NEAREST)
        if mask is not None:
            mask = cv2.resize(mask.astype(np.uint8), (tw, th),
                              interpolation=cv2.INTER_NEAREST) > 0
        return rgb, depth, mask

    def __getitem__(self, index):
        index = index % len(self)
        # bad-sample skip-and-retry (reference: mono_datasets.py:48-51)
        for attempt in range(4):
            try:
                rgb, depth, mask = self._load((index + attempt) % len(self))
                break
            except Exception:
                continue
        else:
            raise RuntimeError(f"failed to load sample near index {index}")

        if mask is None:
            mask = (depth > 0) & np.isfinite(depth)
        else:
            mask = mask & (depth > 0) & np.isfinite(depth)
        depth = np.nan_to_num(depth, nan=0.0, posinf=0.0, neginf=0.0)

        if self.split == "train":
            if self.rng.random() < 0.5:
                rgb, depth, mask = rgb[:, ::-1], depth[:, ::-1], mask[:, ::-1]
            rgb, depth, mask = self._resized_crop(rgb, depth, mask)
        else:
            rgb, depth, mask = self._center_fit(rgb, depth, mask)

        disp = np.where(mask, PSEUDO_FXB / np.maximum(depth, 1e-6), 0.0)
        zeros = np.zeros_like(rgb, np.float32)
        return {
            "disp": disp[..., None].astype(np.float32),
            "valid": mask[..., None].astype(np.float32),
            "depth": depth[..., None].astype(np.float32),
            "raw_depth": depth[..., None].astype(np.float32),
            "rgb": rgb.astype(np.float32),
            "left": zeros,
            "right": zeros,
            "fxb": np.float32(PSEUDO_FXB),
            "K": np.eye(3, dtype=np.float32),
            "index": np.int32(index),
            "path": self.rgb_list[index],
            "device": "mono",
        }


class NYUv2(MonoDataset):
    """Official h5 splits with the eigen crop
    (reference: data/mono_datasets.py:351-405)."""

    EIGEN_CROP = (45, 471, 41, 601)

    def __init__(self, image_size, split="train", root="datasets/nyu_depth_v2", seed=None):
        super().__init__(image_size, split, seed)
        sub = "official_splits/train" if split == "train" else "official_splits/test"
        self.h5_list = sorted(glob.glob(osp.join(root, sub, "**/*.h5"), recursive=True))
        self.rgb_list = self.h5_list  # len() proxy

    def _load(self, index):
        import h5py

        with h5py.File(self.h5_list[index], "r") as f:
            rgb = np.transpose(np.asarray(f["rgb"]), (1, 2, 0)).astype(np.uint8)
            depth = np.asarray(f["depth"]).astype(np.float32)
        t, b, l, r = self.EIGEN_CROP
        return rgb[t:b, l:r], depth[t:b, l:r], None


class HyperSim(MonoDataset):
    """Distance -> planar depth conversion (reference:
    data/mono_datasets.py:196-248)."""

    def __init__(self, image_size, split="train", root="datasets/hypersim", seed=None):
        super().__init__(image_size, split, seed)
        self.rgb_list = sorted(glob.glob(osp.join(root, split, "**/*.tonemap.jpg"), recursive=True))
        self.depth_list = [p.replace(".tonemap.jpg", ".depth_meters.hdf5") for p in self.rgb_list]

    def _load(self, index):
        import h5py

        rgb = _to_rgb3(np.array(frame_utils.read_gen(self.rgb_list[index])).astype(np.uint8))
        with h5py.File(self.depth_list[index], "r") as f:
            dist = np.asarray(f["dataset"]).astype(np.float32)
        # optical-center distance -> planar depth
        H, W = dist.shape
        focal = 886.81  # HyperSim intrinsics
        xs = np.linspace(-0.5 * W + 0.5, 0.5 * W - 0.5, W)
        ys = np.linspace(-0.5 * H + 0.5, 0.5 * H - 0.5, H)
        xg, yg = np.meshgrid(xs, ys)
        planar = dist / np.sqrt(xg**2 + yg**2 + focal**2) * focal
        return rgb, planar.astype(np.float32), None


def _simple_mono(name, rgb_glob, depth_fn):
    """Factory for file-listing mono datasets (ScanNet, VK2 etc. —
    reference: data/mono_datasets.py:113-477)."""

    class _DS(MonoDataset):
        def __init__(self, image_size, split="train", root=f"datasets/{name}", seed=None):
            super().__init__(image_size, split, seed)
            self.rgb_list = sorted(glob.glob(osp.join(root, split, rgb_glob), recursive=True))
            self.depth_list = [depth_fn(p) for p in self.rgb_list]

    _DS.__name__ = name
    return _DS


ScanNet = _simple_mono("ScanNet", "**/color/*.jpg",
                       lambda p: p.replace("/color/", "/depth/").replace(".jpg", ".png"))
ScanNetpp = _simple_mono("ScanNetpp", "**/rgb/*.jpg",
                         lambda p: p.replace("/rgb/", "/depth/").replace(".jpg", ".png"))
SceneNet = _simple_mono("SceneNet", "**/photo/*.jpg",
                        lambda p: p.replace("/photo/", "/depth/").replace(".jpg", ".png"))
VK2 = _simple_mono("VK2", "**/rgb/*.jpg",
                   lambda p: p.replace("/rgb/", "/depth/").replace("rgb_", "depth_").replace(".jpg", ".png"))
KITTI = _simple_mono("KITTI", "**/image_02/data/*.png",
                     lambda p: p.replace("/image_02/data/", "/proj_depth/groundtruth/image_02/"))
InStereo2K = _simple_mono("InStereo2K", "**/left.png",
                          lambda p: p.replace("left.png", "left_disp.png"))
Tartenair = _simple_mono("Tartenair", "**/image_left/*.png",
                         lambda p: p.replace("/image_left/", "/depth_left/").replace(".png", "_depth.npy"))
HRWSI = _simple_mono("HRWSI", "imgs/*.jpg",
                     lambda p: p.replace("/imgs/", "/gts/").replace(".jpg", ".png"))
SynTODD = _simple_mono("SynTODD", "*_rgb.png",
                       lambda p: p.replace("_rgb.png", "_gt_depth.exr"))
