"""Frame sources for the streaming pipeline.

The reference couples capture directly to pyrealsense2
(reference: utils_d3roma/realsense.py:16-83, inference_pub_pcl.py:262-442).
Here capture is behind a small `FrameSource` protocol so the same
processor runs against live RealSense hardware, ROS image topics, or a
file-replay source (which is also how the streaming loop is tested
hermetically — the fake backend the reference lacks, SURVEY §4.5).
"""

from __future__ import annotations

import glob
import os
import time
from typing import Iterator, Optional, Tuple

import numpy as np

Frame = Tuple[np.ndarray, np.ndarray]  # (rgb uint8 HxWx3, depth float32 m)


class FrameSource:
    def frames(self) -> Iterator[Frame]:
        raise NotImplementedError

    def close(self) -> None:
        pass


class FileReplaySource(FrameSource):
    """Replays color / `*_depth.png` (mm) pairs from a directory,
    optionally looping at a fixed rate. Accepts both capture namings:
    `*_color.png` and the bundled-capture `*_rgb.png`
    (datasets/Real/xiaomeng; reference naming, stereo_datasets.py:834)."""

    def __init__(self, root: str, fps: Optional[float] = None, loop: bool = False):
        self._color_tag = "_color.png"
        self.color_files = sorted(glob.glob(os.path.join(root, "*_color.png")))
        if not self.color_files:
            self._color_tag = "_rgb.png"
            self.color_files = sorted(glob.glob(os.path.join(root, "*_rgb.png")))
        if not self.color_files:
            raise FileNotFoundError(
                f"no *_color.png or *_rgb.png frames under {root}")
        self.fps = fps
        self.loop = loop

    def frames(self) -> Iterator[Frame]:
        import cv2

        while True:
            for cf in self.color_files:
                bgr = cv2.imread(cf)
                if bgr is None:
                    raise FileNotFoundError(f"unreadable color frame: {cf}")
                rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
                df = cf.replace(self._color_tag, "_depth.png")
                d = cv2.imread(df, cv2.IMREAD_ANYDEPTH)
                if d is None:
                    raise FileNotFoundError(f"missing/unreadable depth frame: {df}")
                depth = d.astype(np.float32) / 1000.0
                yield rgb, depth
                if self.fps:
                    time.sleep(1.0 / self.fps)
            if not self.loop:
                return


class RealSenseSource(FrameSource):
    """Live capture via RealSenseRGBDCamera (requires pyrealsense2)."""

    def __init__(self, serial: Optional[str] = None, frame_rate: int = 30):
        from d3roma_tpu.streaming.realsense import RealSenseRGBDCamera

        self.cam = RealSenseRGBDCamera(serial=serial, frame_rate=frame_rate)

    def frames(self) -> Iterator[Frame]:
        while True:
            yield self.cam.get_rgbd_image()

    def close(self) -> None:
        self.cam.stop()
