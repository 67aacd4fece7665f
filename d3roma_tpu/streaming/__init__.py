from d3roma_tpu.streaming.batcher import MicroBatcher  # noqa: F401
from d3roma_tpu.streaming.http_server import InferenceHTTPServer  # noqa: F401
from d3roma_tpu.streaming.processor import D3RoMaProcessor  # noqa: F401
from d3roma_tpu.streaming.realsense import (  # noqa: F401
    RealSenseRGBDCamera,
    crop_workspace,
    merge_xyz_rgb,
    rgbd_to_pointcloud,
)
from d3roma_tpu.streaming.sources import (  # noqa: F401
    FileReplaySource,
    FrameSource,
    RealSenseSource,
)
