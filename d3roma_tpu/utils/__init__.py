from d3roma_tpu.utils.camera import (  # noqa: F401
    DepthCamera,
    K,
    Realsense,
    RGBDCamera,
    normalize_disp,
    unnormalize_disp,
)
from d3roma_tpu.utils.pointcloud import (  # noqa: F401
    backproject_depth,
    read_ply,
    transform_points,
    viz_cropped_pointcloud,
    voxel_downsample,
    write_ply,
)
