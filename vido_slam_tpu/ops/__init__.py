from vido_slam_tpu.ops.warp import backwarp, grid_sample_nhwc  # noqa: F401
from vido_slam_tpu.ops.correlation import correlation  # noqa: F401
