from vido_slam_tpu.frontend.features import (  # noqa: F401
    FeatureSet,
    gather_nearest,
    sample_background_features,
    sample_object_points,
)
from vido_slam_tpu.frontend.sceneflow import scene_flow_world  # noqa: F401
from vido_slam_tpu.frontend.objects import (  # noqa: F401
    ObjectStats,
    compute_object_stats,
    ObjectTracker,
)
