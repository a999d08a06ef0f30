from vido_slam_tpu.models import layers  # noqa: F401
