from vido_slam_tpu.io.synthetic import SyntheticScene, SyntheticSequence  # noqa: F401
