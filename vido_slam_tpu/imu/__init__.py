from vido_slam_tpu.imu.preintegration import (  # noqa: F401
    GRAVITY_VALUE,
    ImuCalib,
    PreintegrationState,
    bias_corrected_deltas,
    init_preintegration,
    integrate_measurements,
    prepare_segments,
)
