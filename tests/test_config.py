import textwrap

import numpy as np

from vido_slam_tpu.config import Config, config_from_dict, load_config

KAIST_YAML = textwrap.dedent(
    """\
    %YAML:1.0

    slam_mode: 1
    image_path: /data/kaist/image/stereo_left
    imu_path: /data/kaist/sensor_data/xsens_imu.csv
    start_index: 3350

    Camera.width: 1280
    Camera.height: 560
    Camera.fx: 816.402
    Camera.fy: 817.38
    Camera.cx: 608.2658
    Camera.cy: 266.688
    Camera.k1: -0.05004
    Camera.k2: 0.120012
    Camera.p1: -0.0006259
    Camera.p2: -0.00118
    Camera.k3: -0.063505
    Camera.fps: 10
    Camera.bf: 387.57
    Camera.RGB: 0

    ChooseData: 3
    DepthMapFactor: 500
    ThDepthBG: 80.0
    ThDepthOBJ: 60.0
    MaxTrackPointBG: 3000
    MaxTrackPointOBJ: 800
    SFMgThres: 0.12
    SFDsThres: 0.3
    WINDOW_SIZE: 20
    OVERLAP_SIZE: 4
    UseSampleFeature: 0

    ORBextractor.nFeatures: 2000
    ORBextractor.scaleFactor: 1.2
    ORBextractor.nLevels: 8
    ORBextractor.iniThFAST: 20
    ORBextractor.minThFAST: 7

    Tbc: !!opencv-matrix
       rows: 4
       cols: 4
       dt: f
       data: [-0.00680499, -0.0153215, 0.99985, 1.71239,
              -0.999977, 0.000334627, -0.00680066, 0.247401,
              0.000230383, -0.999883, -0.0153234, -0.11589,
              0, 0, 0, 1]

    IMU.NoiseGyro: 0.001561
    IMU.NoiseAcc: 0.0007
    IMU.GyroWalk: 0.000058
    IMU.AccWalk: 0.0003
    IMU.Frequency: 200
    """
)


def test_load_kaist_style_config(tmp_path):
    p = tmp_path / "kaist_config.yaml"
    p.write_text(KAIST_YAML)
    cfg = load_config(str(p))
    assert cfg.camera.fx == 816.402
    assert cfg.camera.width == 1280
    assert cfg.camera.bf == 387.57
    assert cfg.camera.k1 == -0.05004
    assert cfg.system.choose_data == 3
    assert cfg.system.dataset == "kaist"
    assert cfg.system.depth_map_factor == 500.0
    assert cfg.system.window_size == 20
    assert cfg.system.max_track_points_bg == 3000
    assert cfg.system.sf_mg_thres == 0.12
    assert not cfg.system.use_sample_feature
    assert cfg.orb.n_features == 2000
    assert cfg.demo.slam_mode == 1
    assert cfg.demo.start_index == 3350
    assert cfg.imu.frequency == 200.0
    assert cfg.imu.Tbc.shape == (4, 4)
    np.testing.assert_allclose(cfg.imu.Tbc[0, 2], 0.99985)
    np.testing.assert_allclose(cfg.imu.Tbc[3], [0, 0, 0, 1])


def test_defaults():
    cfg = config_from_dict({})
    assert cfg.system.dataset == "kaist"
    assert cfg.system.window_size == 20
    assert cfg.camera.fps == 10.0


def test_dist_vector():
    cfg = config_from_dict({"Camera.k1": -0.05, "Camera.k3": 0.01})
    np.testing.assert_allclose(cfg.camera.dist, [-0.05, 0, 0, 0, 0.01])
