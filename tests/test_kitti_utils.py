"""KITTI velodyne->depth GT generation (data/kitti_utils.py) against a
synthetic calibration + scan with analytically known projections."""

import os

import numpy as np

from vido_slam_tpu.data.kitti_utils import (
    export_gt_depths,
    generate_depth_map,
    load_velodyne_points,
    read_calib_file,
    velo_to_image_projection,
)

H, W = 40, 60
FX = FY = 30.0
CX, CY = W / 2, H / 2


def _write_calib(d):
    """Identity velo->cam + rectification, pinhole P: velodyne coords are
    camera coords (x right, y down, z forward) for easy hand-checks."""
    cam = os.path.join(d, "calib_cam_to_cam.txt")
    with open(cam, "w") as f:
        f.write("corner_dist: 9.950000e-02\n")
        f.write(f"S_rect_02: {W:.6e} {H:.6e}\n")
        f.write("R_rect_00: " + " ".join(
            str(v) for v in np.eye(3).ravel()) + "\n")
        f.write(f"P_rect_02: {FX} 0 {CX} 0 0 {FY} {CY} 0 0 0 1 0\n")
        f.write("calib_time: 09-Jan-2012 13:57:47\n")   # non-numeric value
    velo = os.path.join(d, "calib_velo_to_cam.txt")
    with open(velo, "w") as f:
        f.write("R: " + " ".join(str(v) for v in np.eye(3).ravel()) + "\n")
        f.write("T: 0 0 0\n")
    return d


def _write_scan(d, pts_cam):
    """pts_cam (N, 3) camera-frame points -> .bin with reflectance col."""
    arr = np.concatenate(
        [pts_cam, np.random.rand(len(pts_cam), 1)], 1).astype(np.float32)
    path = os.path.join(d, "scan.bin")
    arr.tofile(path)
    return path


def _pix(pt):
    """Expected pixel under the reference convention (round - 1)."""
    u = round(FX * pt[0] / pt[2] + CX) - 1
    v = round(FY * pt[1] / pt[2] + CY) - 1
    return int(v), int(u)


class TestCalibAndProjection:
    def test_read_calib_file(self, tmp_path):
        d = _write_calib(str(tmp_path))
        c = read_calib_file(os.path.join(d, "calib_cam_to_cam.txt"))
        assert c["S_rect_02"].tolist() == [W, H]
        assert isinstance(c["calib_time"], str)
        np.testing.assert_allclose(c["R_rect_00"].reshape(3, 3), np.eye(3))

    def test_projection_matrix(self, tmp_path):
        d = _write_calib(str(tmp_path))
        cam = read_calib_file(os.path.join(d, "calib_cam_to_cam.txt"))
        velo = read_calib_file(os.path.join(d, "calib_velo_to_cam.txt"))
        P = velo_to_image_projection(cam, velo, 2)
        pt = np.asarray([1.0, 0.5, 4.0, 1.0])
        proj = P @ pt
        assert proj[0] / proj[2] == FX * 1.0 / 4.0 + CX
        assert proj[1] / proj[2] == FY * 0.5 / 4.0 + CY


class TestGenerateDepthMap:
    def test_known_points_land_at_expected_pixels(self, tmp_path):
        d = _write_calib(str(tmp_path))
        pts = np.asarray([
            [0.0, 0.0, 5.0],     # principal point, depth 5
            [1.0, -0.5, 10.0],   # off-centre, depth 10
        ])
        scan = _write_scan(d, pts)
        depth = generate_depth_map(d, scan, cam=2)
        assert depth.shape == (H, W)
        for pt in pts:
            v, u = _pix(pt)
            assert depth[v, u] == np.float32(pt[2]), (v, u)
        assert (depth > 0).sum() == 2

    def test_duplicates_keep_min_depth(self, tmp_path):
        d = _write_calib(str(tmp_path))
        # same ray, two depths -> same pixel; min must win
        pts = np.asarray([[0.0, 0.0, 9.0], [0.0, 0.0, 4.0],
                          [0.0, 0.0, 7.5]])
        scan = _write_scan(d, pts)
        depth = generate_depth_map(d, scan, cam=2)
        v, u = _pix(pts[0])
        assert depth[v, u] == np.float32(4.0)

    def test_behind_plane_and_oob_dropped(self, tmp_path):
        d = _write_calib(str(tmp_path))
        pts = np.asarray([
            [0.0, 0.0, -3.0],      # behind (velodyne x<0 after axis map)
            [50.0, 0.0, 1.0],      # projects far outside
        ])
        scan = _write_scan(d, pts)
        depth = generate_depth_map(d, scan, cam=2)
        assert (depth > 0).sum() == 0

    def test_vel_depth_uses_forward_coordinate(self, tmp_path):
        """vel_depth=True stores velodyne x (forward) instead of cam z —
        with the identity extrinsics here velodyne x IS the first column,
        so the stored value differs from z (kitti_utils.py:72-73)."""
        d = _write_calib(str(tmp_path))
        pts = np.asarray([[2.0, 0.0, 8.0]])
        scan = _write_scan(d, pts)
        dep = generate_depth_map(d, scan, cam=2, vel_depth=True)
        v, u = _pix(pts[0])
        assert dep[v, u] == np.float32(2.0)     # velo forward coord

    def test_load_velodyne_homogenises(self, tmp_path):
        d = str(tmp_path)
        scan = _write_scan(d, np.asarray([[1.0, 2.0, 3.0]]))
        pts = load_velodyne_points(scan)
        assert pts.shape == (1, 4)
        assert pts[0, 3] == 1.0


def test_export_gt_depths_roundtrip(tmp_path):
    d = _write_calib(str(tmp_path))
    scan = _write_scan(d, np.asarray([[0.0, 0.0, 5.0]]))
    out = os.path.join(str(tmp_path), "gt", "gt_depths.npz")
    gts = export_gt_depths([(d, scan)], out)
    assert len(gts) == 1
    loaded = np.load(out, allow_pickle=True)["data"]
    np.testing.assert_array_equal(loaded[0], gts[0])
