import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vido_slam_tpu.config import config_from_dict
from vido_slam_tpu.io.synthetic import SyntheticSequence, simple_scene
from vido_slam_tpu.tracking import Tracker
from vido_slam_tpu.utils.checkpoint import (
    load_params,
    load_session,
    save_params,
    save_session,
    save_torch_state_dict,
)
from vido_slam_tpu.viz import (
    draw_frame_overlay,
    plot_metric_error,
    plot_scene_3d,
    plot_trajectory,
    save_speed_plot,
)


def run_short_sequence(n_frames=5, seed=0):
    scene = simple_scene(width=256, height=160, moving_box=True, box_speed=0.6)
    from vido_slam_tpu.geometry.se3 import make_se3

    dT = np.asarray(make_se3(jnp.eye(3), jnp.array([0.0, 0.0, -0.4])))
    seq = SyntheticSequence(scene, [dT], n_frames=n_frames)
    cfg = config_from_dict({
        "Camera.width": scene.cam.width, "Camera.height": scene.cam.height,
        "Camera.fx": float(scene.cam.fx), "Camera.fy": float(scene.cam.fy),
        "Camera.cx": float(scene.cam.cx), "Camera.cy": float(scene.cam.cy),
        "Camera.bf": float(scene.cam.bf), "MaxTrackPointBG": 600,
        "WINDOW_SIZE": 5,
    })
    tracker = Tracker(cfg, n_bg=600, n_obj=1500, max_objects=4, seed=seed)
    for fr in seq.frames:
        tracker.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)
    return cfg, seq, tracker


class TestCheckpoint:
    def test_params_roundtrip(self, tmp_path):
        p = {"a.weight": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(4)}
        path = str(tmp_path / "params")
        save_params(path, p)
        back = load_params(path)
        assert set(back) == set(p)
        np.testing.assert_allclose(back["a.weight"], p["a.weight"])

    def test_torch_conversion_save(self, tmp_path):
        import torch

        m = torch.nn.Conv2d(3, 8, 3)
        path = str(tmp_path / "conv")
        save_torch_state_dict(path, m.state_dict())
        back = load_params(path)
        assert back["weight"].shape == (3, 3, 3, 8)

    def test_session_resume_continues_identically(self, tmp_path):
        cfg, seq, tracker = run_short_sequence(n_frames=5)
        # snapshot after frame 3 of a fresh run
        cfg2, seq2, _ = run_short_sequence(n_frames=5)
        t_partial = Tracker(cfg, n_bg=600, n_obj=1500, max_objects=4, seed=0)
        for fr in seq.frames[:3]:
            t_partial.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)
        snap = str(tmp_path / "session.pkl")
        save_session(snap, t_partial)

        resumed = Tracker(cfg, n_bg=600, n_obj=1500, max_objects=4, seed=0)
        load_session(snap, resumed)
        assert resumed.frame_id == 3
        for fr in seq.frames[3:]:
            resumed.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)
        assert len(resumed.map) == 5
        # resumed trajectory stays close to the uninterrupted run
        d = np.abs(resumed.map.poses - tracker.map.poses).max()
        assert d < 0.05


class TestViz:
    def test_plots_written(self, tmp_path):
        _, seq, tracker = run_short_sequence(n_frames=5)
        p1 = str(tmp_path / "traj.png")
        p2 = str(tmp_path / "err.png")
        p3 = str(tmp_path / "speed.png")
        gt = np.stack([f.Tcw_gt for f in seq.frames])
        plot_trajectory(tracker.map, p1, gt=gt)
        stats = plot_metric_error(tracker.map, p2)
        save_speed_plot(tracker.map, p3)
        for p in (p1, p2, p3):
            assert os.path.exists(p) and os.path.getsize(p) > 1000
        assert stats["rpe_trans_mean"] < 0.05

    def test_scene3d_and_overlay(self, tmp_path):
        _, seq, tracker = run_short_sequence(n_frames=5)
        p4 = str(tmp_path / "scene3d.png")
        plot_scene_3d(tracker.map, p4)
        assert os.path.exists(p4) and os.path.getsize(p4) > 1000
        img = np.zeros((seq.frames[0].depth.shape[0],
                        seq.frames[0].depth.shape[1]), np.uint8)
        p5 = str(tmp_path / "overlay.png")
        out = draw_frame_overlay(img, tracker.map, path=p5)
        assert out.shape == (*img.shape, 3)
        assert out.max() > 0  # features drawn
        assert os.path.exists(p5) and os.path.getsize(p5) > 500

    def test_live_viewer_headless_fallback(self):
        """LiveViewer under a non-interactive backend (tests run with Agg):
        construction must disable cleanly with a populated disabled_reason
        (None only while healthy), and update()/close() — including the
        image-panel path — must be safe no-ops (VERDICT r4 item 8 +
        advisor viz.py finding)."""
        import matplotlib
        matplotlib.use("Agg", force=True)
        from vido_slam_tpu.viz import LiveViewer

        _, seq, tracker = run_short_sequence(n_frames=4)
        v = LiveViewer(every=1)
        assert not v._ok
        assert v.disabled_reason  # populated, not AttributeError
        img = np.zeros((seq.frames[0].depth.shape[0],
                        seq.frames[0].depth.shape[1]), np.uint8)
        v.update(tracker.map, image=img)  # must not raise
        v.update(tracker.map)
        v.close()

    def test_scene_animation(self, tmp_path):
        """Animated 3D scene recording — the headless VidoViewer surface
        (VidoViewer.cc:28-37 per-frame SetCurrentPose/SetObjects)."""
        from vido_slam_tpu.viz import render_scene_animation

        _, seq, tracker = run_short_sequence(n_frames=5)
        gif = str(tmp_path / "scene.gif")
        n = render_scene_animation(tracker.map, gif, stride=2, fps=5,
                                   figsize=3.0, dpi=60)
        assert n == 3  # frames 1, 3, 5
        assert os.path.exists(gif) and os.path.getsize(gif) > 2000
        from PIL import Image
        with Image.open(gif) as im:
            assert getattr(im, "n_frames", 1) == n

    def test_object_motion_error_plot(self, tmp_path):
        """Per-object PlotMetricError curves: exact GT motions must score
        ~zero; a perturbed GT shows up in the means."""
        from vido_slam_tpu.viz import plot_object_motion_errors

        _, seq, tracker = run_short_sequence(n_frames=6)
        # build gt_motions from the tracker's own estimates (error == 0),
        # covering every tracked object
        gtm = {}
        for f in tracker.map.frames:
            for ob in f.objects:
                if ob.status:
                    gtm.setdefault(ob.track_id, {})[f.frame_id] = ob.motion
        assert gtm, "synthetic scene should track the moving box"
        p = str(tmp_path / "objerr.png")
        summary = plot_object_motion_errors(tracker.map, gtm, p)
        assert os.path.exists(p) and os.path.getsize(p) > 1000
        for tid, s in summary.items():
            assert s["t_mean"] < 1e-6 and s["r_deg_mean"] < 1e-3
        # perturbed GT -> nonzero error
        bad = {}
        for t, d in gtm.items():
            bad[t] = {}
            for f, H in d.items():
                Hb = np.asarray(H).copy()
                Hb[0, 3] += 0.5
                bad[t][f] = Hb
        summary2 = plot_object_motion_errors(
            tracker.map, bad, str(tmp_path / "objerr2.png"))
        assert any(s["t_mean"] > 0.4 for s in summary2.values())

    def test_obj_gt_rows_stored_on_record(self):
        """System.TrackRGBD keeps vObjPose_gt rows with the frame record."""
        from vido_slam_tpu.io.synthetic import SyntheticSequence, simple_scene
        from vido_slam_tpu.system import Sensor, System

        scene = simple_scene(width=256, height=160, moving_box=True)
        from vido_slam_tpu.geometry.se3 import make_se3

        dT = np.asarray(make_se3(jnp.eye(3), jnp.array([0.0, 0.0, -0.4])))
        seq = SyntheticSequence(scene, [dT], n_frames=3)
        sys_ = System()
        cfg = config_from_dict({
            "Camera.width": scene.cam.width, "Camera.height": scene.cam.height,
            "Camera.fx": float(scene.cam.fx), "Camera.fy": float(scene.cam.fy),
            "Camera.cx": float(scene.cam.cx), "Camera.cy": float(scene.cam.cy),
            "Camera.bf": float(scene.cam.bf), "MaxTrackPointBG": 600,
            "DepthMapFactor": 1.0, "ChooseData": 1,
        })
        sys_.init_from_config(cfg, Sensor.RGBD, n_bg=600, n_obj=1500,
                              max_objects=4)
        rows = np.asarray([[0, 1, 0, 0, 0, 0, 0, 0, 0, 0]], np.float64)
        for fr in seq.frames:
            sys_.TrackRGBD(None, np.asarray(fr.depth), np.asarray(fr.flow),
                           np.asarray(fr.mask), mTcw_gt=fr.Tcw_gt,
                           vObjPose_gt=rows)
        assert all(f.obj_gt is not None for f in sys_.tracker.map.frames)
        np.testing.assert_array_equal(sys_.tracker.map.frames[-1].obj_gt, rows)

pytestmark = pytest.mark.slow  # heavy jit: full tier only
