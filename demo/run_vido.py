#!/usr/bin/env python
"""Offline demo — the `run_vido` binary (reference
vido_slam/demo/run_vido_slam.cc) on the TPU runtime.

  python demo/run_vido.py <config.yaml> [--output results/] [--max-frames N]
                          [--online]

Offline mode reads precomputed flow (.flo), depth (16-bit png) and mask (png)
siblings of each image (run_vido_slam.cc:118-122). --online runs the fused
TPU perception graph (MonoDepth2 + LiteFlowNet + Mask R-CNN) instead — the
realtime pipeline (src/realtime_demo/src/run_vido.cc) without ROS.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--output", default="results/")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--online", action="store_true")
    ap.add_argument("--animate", action="store_true",
                    help="write an animated 3D scene recording "
                    "(scene_3d.gif) alongside the result files — the "
                    "headless counterpart of the live Pangolin viewer")
    ap.add_argument("--view", action="store_true",
                    help="live 3D scene viewer (VidoViewer counterpart); "
                    "starts RUNNING, space pauses the display only — the "
                    "pipeline is never gated; no-op on headless hosts")
    ap.add_argument("--view-every", type=int, default=5,
                    help="redraw the live viewer every N frames")
    args = ap.parse_args()

    from vido_slam_tpu.config import load_config
    from vido_slam_tpu.io.datasets import (
        demosaic_bayer_bg2bgr,
        load_depth_png,
        load_kaist_image_list,
        load_kaist_imu,
        load_kitti_image_list,
        load_mask_png,
        read_flo,
        sibling_input_paths,
    )
    from vido_slam_tpu.system import ImuPoint, Sensor, System
    from vido_slam_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(args.config)
    vio = cfg.demo.slam_mode == 1
    sensor = Sensor.IMU_RGBD if vio else Sensor.RGBD
    kitti = cfg.system.choose_data == 2

    system = System()
    system.Init(args.config, sensor)

    if kitti:
        frames = load_kitti_image_list(cfg.demo.image_path)
    else:
        frames = load_kaist_image_list(cfg.demo.image_path)
    start = cfg.demo.start_index
    frames = frames[start:]
    if args.max_frames:
        frames = frames[: args.max_frames]

    imu = None
    if vio and cfg.demo.imu_path:
        imu = load_kaist_imu(cfg.demo.imu_path)

    perception = None
    prev_bgr = None
    fused_online = False
    if args.online:
        from vido_slam_tpu.models.maskrcnn.model import MaskRCNNConfig
        from vido_slam_tpu.models.perception import PerceptionModel

        perception = PerceptionModel(
            cfg.camera.height, cfg.camera.width,
            MaskRCNNConfig(input_h=544, input_w=800),
        )
        # perception + tracking run as ONE device program per frame
        # (System.AttachPerception) for both RGBD and IMU_RGBD: the live
        # IMU scale rides as a scalar program input, so IMU init / scale
        # refinement never recompile the fused program
        fused_online = True
        system.AttachPerception(perception)

    import cv2

    viewer = None
    if args.view:
        from vido_slam_tpu.viz import LiveViewer

        viewer = LiveViewer(every=args.view_every)
        if not viewer._ok:
            print(f"live viewer disabled: {viewer.disabled_reason}")

    last_t = None
    for i, fr in enumerate(frames):
        if kitti:
            # KITTI frames are plain color images (no Bayer pattern)
            bgr = cv2.imread(fr.image_path, cv2.IMREAD_COLOR)
            if bgr is None:
                print(f"skip missing {fr.image_path}")
                continue
        else:
            raw = cv2.imread(fr.image_path, cv2.IMREAD_GRAYSCALE)
            if raw is None:
                print(f"skip missing {fr.image_path}")
                continue
            bgr = demosaic_bayer_bg2bgr(raw)

        if fused_online:
            meas = None
            if imu is not None and last_t is not None:
                times, accs, gyros = imu
                sel = (times > last_t) & (times <= fr.timestamp)
                meas = [
                    ImuPoint(a=accs[j], w=gyros[j], t=float(times[j]))
                    for j in np.nonzero(sel)[0]
                ]
            if prev_bgr is None:
                prev_bgr = bgr
            Tcw = system.TrackFrames(prev_bgr.astype(np.float32),
                                     bgr.astype(np.float32),
                                     timestamp=fr.timestamp,
                                     imu_measurements=meas)
            prev_bgr = bgr
            last_t = fr.timestamp
            if i % 10 == 0:
                print(f"frame {i}/{len(frames)} t={fr.timestamp:.2f} "
                      f"pos={np.linalg.inv(Tcw)[:3, 3]}")
            if viewer is not None and system.tracker is not None \
                    and len(system.tracker.map) > 1:
                viewer.update(system.tracker.map, image=bgr[..., ::-1])
            continue
        if perception is not None:
            if prev_bgr is None:
                prev_bgr = bgr
            out = perception(prev_bgr.astype(np.float32), bgr.astype(np.float32))
            depth_raw = np.asarray(out.depth_u16)
            flow = np.asarray(out.flow)
            mask = np.asarray(out.mask).astype(np.int32)
            prev_bgr = bgr
        else:
            flo_p, dep_p, msk_p = sibling_input_paths(fr.image_path)
            flow = read_flo(flo_p)
            depth_raw = load_depth_png(dep_p)
            mask = load_mask_png(msk_p)

        meas = None
        if imu is not None and last_t is not None:
            times, accs, gyros = imu
            sel = (times > last_t) & (times <= fr.timestamp)
            meas = [
                ImuPoint(a=accs[j], w=gyros[j], t=float(times[j]))
                for j in np.nonzero(sel)[0]
            ]
        last_t = fr.timestamp

        Tcw = system.TrackRGBD(bgr, depth_raw, flow, mask,
                               timestamp=fr.timestamp, imu_measurements=meas,
                               nImage=len(frames))
        if i % 10 == 0:
            print(f"frame {i}/{len(frames)} t={fr.timestamp:.2f} "
                  f"pos={np.linalg.inv(Tcw)[:3, 3]}")
        if viewer is not None and system.tracker is not None \
                and len(system.tracker.map) > 1:
            viewer.update(system.tracker.map, image=bgr[..., ::-1])

    if viewer is not None:
        viewer.close()
    os.makedirs(args.output, exist_ok=True)
    system.SaveResultsIJRR2020(os.path.join(args.output, ""))
    if args.animate and system.tracker is not None \
            and len(system.tracker.map) > 1:
        from vido_slam_tpu.viz import render_scene_animation
        gif = os.path.join(args.output, "scene_3d.gif")
        n = render_scene_animation(system.tracker.map, gif)
        print(f"wrote {gif} ({n} frames)")
    print("done.")


if __name__ == "__main__":
    main()
