"""Public System facade — the `libvido_slam.so` API surface
(reference vido_slam/include/System.h) rebuilt for the TPU runtime:

  - eSensor {MONOCULAR, STEREO, RGBD, IMU_RGBD}       (System.h:77-82)
  - System().Init(settings_file, sensor)              (System.h:87)
  - TrackRGBD(im, depth, flow, masksem, ...) VO/VIO   (System.h:94-100)
  - SaveResultsIJRR2020(filename)                     (System.h:101)
  - SceneObject / OutPut per-frame scene description  (System.h:52-66,
                                                       include/OutPut.h)
  - ImuPoint == IMU::Point{a, w, t}                   (include/ImuTypes.h:32)

Per-frame flow mirrors System::TrackRGBD (System.cc:51-78): the VIO overload
drains the IMU queue into the tracker's preintegrator before the visual
update. Depth preprocessing (raw network value -> metric, per dataset with
the current IMU scale) happens here, as in Tracking::GrabImageRGBD
(Tracking.cc:299-322).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from vido_slam_tpu.config import Config, load_config
from vido_slam_tpu.geometry.camera import convert_depth
from vido_slam_tpu.io.results import save_results_ijrr2020
from vido_slam_tpu.tracking import Tracker
from vido_slam_tpu.utils.verbose import Verbose


class Sensor(enum.IntEnum):
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2
    IMU_RGBD = 3


class ImuPoint(NamedTuple):
    """IMU::Point (ImuTypes.h:32-43): accelerometer, gyro, timestamp."""

    a: np.ndarray  # (3,)
    w: np.ndarray  # (3,)
    t: float


@dataclasses.dataclass
class SceneObject:
    """System.h:52-66 / OutPut.h:13-32."""

    pose: np.ndarray          # (3,) object position in world
    velocity: np.ndarray      # (3,)
    speed_kmh: float
    yaw: float
    label_index: int
    label: str
    tracking_id: int


@dataclasses.dataclass
class FrameOutput:
    """OutPut.h:35-72: per-frame camera state + scene objects."""

    frame_id: int
    timestamp: float
    camera_pose: np.ndarray   # (4, 4) Tcw
    camera_position: np.ndarray  # (3,) world
    objects: List[SceneObject] = dataclasses.field(default_factory=list)


# COCO category names indexed by label (predictor.py CATEGORIES)
COCO_LABELS = [
    "__background", "person", "bicycle", "car", "motorcycle", "airplane",
    "bus", "train", "truck", "boat", "traffic light", "fire hydrant",
    "stop sign", "parking meter", "bench", "bird", "cat", "dog", "horse",
    "sheep", "cow", "elephant", "bear", "zebra", "giraffe", "backpack",
    "umbrella", "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv", "laptop",
    "mouse", "remote", "keyboard", "cell phone", "microwave", "oven",
    "toaster", "sink", "refrigerator", "book", "clock", "vase", "scissors",
    "teddy bear", "hair drier", "toothbrush",
]


class System:
    """Facade owning the tracker (and, in VIO mode, the IMU pipeline)."""

    def __init__(self):
        self._initialized = False
        self.tracker: Optional[Tracker] = None
        self.sensor = Sensor.RGBD
        self.config: Optional[Config] = None
        self.scale = 1.0  # mScale: updated by IMU initialization

    # ------------------------------------------------------------------
    def Init(self, settings_file: str, sensor: Sensor, **tracker_kwargs) -> None:
        self.config = load_config(settings_file)
        self.init_from_config(self.config, sensor, **tracker_kwargs)

    def init_from_config(self, config: Config, sensor: Sensor,
                         **tracker_kwargs) -> None:
        self.config = config
        self.sensor = Sensor(sensor)
        use_imu = self.sensor == Sensor.IMU_RGBD
        self.tracker = Tracker(config, use_imu=use_imu, **tracker_kwargs)
        self._initialized = True
        Verbose.print_mess("System initialized (TPU runtime)")

    # ------------------------------------------------------------------
    def TrackRGBD(
        self,
        im: Optional[np.ndarray],
        depth_raw: np.ndarray,
        flow: np.ndarray,
        masksem: np.ndarray,
        mTcw_gt: Optional[np.ndarray] = None,
        vObjPose_gt: Optional[Sequence] = None,
        timestamp: Optional[float] = None,
        imu_measurements: Optional[Sequence[ImuPoint]] = None,
        nImage: Optional[int] = None,
    ) -> np.ndarray:
        """Process one frame; returns the camera pose Tcw (4, 4).

        `depth_raw` is the network/stereo raw value image; conversion to
        metric uses the dataset rule with the current IMU scale
        (Tracking.cc:299-322).

        `nImage` mirrors the reference API's last TrackRGBD argument: the
        sequence length. When the current frame is the last one
        (StopFrame = nImage-1, Tracking.cc:288) and the dataset is KITTI,
        FullBatchOptimization runs over the whole trajectory and fills the
        refined slots (Tracking.cc:1490-1498, bGlobalBatch default true)."""
        assert self._initialized, "call Init first"
        cfg = self.config
        depth = convert_depth(
            jnp.asarray(depth_raw, jnp.float32),
            cfg.system.dataset,
            cfg.system.depth_map_factor,
            cfg.camera.bf,
            scale=self.scale,
        )
        if self.sensor == Sensor.IMU_RGBD and imu_measurements:
            self.tracker.grab_imu_data(imu_measurements)
        gray = None
        if im is not None:
            im = np.asarray(im)
            gray = im.mean(axis=-1) if im.ndim == 3 else im
        Tcw = self.tracker.track(
            depth, jnp.asarray(flow), jnp.asarray(masksem, jnp.int32),
            Tcw_gt=mTcw_gt, timestamp=timestamp, image=gray,
        )
        self.scale = self.tracker.imu_scale
        if vObjPose_gt is not None and len(self.tracker.map):
            # keep the GT object-pose rows with the frame record for
            # GetMetricError/PlotMetricError-style evaluation
            self.tracker.map.frames[-1].obj_gt = np.asarray(vObjPose_gt)
        if (nImage is not None and len(self.tracker.map) >= nImage
                and cfg.system.choose_data == 2):
            # KITTI StopFrame: global batch over the full trajectory
            self.tracker.finish()
            self.tracker.run_full_batch()
            Verbose.print_mess("FullBatchOptimization done (StopFrame)")
        return Tcw

    # ------------------------------------------------------------------
    def GetFrameOutput(self, frame_index: int = -1) -> FrameOutput:
        """Per-frame OutPut equivalent (OutPut.h:35-72)."""
        rec = self.tracker.map.frames[frame_index]
        Twc = np.linalg.inv(rec.Tcw)
        objs = []
        for ob in rec.objects:
            if not ob.status:
                continue
            H = ob.motion
            yaw = float(np.arctan2(H[0, 2], H[2, 2]))
            vel = (H[:3, 3] - (np.eye(3) - H[:3, :3]) @ ob.centroid)
            label_idx = int(ob.sem_value)
            objs.append(SceneObject(
                pose=ob.centroid.copy(),
                velocity=vel,
                speed_kmh=ob.speed_kmh,
                yaw=yaw,
                label_index=label_idx,
                label=COCO_LABELS[label_idx] if label_idx < len(COCO_LABELS) else str(label_idx),
                tracking_id=ob.track_id,
            ))
        return FrameOutput(
            frame_id=rec.frame_id,
            timestamp=rec.timestamp,
            camera_pose=rec.Tcw.copy(),
            camera_position=Twc[:3, 3].copy(),
            objects=objs,
        )

    # ------------------------------------------------------------------
    # Fully-fused realtime path: perception + tracking as ONE device
    # program per frame (the TPU-native answer to the reference's 3 ROS
    # service calls + TrackRGBD, run_vido.cc:131-171). Supports RGBD and
    # IMU_RGBD (System.cc:65-78): in VIO mode the live IMU scale rides as
    # a scalar program input, so IMU initialization / scale refinement
    # never recompile the fused program.
    def AttachPerception(self, perception_model) -> None:
        assert self._initialized, "call Init first"
        cfg = self.config
        # base scale 1.0: the tracker multiplies in its live imu_scale
        # (mScale) at every dispatch
        self.tracker.attach_perception(
            perception_model, cfg.system.dataset,
            cfg.system.depth_map_factor, cfg.camera.bf, scale=1.0,
        )

    def TrackFrames(self, prev_bgr, cur_bgr, mTcw_gt=None, timestamp=None,
                    imu_measurements=None) -> np.ndarray:
        """One fused program from raw BGR frames to the camera pose."""
        if self.sensor == Sensor.IMU_RGBD and imu_measurements:
            self.tracker.grab_imu_data(imu_measurements)
        Tcw = self.tracker.track_frames(prev_bgr, cur_bgr, Tcw_gt=mTcw_gt,
                                        timestamp=timestamp)
        self.scale = self.tracker.imu_scale
        return Tcw

    def TrackFramesPair(self, f0, f1, f2, mTcw_gt=None,
                        imu_measurements=None, timestamps=None):
        """Two frames per device program (Tracker.track_frames_pair).
        `timestamps`: optional (tA, tB) real sensor timestamps for the two
        frames — pass these whenever IMU measurements carry real clocks."""
        if self.sensor == Sensor.IMU_RGBD and imu_measurements:
            self.tracker.grab_imu_data(imu_measurements)
        Tcw = self.tracker.track_frames_pair(f0, f1, f2, Tcw_gt=mTcw_gt,
                                             timestamps=timestamps)
        self.scale = self.tracker.imu_scale
        return Tcw

    # ------------------------------------------------------------------
    # Flat-array marshaling shims for the native C ABI (native/vido_system
    # .cpp): plain float64 buffers cross the boundary instead of Python
    # objects.
    def TrackRGBDWithIMUArray(
        self, im, depth_raw, flow, masksem, mTcw_gt, timestamp,
        imu_rows=None, nImage=None,
    ) -> np.ndarray:
        """TrackRGBD VIO overload (System.h:98-100) taking IMU samples as an
        (N, 7) float64 array of rows (ax, ay, az, wx, wy, wz, t)."""
        meas = None
        if imu_rows is not None and len(imu_rows):
            arr = np.asarray(imu_rows, np.float64).reshape(-1, 7)
            meas = [ImuPoint(a=row[0:3].astype(np.float32),
                             w=row[3:6].astype(np.float32),
                             t=float(row[6])) for row in arr]
        return self.TrackRGBD(im, depth_raw, flow, masksem, mTcw_gt,
                              None, timestamp, imu_measurements=meas,
                              nImage=nImage)

    def GetFrameOutputArray(self, frame_index: int = -1) -> np.ndarray:
        """Per-frame scene objects as (N, 10) float64 rows:
        [tracking_id, label_index, pos_xyz, vel_xyz, yaw, speed_kmh]."""
        out = self.GetFrameOutput(frame_index)
        rows = [
            [float(o.tracking_id), float(o.label_index),
             *np.asarray(o.pose, np.float64),
             *np.asarray(o.velocity, np.float64),
             float(o.yaw), float(o.speed_kmh)]
            for o in out.objects
        ]
        return np.asarray(rows, np.float64).reshape(-1, 10)

    def SaveResultsIJRR2020(self, filename: str) -> None:
        self.tracker.finish()
        save_results_ijrr2020(self.tracker.map, filename)

    @property
    def map(self):
        return self.tracker.map
