"""Dataset IO — the offline demo's loaders (reference
vido_slam/demo/run_vido_slam.cc:14-65, 112-137) rebuilt in the runtime:

  - KAIST: image list from vTimestampsImage.txt (nanosecond stamps ->
    "<stamp>.png" names), xsens_imu.csv (cols 8-10 gyro, 11-13 acc,
    col 0 stamp ns), Bayer -> BGR demosaic of the raw camera stream;
  - middlebury .flo optical-flow files (cv::readOpticalFlow);
  - 16-bit depth PNGs and int32 mask PNGs (run_vido_slam.cc:118-122).

Heavy pixel work (demosaic) has a native C++ path (native/dataloader) with a
numpy fallback.
"""

from __future__ import annotations

import os
import struct
from typing import List, NamedTuple, Tuple

import numpy as np

FLO_MAGIC = 202021.25


def read_flo(path: str) -> np.ndarray:
    """Middlebury .flo reader (the format cv::readOpticalFlow parses):
    magic f32, width i32, height i32, then h*w*2 f32 (u, v) interleaved."""
    with open(path, "rb") as f:
        magic = struct.unpack("<f", f.read(4))[0]
        if abs(magic - FLO_MAGIC) > 1e-3:
            raise ValueError(f"{path}: bad .flo magic {magic}")
        w = struct.unpack("<i", f.read(4))[0]
        h = struct.unpack("<i", f.read(4))[0]
        data = np.frombuffer(f.read(h * w * 2 * 4), dtype="<f4")
    return data.reshape(h, w, 2).copy()


def write_flo(path: str, flow: np.ndarray) -> None:
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        f.write(struct.pack("<f", FLO_MAGIC))
        f.write(struct.pack("<i", w))
        f.write(struct.pack("<i", h))
        f.write(np.ascontiguousarray(flow, dtype="<f4").tobytes())


def demosaic_bayer_bg2bgr(raw: np.ndarray) -> np.ndarray:
    """Bilinear demosaic of a BayerBG pattern (cv::COLOR_BayerBG2BGR as the
    demo uses for the KAIST stream, run_vido_slam.cc:114-117).

    OpenCV's BayerBG layout: raw[0,0]=B? (OpenCV naming refers to the 2x2
    tile at (1,1)); here: even rows [R G], odd rows [G B] per OpenCV
    COLOR_BayerBG2BGR convention. Vectorised convolution-based bilinear."""
    try:
        import cv2

        return cv2.cvtColor(raw, cv2.COLOR_BayerBG2BGR)
    except Exception:
        pass
    # numpy fallback: simple bilinear demosaic
    H, W = raw.shape
    r = np.zeros((H, W), np.float32)
    g = np.zeros((H, W), np.float32)
    b = np.zeros((H, W), np.float32)
    raw_f = raw.astype(np.float32)
    # OpenCV BayerBG: R at (0,0), G at (0,1)/(1,0), B at (1,1)
    r[0::2, 0::2] = raw_f[0::2, 0::2]
    g[0::2, 1::2] = raw_f[0::2, 1::2]
    g[1::2, 0::2] = raw_f[1::2, 0::2]
    b[1::2, 1::2] = raw_f[1::2, 1::2]

    def fill(c, mask):
        k = np.array([[0.25, 0.5, 0.25], [0.5, 1.0, 0.5], [0.25, 0.5, 0.25]])
        num = _conv2(c, k)
        den = _conv2(mask.astype(np.float32), k)
        return np.where(mask, c, num / np.maximum(den, 1e-6))

    rm = np.zeros((H, W), bool); rm[0::2, 0::2] = True
    gm = np.zeros((H, W), bool); gm[0::2, 1::2] = True; gm[1::2, 0::2] = True
    bm = np.zeros((H, W), bool); bm[1::2, 1::2] = True
    r = fill(r, rm); g = fill(g, gm); b = fill(b, bm)
    return np.clip(np.stack([b, g, r], axis=-1), 0, 255).astype(raw.dtype)


def _conv2(x: np.ndarray, k: np.ndarray) -> np.ndarray:
    from numpy.lib.stride_tricks import sliding_window_view

    p = np.pad(x, 1, mode="reflect")
    win = sliding_window_view(p, (3, 3))
    return np.einsum("ijkl,kl->ij", win, k)


class KaistFrame(NamedTuple):
    image_path: str
    timestamp: float


def load_kaist_image_list(image_dir: str) -> List[KaistFrame]:
    """LoadKaistImg (run_vido_slam.cc:47-65): stamps from
    <image_dir>/../vTimestampsImage.txt (first line skipped), image file
    name = first 19 chars of the stamp + .png."""
    time_file = os.path.join(image_dir, "..", "vTimestampsImage.txt")
    frames = []
    with open(time_file) as f:
        lines = f.read().splitlines()[1:]
    for line in lines:
        line = line.strip()
        if not line:
            continue
        stamp = line.split()[0]
        name = stamp[:19] + ".png" if len(stamp) >= 19 else stamp + ".png"
        frames.append(KaistFrame(
            image_path=os.path.join(image_dir, name),
            timestamp=float(stamp) / 1e9,
        ))
    return frames


def load_kitti_image_list(image_dir: str) -> List[KaistFrame]:
    """LoadKittiImg (realtime_demo/src/run_vido.cc:195-215): stamps in
    seconds from <image_dir>/../times.txt (first line skipped), image file
    names are 10-digit zero-padded frame indices (.jpg in the reference;
    .png also accepted for KITTI raw exports)."""
    time_file = os.path.join(image_dir, "..", "times.txt")
    frames = []
    with open(time_file) as f:
        lines = f.read().splitlines()[1:]
    times = [float(l.split()[0]) for l in lines if l.strip()]
    for i, t in enumerate(times):
        base = os.path.join(image_dir, f"{i:010d}")
        path = base + ".jpg"
        if not os.path.exists(path) and os.path.exists(base + ".png"):
            path = base + ".png"
        frames.append(KaistFrame(image_path=path, timestamp=t))
    return frames


def load_kaist_imu(csv_path: str):
    """LoadIMU (run_vido_slam.cc:14-45): xsens_imu.csv, stamp ns in col 0,
    gyro cols 8-10, acc cols 11-13. Returns (times_s, acc (N,3), gyro (N,3))."""
    times, accs, gyros = [], [], []
    with open(csv_path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(",")
            if len(parts) < 14:
                continue
            times.append(float(parts[0]) / 1e9)
            gyros.append([float(parts[8]), float(parts[9]), float(parts[10])])
            accs.append([float(parts[11]), float(parts[12]), float(parts[13])])
    return (np.asarray(times), np.asarray(accs, np.float32),
            np.asarray(gyros, np.float32))


def load_depth_png(path: str) -> np.ndarray:
    """16-bit depth png -> float32 raw values (converted to metric later)."""
    import cv2

    d = cv2.imread(path, cv2.IMREAD_ANYDEPTH)
    if d is None:
        raise FileNotFoundError(path)
    return d.astype(np.float32)


def load_mask_png(path: str) -> np.ndarray:
    import cv2

    m = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if m is None:
        raise FileNotFoundError(path)
    return m.astype(np.int32)


def sibling_input_paths(image_path: str) -> Tuple[str, str, str]:
    """The offline demo reads flow/depth/mask as siblings of the image
    (run_vido_slam.cc:118-122): <stem>.flo, <stem>_depth.png, <stem>_mask.png
    in flow/depth/mask directories next to the image directory."""
    d, name = os.path.split(image_path)
    stem = os.path.splitext(name)[0]
    root = os.path.dirname(d)
    return (
        os.path.join(root, "flow", stem + ".flo"),
        os.path.join(root, "depth", stem + ".png"),
        os.path.join(root, "mask", stem + ".png"),
    )
