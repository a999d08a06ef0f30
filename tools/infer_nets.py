#!/usr/bin/env python
"""Standalone single-image/pair network inference CLIs — counterparts of the
reference's mono_depth2 test_simple.py (colormapped depth for a directory of
images) and flow_net run.py __main__ (flow for an image pair, RGB-HSV
visualization).

Usage:
  python tools/infer_nets.py depth --images <dir|file> --out <dir> \
      [--weights <converted-params-dir>] [--height 192 --width 640]
  python tools/infer_nets.py flow --first a.png --second b.png --out <dir> \
      [--weights <dir>]

Without --weights, randomly initialised parameters are used (smoke mode).
Outputs: depth -> <name>_disp.npy (scaled disparity, test_simple.py:139) and
<name>_disp.png (magma colormap, 95th-percentile vmax, :142-150);
flow -> flow.flo + flow.png (run.py flow2rgb recipe).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_rgb(path, h, w):
    from PIL import Image

    im = Image.open(path).convert("RGB")
    orig = im.size  # (W, H)
    im = im.resize((w, h), Image.LANCZOS)
    return np.asarray(im, np.float32) / 255.0, orig


def _save_colormapped_disp(disp, path):
    import matplotlib as mpl
    import matplotlib.cm as cm
    from PIL import Image

    vmax = np.percentile(disp, 95)
    norm = mpl.colors.Normalize(vmin=float(disp.min()), vmax=float(vmax))
    mapped = (cm.ScalarMappable(norm=norm, cmap="magma")
              .to_rgba(disp)[:, :, :3] * 255).astype(np.uint8)
    Image.fromarray(mapped).save(path)


def run_depth(args):
    import jax
    import jax.numpy as jnp

    from vido_slam_tpu.models.monodepth2 import (
        disp_to_depth, init_monodepth2_params, monodepth2_disp,
    )
    from vido_slam_tpu.ops.warp import resize_bilinear

    if args.weights:
        from vido_slam_tpu.utils.checkpoint import load_params

        params = load_params(args.weights)
    else:
        params = init_monodepth2_params(jax.random.PRNGKey(0))

    if os.path.isdir(args.images):
        paths = sorted(
            p for p in glob.glob(os.path.join(args.images, "*"))
            if p.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")))
    else:
        paths = [args.images]
    os.makedirs(args.out, exist_ok=True)
    for i, p in enumerate(paths):
        img, (ow, oh) = _load_rgb(p, args.height, args.width)
        disp = monodepth2_disp(params, jnp.asarray(img)[None])
        disp_r = np.asarray(resize_bilinear(disp, oh, ow))[0, ..., 0]
        scaled, _ = disp_to_depth(disp_r, 0.1, 100.0)
        name = os.path.splitext(os.path.basename(p))[0]
        np.save(os.path.join(args.out, f"{name}_disp.npy"), scaled)
        _save_colormapped_disp(disp_r, os.path.join(args.out, f"{name}_disp.png"))
        print(f"   Processed {i + 1} of {len(paths)} images")
    print(f"-> Done, saved to {args.out}")


def run_flow(args):
    import jax
    import jax.numpy as jnp

    from vido_slam_tpu.io.datasets import write_flo
    from vido_slam_tpu.models.liteflownet import (
        flow_full_resolution, init_liteflownet_params, liteflownet_forward,
    )
    from vido_slam_tpu.viz import flow_to_rgb

    if args.weights:
        from vido_slam_tpu.utils.checkpoint import load_params

        params = load_params(args.weights)
    else:
        params = init_liteflownet_params(jax.random.PRNGKey(0))

    h = args.height - args.height % 32
    w = args.width - args.width % 32
    first, (ow, oh) = _load_rgb(args.first, h, w)
    second, _ = _load_rgb(args.second, h, w)
    flow = liteflownet_forward(params, jnp.asarray(first)[None],
                               jnp.asarray(second)[None])
    full = np.asarray(flow_full_resolution(flow, oh, ow))[0]
    os.makedirs(args.out, exist_ok=True)
    write_flo(os.path.join(args.out, "flow.flo"), full)
    from PIL import Image

    Image.fromarray(flow_to_rgb(full)).save(
        os.path.join(args.out, "flow.png"))
    print(f"-> flow.flo + flow.png saved to {args.out}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("depth")
    d.add_argument("--images", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--weights", default="")
    d.add_argument("--height", type=int, default=192)
    d.add_argument("--width", type=int, default=640)
    f = sub.add_parser("flow")
    f.add_argument("--first", required=True)
    f.add_argument("--second", required=True)
    f.add_argument("--out", required=True)
    f.add_argument("--weights", default="")
    f.add_argument("--height", type=int, default=192)
    f.add_argument("--width", type=int, default=640)
    args = ap.parse_args(argv)
    if args.cmd == "depth":
        run_depth(args)
    else:
        run_flow(args)


if __name__ == "__main__":
    main()
