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


def run_detector(args):
    """Alternative detector families drivable from the CLI (the reference's
    config-selectable backbones, maskrcnn_benchmark/config/defaults.py
    MODEL.BACKBONE.CONV_BODY / MODEL.RETINANET_ON / MODEL.FBNET_ON): one
    invocation produces detections (JSON + annotated PNG) on an image file
    or, with --image synthetic, a deterministic synthetic driving frame."""
    import json

    import jax
    import jax.numpy as jnp

    from vido_slam_tpu.system import COCO_LABELS

    h = args.height - args.height % 32
    w = args.width - args.width % 32
    if args.image == "synthetic":
        from vido_slam_tpu.io.synthetic import driving_clip

        img = np.asarray(driving_clip(height=h, width=w, n_frames=1))[0]
        img = img / 255.0
    else:
        img, _ = _load_rgb(args.image, h, w)

    x = jnp.asarray(img * 255.0, jnp.float32)[None]
    if args.family == "fbnet":
        from vido_slam_tpu.models.maskrcnn.fbnet import (
            fbnet_inference, init_fbnet_params)

        p = init_fbnet_params(jax.random.PRNGKey(0), arch=args.arch)
        det = fbnet_inference(p, x, h, w, arch=args.arch)
    elif args.family == "retinanet":
        from vido_slam_tpu.models.maskrcnn.backbone import ResNetConfig
        from vido_slam_tpu.models.maskrcnn.retinanet import (
            init_retinanet_params, retinanet_inference)

        cfg = ResNetConfig()
        p = init_retinanet_params(jax.random.PRNGKey(0), cfg)
        det = retinanet_inference(p, x, cfg, h, w)
    else:  # maskrcnn
        from vido_slam_tpu.models.maskrcnn.model import (
            MaskRCNNConfig, init_maskrcnn_params, maskrcnn_inference)

        cfg = MaskRCNNConfig(input_h=h, input_w=w)
        p = init_maskrcnn_params(jax.random.PRNGKey(0), cfg)
        det = maskrcnn_inference(p, x, cfg)

    valid = np.asarray(det.valid)
    boxes = np.asarray(det.boxes)[valid]
    scores = np.asarray(det.scores)[valid]
    labels = np.asarray(det.labels)[valid].astype(int)
    os.makedirs(args.out, exist_ok=True)
    recs = [
        {"box": [round(float(v), 2) for v in b],
         "score": round(float(s), 4),
         "label": int(l),
         "category": COCO_LABELS[l] if 0 <= l < len(COCO_LABELS) else str(l)}
        for b, s, l in zip(boxes, scores, labels)
    ]
    with open(os.path.join(args.out, f"{args.family}_detections.json"), "w") as f:
        json.dump({"family": args.family, "n": len(recs),
                   "detections": recs}, f, indent=1)

    # annotated PNG (boxes drawn into the input image)
    from PIL import Image, ImageDraw

    im = Image.fromarray((img * 255).astype(np.uint8))
    dr = ImageDraw.Draw(im)
    for b, s, l in zip(boxes, scores, labels):
        dr.rectangle([b[0], b[1], b[2], b[3]], outline=(255, 64, 64))
        dr.text((b[0] + 1, max(0.0, b[1] - 10)),
                f"{COCO_LABELS[l] if 0 <= l < len(COCO_LABELS) else l}:{s:.2f}",
                fill=(255, 255, 0))
    im.save(os.path.join(args.out, f"{args.family}_annotated.png"))
    print(f"-> {args.family}: {len(recs)} detections, saved to {args.out}")


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
    det = sub.add_parser("detector")
    det.add_argument("--family", required=True,
                     choices=["fbnet", "retinanet", "maskrcnn"])
    det.add_argument("--image", default="synthetic",
                     help="image file, or 'synthetic' for a generated frame")
    det.add_argument("--out", required=True)
    det.add_argument("--arch", default="default",
                     help="FBNet arch name (default/mobilenet_v2/...)")
    det.add_argument("--height", type=int, default=192)
    det.add_argument("--width", type=int, default=640)
    args = ap.parse_args(argv)
    if args.cmd == "depth":
        run_depth(args)
    elif args.cmd == "flow":
        run_flow(args)
    else:
        run_detector(args)


if __name__ == "__main__":
    main()
