#!/usr/bin/env python
"""Convert the reference's torch checkpoints into this framework's
parameter layout (one .npz/orbax bundle per network).

The reference nets and their checkpoint files:
  flow   LiteFlowNet   `network-default.pytorch`
         (src/thirdparty/flow_net/src/run_flow_net.py:33)
  depth  MonoDepth2    `<model_dir>/encoder.pth` + `<model_dir>/depth.pth`
         (src/thirdparty/mono_depth2/src/run_mono_depth.py:58-77)
  mask   Mask R-CNN    torch .pth with maskrcnn_benchmark module keys
         (maskrcnn_benchmark/utils/checkpoint.py)

Keys are preserved verbatim; the conversion is a pure layout transform
(NCHW->NHWC etc., models/layers.py::convert_state_dict). Load the result
with `PerceptionModel.from_pretrained(<out_dir>, ...)`.

Usage:
  python tools/convert_weights.py --out weights/ \
      [--flow network-default.pytorch] \
      [--depth-encoder encoder.pth --depth-decoder depth.pth] \
      [--mask e2e_mask_rcnn_R_50_FPN_1x.pth] \
      [--mask-c2 e2e_mask_rcnn_X-101-32x8d-FPN_1x.pkl --mask-arch X-101]

--mask-c2 ingests the DEPLOYED checkpoint format: the reference node's
X-101 weights are a Detectron caffe2 pickle, translated per
maskrcnn_benchmark/utils/c2_model_loading.py (models/maskrcnn/c2_loading.py
reproduces the rename rules + suffix alignment torch-free).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_torch(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]  # maskrcnn_benchmark Checkpointer format
    # strip DataParallel / module wrappers, drop non-tensor metadata
    # entries (monodepth2's encoder.pth stores height/width/use_stereo)
    out = {}
    for k, v in sd.items():
        if not torch.is_tensor(v):
            continue
        out[k.removeprefix("module.")] = v
    return out


def convert_flow(path: str):
    from vido_slam_tpu.models.layers import convert_state_dict

    sd = _load_torch(path)
    # torch checkpoint keys are "netFeatures..."/"netMatching..." already
    return convert_state_dict(sd)


def convert_depth(encoder_path: str, decoder_path: str):
    from vido_slam_tpu.models.layers import convert_state_dict

    sd = _load_torch(encoder_path)
    sd.update(_load_torch(decoder_path))
    return convert_state_dict(sd)


def convert_mask(path: str):
    from vido_slam_tpu.models.layers import convert_state_dict

    return convert_state_dict(_load_torch(path))


_MASK_ARCHS = {
    # arch flag -> (model config name, C2 conv body). X-101-32x8d is the
    # checkpoint the reference node deploys (run_mask_rcnn.py:30); its
    # caffe2 yaml rides the R-101-FPN conv body with groups=32/width=8.
    "X-101": ("RESNEXT101_FPN", "R-101"),
    "R-50": ("RESNET50_FPN", "R-50"),
}


def convert_mask_c2(path: str, arch: str = "X-101"):
    """Detectron caffe2 .pkl -> our mask param dict (the reference's
    deployed checkpoints: e2e_mask_rcnn_{X-101-32x8d,R-50}-FPN_1x).
    Translation per maskrcnn_benchmark/utils/c2_model_loading.py:12-206 +
    model_serialization.py suffix alignment (see models/maskrcnn/
    c2_loading.py)."""
    import jax

    from vido_slam_tpu.models.maskrcnn import model as mm
    from vido_slam_tpu.models.maskrcnn.c2_loading import (
        align_c2_to_model,
        load_c2_pickle,
        translate_c2_blobs,
    )

    cfg_name, conv_body = _MASK_ARCHS[arch]
    cfg = getattr(mm, cfg_name)
    state = translate_c2_blobs(
        load_c2_pickle(path), conv_body,
        stage_with_dcn=cfg.resnet.stage_with_dcn,
    )
    init = mm.init_maskrcnn_params(jax.random.PRNGKey(0), cfg)
    params, filled, unmatched = align_c2_to_model(state, init)
    if filled:
        print(f"warning: {len(filled)} model params kept random init "
              f"(no C2 blob): {filled[:8]}{'...' if len(filled) > 8 else ''}",
              file=sys.stderr)
    if unmatched:
        drop = [k for k in unmatched if not k.startswith("fc1000")]
        if drop:
            print(f"note: {len(drop)} C2 blobs unused: {drop[:8]}"
                  f"{'...' if len(drop) > 8 else ''}", file=sys.stderr)
    return params


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--flow", help="LiteFlowNet .pytorch checkpoint")
    ap.add_argument("--depth-encoder", help="MonoDepth2 encoder.pth")
    ap.add_argument("--depth-decoder", help="MonoDepth2 depth.pth")
    ap.add_argument("--mask", help="maskrcnn_benchmark .pth checkpoint")
    ap.add_argument("--mask-c2",
                    help="Detectron caffe2 .pkl checkpoint (the reference "
                         "node's deployed weights, e.g. "
                         "e2e_mask_rcnn_X-101-32x8d-FPN_1x)")
    ap.add_argument("--mask-arch", default="X-101",
                    choices=sorted(_MASK_ARCHS),
                    help="backbone of the --mask-c2 checkpoint")
    args = ap.parse_args(argv)

    from vido_slam_tpu.utils.checkpoint import save_params

    os.makedirs(args.out, exist_ok=True)
    done = []
    if args.flow:
        save_params(os.path.join(args.out, "flow"), convert_flow(args.flow))
        done.append("flow")
    if args.depth_encoder or args.depth_decoder:
        assert args.depth_encoder and args.depth_decoder, \
            "--depth-encoder and --depth-decoder go together"
        save_params(os.path.join(args.out, "depth"),
                    convert_depth(args.depth_encoder, args.depth_decoder))
        done.append("depth")
    if args.mask:
        save_params(os.path.join(args.out, "mask"), convert_mask(args.mask))
        done.append("mask")
    if args.mask_c2:
        save_params(os.path.join(args.out, "mask"),
                    convert_mask_c2(args.mask_c2, args.mask_arch))
        done.append(f"mask (c2 {args.mask_arch})")
    if not done:
        ap.error("nothing to convert: pass --flow/--depth-*/--mask[-c2]")
    print(f"converted {', '.join(done)} -> {args.out}/")


if __name__ == "__main__":
    main()
