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
      [--mask e2e_mask_rcnn_R_50_FPN_1x.pth]
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


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--flow", help="LiteFlowNet .pytorch checkpoint")
    ap.add_argument("--depth-encoder", help="MonoDepth2 encoder.pth")
    ap.add_argument("--depth-decoder", help="MonoDepth2 depth.pth")
    ap.add_argument("--mask", help="maskrcnn_benchmark .pth checkpoint")
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
    if not done:
        ap.error("nothing to convert: pass --flow/--depth-*/--mask")
    print(f"converted {', '.join(done)} -> {args.out}/")


if __name__ == "__main__":
    main()
