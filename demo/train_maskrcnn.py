#!/usr/bin/env python
"""Mask R-CNN training CLI — the reference's `tools/train_net.py`
counterpart (src/tools/train_net.py:131-170: build model/optimizer/
scheduler/loader, DDP over GPUs, engine/trainer.py do_train loop).

TPU-native: one (dp, tp) `jax.sharding.Mesh` replaces
init_process_group("nccl") + DistributedDataParallel; the dp-sharded jitted
step's gradient psum is the DDP all-reduce (vido_slam_tpu/parallel/train.py).

Data: a COCO-format dataset directory (--ann-file/--image-root,
vido_slam_tpu/data/coco.py) or --synthetic for generated boxes/images
(smoke-scale runs without data on disk).

Examples:
  # smoke (random init: use ~10x lower lr than the pretrained-backbone recipe)
  python demo/train_maskrcnn.py --synthetic --iters 20 --batch 4 --lr 1e-3 \
      --input-h 128 --input-w 160 --out /tmp/det_ckpt
  python demo/train_maskrcnn.py --ann-file ann.json --image-root imgs/ \
      --iters 180000 --batch 8 --dp 8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ann-file", help="COCO instances json")
    ap.add_argument("--image-root", help="COCO image directory")
    ap.add_argument("--synthetic", action="store_true",
                    help="train on generated data (no dataset needed)")
    ap.add_argument("--iters", type=int, default=180000,
                    help="SOLVER.MAX_ITER (X-101 1x recipe: 180k at batch 8)")
    ap.add_argument("--batch", type=int, default=2,
                    help="global images per step (SOLVER.IMS_PER_BATCH)")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel mesh size (0 = all devices)")
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel size")
    ap.add_argument("--lr", type=float, default=0.01, help="SOLVER.BASE_LR")
    ap.add_argument("--warmup-iters", type=int, default=500)
    ap.add_argument("--lr-steps", type=int, nargs="*",
                    default=[120000, 160000])
    ap.add_argument("--checkpoint-period", type=int, default=2500)
    ap.add_argument("--log-period", type=int, default=20)
    ap.add_argument("--out", default="", help="checkpoint output dir")
    ap.add_argument("--resume", default="", help="params checkpoint to load")
    ap.add_argument("--start-iter", type=int, default=0)
    ap.add_argument("--input-h", type=int, default=544)
    ap.add_argument("--input-w", type=int, default=800)
    ap.add_argument("--max-boxes", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    return ap.parse_args(argv)


def synthetic_batches(n_batches, batch, h, w, max_boxes, seed=0):
    """Generated detection batches: blob 'objects' with matching boxes."""
    import numpy as np

    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_batches):
        imgs = rng.rand(batch, h, w, 3).astype(np.float32) * 30.0
        boxes = np.zeros((batch, max_boxes, 4), np.float32)
        labels = np.zeros((batch, max_boxes), np.int32)
        valid = np.zeros((batch, max_boxes), bool)
        masks = np.zeros((batch, max_boxes, h // 2, w // 2), np.float32)
        for b in range(batch):
            for g in range(rng.randint(1, 4)):
                bw, bh = rng.randint(w // 8, w // 3), rng.randint(h // 8, h // 3)
                x0 = rng.randint(0, w - bw)
                y0 = rng.randint(0, h - bh)
                imgs[b, y0:y0 + bh, x0:x0 + bw] += 120.0
                boxes[b, g] = [x0, y0, x0 + bw - 1, y0 + bh - 1]
                labels[b, g] = rng.randint(1, 81)
                valid[b, g] = True
                masks[b, g, y0 // 2:(y0 + bh) // 2, x0 // 2:(x0 + bw) // 2] = 1.0
        out.append({"image": imgs,
                    "targets": {"boxes": boxes, "labels": labels,
                                "masks": masks, "valid": valid}})
    return out


def main(argv=None):
    args = parse_args(argv)
    import jax

    from vido_slam_tpu.models.maskrcnn import init_maskrcnn_params
    from vido_slam_tpu.models.maskrcnn.model import MaskRCNNConfig
    from vido_slam_tpu.parallel.mesh import make_mesh
    from vido_slam_tpu.parallel.train import run_detection_training
    from vido_slam_tpu.utils.checkpoint import load_params

    n_dev = args.dp if args.dp else max(
        len(jax.devices()) // args.tp, 1) * args.tp
    mesh = make_mesh(n_dev, tp=args.tp)
    dp = mesh.shape["dp"]
    assert args.batch % dp == 0, f"--batch {args.batch} not divisible by dp={dp}"

    cfg = MaskRCNNConfig(input_h=args.input_h, input_w=args.input_w)
    if args.resume:
        params = load_params(args.resume)
        print(f"resumed {len(params)} tensors from {args.resume}")
    else:
        params = init_maskrcnn_params(jax.random.PRNGKey(args.seed), cfg)

    if args.synthetic:
        batches = synthetic_batches(
            8, args.batch, args.input_h, args.input_w, args.max_boxes,
            args.seed)
    else:
        if not (args.ann_file and args.image_root):
            raise SystemExit("need --ann-file + --image-root, or --synthetic")
        import numpy as np

        from vido_slam_tpu.data.coco import CocoDetectionDataset

        ds = CocoDetectionDataset(
            args.ann_file, args.image_root,
            input_hw=(args.input_h, args.input_w),
            max_boxes=args.max_boxes,
            mask_hw=(args.input_h // 2, args.input_w // 2))
        rng = np.random.RandomState(args.seed)

        def gen():
            # shuffled epochs (the reference's DistributedSampler shuffles
            # per epoch; dp sharding happens inside the jitted step)
            while True:
                order = rng.permutation(len(ds))
                for s in range(0, len(order) - args.batch + 1, args.batch):
                    b = ds.batch(order[s:s + args.batch])
                    yield {"image": b["image"],
                           "targets": {"boxes": b["boxes"],
                                       "labels": b["labels"],
                                       "masks": b["masks"],
                                       "valid": b["valid"]}}

        batches = gen()

    if args.out:
        os.makedirs(args.out, exist_ok=True)
    run_detection_training(
        params, batches, mesh, cfg,
        num_iters=args.iters, base_lr=args.lr,
        warmup_iters=args.warmup_iters, lr_steps=tuple(args.lr_steps),
        checkpoint_period=args.checkpoint_period, log_period=args.log_period,
        output_dir=args.out or None, seed=args.seed,
        start_iter=args.start_iter,
    )


if __name__ == "__main__":
    main()
