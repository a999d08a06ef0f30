"""Multi-chip batched evaluation — scaling the SLAM back-end across a
device mesh.

The reference's only distributed machinery is DDP training (SURVEY §2.4);
its evaluation is strictly single-process. On TPU the natural scale-out
for offline work (multi-sequence KAIST eval, parameter sweeps, map
refinement) is to BATCH whole solver problems and shard the batch over the
`dp` mesh axis: `solve_window_ba` is a fixed-shape pure function, so a
stack of S window problems is one vmapped program and GSPMD splits it
S/dp per chip with zero communication until the final gather.

`sharded_window_ba` is the building block; `evaluate_sequences` runs the
full ATE computation for a batch of trajectories from sharded solves.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vido_slam_tpu.estimation.window_ba import WindowBAResult, solve_window_ba


class BatchedWindowProblem(NamedTuple):
    """S stacked fixed-shape window problems (leading axis = sequence)."""

    Twc0: jnp.ndarray         # (S, W, 4, 4)
    odom: jnp.ndarray         # (S, W-1, 4, 4)
    odom_valid: jnp.ndarray   # (S, W-1)
    X0: jnp.ndarray           # (S, P, 3)
    obs: jnp.ndarray          # (S, W, P, 3)
    obs_valid: jnp.ndarray    # (S, W, P)
    point_valid: jnp.ndarray  # (S, P)
    frame_valid: jnp.ndarray  # (S, W)


def sharded_window_ba(
    mesh: Mesh, probs: BatchedWindowProblem, max_iters: int = 15
) -> WindowBAResult:
    """Solve S window problems dp-sharded over the mesh; each chip runs
    S/dp independent LM solves (no collectives inside — GSPMD only gathers
    the stacked results)."""

    @partial(jax.jit, static_argnames=("max_iters",))
    def run(pr: BatchedWindowProblem, max_iters: int):
        return jax.vmap(
            lambda t, o, ov, x, ob, obv, pv, fv: solve_window_ba(
                t, o, ov, x, ob, obv, pv, fv, max_iters=max_iters)
        )(pr.Twc0, pr.odom, pr.odom_valid, pr.X0, pr.obs, pr.obs_valid,
          pr.point_valid, pr.frame_valid)

    sh = NamedSharding(mesh, P("dp"))
    probs = jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sh), probs)
    return run(probs, max_iters)


def evaluate_sequences(mesh: Mesh, probs: BatchedWindowProblem,
                       gt_Twc: jnp.ndarray, max_iters: int = 15):
    """Sharded solves + per-sequence ATE RMSE against GT camera-to-world
    poses (S, W, 4, 4). Returns (result, ate (S,))."""
    res = sharded_window_ba(mesh, probs, max_iters)
    c_est = res.Twc[..., :3, 3]
    c_gt = jnp.asarray(gt_Twc)[..., :3, 3]
    fv = jnp.asarray(probs.frame_valid)
    d2 = jnp.sum((c_est - c_gt) ** 2, axis=-1) * fv
    ate = jnp.sqrt(jnp.sum(d2, axis=-1) / jnp.maximum(fv.sum(-1), 1))
    return res, ate


# ---------------------------------------------------------------------------
# dp-sharded detection inference + gathered evaluation — the TPU-native
# counterpart of the reference's multi-GPU detection path
# (maskrcnn_benchmark/engine/inference.py:11-86: DistributedSampler shards
# the dataset, each worker runs the model, predictions are all_gather'd to
# rank 0 and scored). Here GSPMD shards the image batch over the `dp` axis
# and the "gather" is the resulting replicated output — utils/comm.py's
# all_gather/synchronize have no hand-written equivalent to maintain.
# ---------------------------------------------------------------------------

def sharded_detection_inference(mesh: Mesh, params, images: jnp.ndarray,
                                cfg):
    """Run Mask R-CNN inference on a batch of images (B, H, W, 3), batch
    sharded over `dp`. Returns a MaskRCNNOutput with leading dim B, fully
    gathered (replicated) — every host sees all detections, like rank-0
    after _accumulate_predictions_from_multiple_gpus."""
    from vido_slam_tpu.models.maskrcnn.model import maskrcnn_inference

    B = images.shape[0]
    assert B % mesh.shape["dp"] == 0, "batch must divide the dp axis"
    sh = NamedSharding(mesh, P("dp"))
    images = jax.device_put(jnp.asarray(images), sh)
    params = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), params)

    @jax.jit
    def run(params, images):
        out = jax.vmap(
            lambda img: maskrcnn_inference(params, img[None], cfg)
        )(images)
        # explicit gather: constrain outputs replicated so the fetch is the
        # cross-device accumulation step
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P())), out)

    with mesh:
        return run(params, images)


def paste_instance_masks_np(boxes, masks28, valid, out_hw, in_hw,
                            mask_threshold: float = 0.5) -> np.ndarray:
    """Per-instance full-image binary masks, host numpy — the Masker of
    the reference's eval prep (mask_head/inference.py): expand_boxes
    scale (28+2)/28, pad 1, then — like paste_mask_in_image — the
    expanded box is ROUNDED TO INTEGER bounds (`box.to(torch.int32)`,
    TO_REMOVE=1) before the bilinear resize and integer paste, so
    thresholded masks land on the same pixels as the reference eval.
    boxes (D, 4) in model-input coords; returns (D, out_h, out_w) bool."""
    out_h, out_w = out_hw
    in_h, in_w = in_hw
    boxes = np.asarray(boxes, np.float64) * np.asarray(
        [out_w / in_w, out_h / in_h, out_w / in_w, out_h / in_h])
    masks = np.pad(np.asarray(masks28, np.float64),
                   ((0, 0), (1, 1), (1, 1)))  # (D, 30, 30)
    valid = np.asarray(valid, bool)
    D = boxes.shape[0]
    out = np.zeros((D, out_h, out_w), bool)
    ks = np.arange(30, dtype=np.float64)
    xs = np.arange(out_w, dtype=np.float64)
    ys = np.arange(out_h, dtype=np.float64)
    for d in range(D):
        if not valid[d]:
            continue
        x0, y0, x1, y1 = boxes[d]
        cx, cy = (x0 + x1) * 0.5, (y0 + y1) * 0.5
        hw = (x1 - x0) * 0.5 * (30.0 / 28.0)
        hh = (y1 - y0) * 0.5 * (30.0 / 28.0)
        # torch `.to(torch.int32)` truncates toward zero
        bx0 = float(np.trunc(cx - hw)); bx1 = float(np.trunc(cx + hw))
        by0 = float(np.trunc(cy - hh)); by1 = float(np.trunc(cy + hh))
        w = max(bx1 - bx0 + 1.0, 1.0)   # TO_REMOVE = 1
        h = max(by1 - by0 + 1.0, 1.0)
        # F.interpolate(align_corners=False): out pixel j samples input
        # coordinate (j+0.5)*(30/size)-0.5, edge-clamped
        u = np.clip((xs - bx0 + 0.5) * (30.0 / w) - 0.5, 0.0, 29.0)
        v = np.clip((ys - by0 + 0.5) * (30.0 / h) - 0.5, 0.0, 29.0)
        Rx = np.maximum(0.0, 1.0 - np.abs(u[:, None] - ks))  # (W, 30)
        Ry = np.maximum(0.0, 1.0 - np.abs(v[:, None] - ks))  # (H, 30)
        val = Ry @ masks[d] @ Rx.T
        # integer paste window [y_0, y_1) x [x_0, x_1)
        inside = ((ys[:, None] >= max(by0, 0.0))
                  & (ys[:, None] < min(by1 + 1.0, float(out_h)))
                  & (xs[None, :] >= max(bx0, 0.0))
                  & (xs[None, :] < min(bx1 + 1.0, float(out_w))))
        out[d] = (val > mask_threshold) & inside
    return out


def predictions_from_output(out, in_hw, out_hw=None, with_masks=True):
    """Gathered MaskRCNNOutput with leading batch dim -> the per-image
    prediction dicts `data/coco_eval.compute_map` consumes. Drops invalid
    slots; rescales boxes from model-input to `out_hw` coordinates and
    pastes per-instance binary masks (prepare_for_coco_segmentation's
    role in the reference eval)."""
    in_h, in_w = in_hw
    out_h, out_w = out_hw if out_hw is not None else in_hw
    sx, sy = out_w / in_w, out_h / in_h
    boxes = np.asarray(out.boxes)
    scores = np.asarray(out.scores)
    labels = np.asarray(out.labels)
    valid = np.asarray(out.valid).astype(bool)
    masks28 = np.asarray(out.masks28)
    preds = []
    for i in range(boxes.shape[0]):
        v = valid[i]
        p = {
            "boxes": boxes[i][v] * np.asarray([sx, sy, sx, sy]),
            "scores": scores[i][v],
            "labels": labels[i][v],
        }
        if with_masks:
            p["masks"] = paste_instance_masks_np(
                boxes[i][v], masks28[i][v], np.ones(int(v.sum()), bool),
                (out_h, out_w), in_hw)
        preds.append(p)
    return preds


def sharded_coco_evaluation(mesh: Mesh, params, images, cfg, ground_truth,
                            out_hw=None, iou_types=("bbox", "segm")):
    """The TPU-native counterpart of the reference's distributed eval loop
    (engine/inference.py:11-86): dp-shard the image batch, run the model
    per shard, gather (GSPMD replication = _accumulate_predictions_from_
    multiple_gpus), and score with the FULL COCO protocol
    (data/coco_eval.compute_map) for each iou_type.

    Returns {iou_type: metrics dict} with mAP/AP50/AP75/APsmall..AR100."""
    from vido_slam_tpu.data.coco_eval import compute_map

    out = sharded_detection_inference(mesh, params, images, cfg)
    preds = predictions_from_output(
        out, (cfg.input_h, cfg.input_w), out_hw,
        with_masks="segm" in iou_types)
    return {
        t: compute_map(preds, ground_truth, iou_type=t) for t in iou_types
    }


def detection_ap50(pred_boxes, pred_scores, pred_valid,
                   gt_boxes, gt_valid) -> float:
    """Single-class average precision at IoU 0.5 over a gathered batch —
    the small-scale stand-in for COCO mAP used by the mesh tests.
    pred_boxes (B, D, 4), pred_scores (B, D), pred_valid (B, D);
    gt_boxes (B, G, 4), gt_valid (B, G). Host-side numpy."""
    pred_boxes = np.asarray(pred_boxes)
    pred_scores = np.asarray(pred_scores)
    pred_valid = np.asarray(pred_valid)
    gt_boxes = np.asarray(gt_boxes)
    gt_valid = np.asarray(gt_valid)

    rows = []
    n_gt = int(gt_valid.sum())
    for b in range(pred_boxes.shape[0]):
        for d in np.argsort(-pred_scores[b]):
            if not pred_valid[b, d]:
                continue
            rows.append((float(pred_scores[b, d]), b, pred_boxes[b, d]))
    rows.sort(key=lambda r: -r[0])

    def iou(a, bx):
        x1 = np.maximum(a[0], bx[:, 0]); y1 = np.maximum(a[1], bx[:, 1])
        x2 = np.minimum(a[2], bx[:, 2]); y2 = np.minimum(a[3], bx[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        ua = ((a[2] - a[0]) * (a[3] - a[1])
              + (bx[:, 2] - bx[:, 0]) * (bx[:, 3] - bx[:, 1]) - inter)
        return inter / np.maximum(ua, 1e-9)

    matched = [set() for _ in range(gt_boxes.shape[0])]
    tp, fp = [], []
    for score, b, box in rows:
        g = gt_boxes[b][gt_valid[b]]
        if g.shape[0] == 0:
            fp.append(1); tp.append(0)
            continue
        ious = iou(box, g)
        j = int(np.argmax(ious))
        if ious[j] >= 0.5 and j not in matched[b]:
            matched[b].add(j)
            tp.append(1); fp.append(0)
        else:
            tp.append(0); fp.append(1)
    if not tp or n_gt == 0:
        return 0.0
    tp = np.cumsum(tp); fp = np.cumsum(fp)
    recall = tp / n_gt
    precision = tp / np.maximum(tp + fp, 1e-9)
    # standard all-points interpolation
    ap = 0.0
    for r in np.linspace(0, 1, 101):
        p = precision[recall >= r]
        ap += (p.max() if p.size else 0.0) / 101
    return float(ap)
