"""MonoDepth2 self-supervised training — the TPU counterpart of the
reference's vendored upstream trainer
(src/thirdparty/mono_depth2/src/depricated/trainer.py, 630 LoC) and
evaluation metrics (depricated/evaluate_depth.py).

The reference trains depth by photometric self-supervision: the depth net
predicts multi-scale disparity for the centre frame, pose networks predict
relative camera motion to the temporal neighbours, each neighbour is warped
into the centre view through the predicted depth, and the loss is the
per-pixel MINIMUM (over sources) of 0.85*SSIM + 0.15*L1 reprojection error,
with identity-reprojection automasking and edge-aware disparity smoothness
(trainer.py:341-496 compute_losses/generate_images_pred, layers.py:202-248).

TPU design notes:
  - one jitted loss over fixed-shape NHWC batches; the per-scale Python loop
    unrolls at trace time (4 scales);
  - the warp is two batched matmul-free ops: a (4,4)x(4,N) projection and a
    bilinear gather (border padding) — both vectorise;
  - `make_selfsup_train_step` dp-shards the batch over a Mesh exactly like
    the detection trainer (parallel/train.py); GSPMD inserts the gradient
    psum (the reference runs this single-GPU, multi-chip here is a superset);
  - grid_sample uses align_corners=True semantics: the vendored code targets
    torch 0.4.1 where that was the default, and Project3D's (size-1)
    normalisation (layers.py:190-192) only cancels exactly under it.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vido_slam_tpu.models.layers import Params
from vido_slam_tpu.models.monodepth2 import (
    depth_decoder_forward,
    disp_to_depth,
    init_monodepth2_params,
    init_pose_decoder_params,
    pose_decoder_forward,
    resnet18_features,
)
from vido_slam_tpu.ops.warp import resize_bilinear


# ---------------------------------------------------------------------------
# layers.py counterparts
# ---------------------------------------------------------------------------

def ssim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """SSIM loss map, NHWC -> NHWC (layers.py:218-248): reflection-pad 1,
    3x3 average-pool statistics, clamp((1 - SSIM)/2, 0, 1)."""
    def pool(a):
        a = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return jax.lax.reduce_window(
            a, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
        ) / 9.0

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu_x, mu_y = pool(x), pool(y)
    sig_x = pool(x * x) - mu_x * mu_x
    sig_y = pool(y * y) - mu_y * mu_y
    sig_xy = pool(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + c1) * (2 * sig_xy + c2)
    d = (mu_x * mu_x + mu_y * mu_y + c1) * (sig_x + sig_y + c2)
    return jnp.clip((1 - n / d) / 2, 0.0, 1.0)


def reprojection_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """0.85*SSIM + 0.15*L1, channel-meaned -> (N, H, W)
    (trainer.py:393-405)."""
    l1 = jnp.mean(jnp.abs(target - pred), axis=-1)
    ss = jnp.mean(ssim(pred, target), axis=-1)
    return 0.85 * ss + 0.15 * l1


def get_smooth_loss(disp: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware first-order disparity smoothness (layers.py:202-215).
    disp (N, H, W, 1), img (N, H, W, 3)."""
    dx = jnp.abs(disp[:, :, :-1] - disp[:, :, 1:])
    dy = jnp.abs(disp[:, :-1] - disp[:, 1:])
    ix = jnp.mean(jnp.abs(img[:, :, :-1] - img[:, :, 1:]), -1, keepdims=True)
    iy = jnp.mean(jnp.abs(img[:, :-1] - img[:, 1:]), -1, keepdims=True)
    return jnp.mean(dx * jnp.exp(-ix)) + jnp.mean(dy * jnp.exp(-iy))


def rot_from_axisangle(vec: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) axis-angle -> (N, 4, 4) rotation (layers.py:64-103,
    Rodrigues with the reference's 1e-7 axis regulariser)."""
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)          # (N, 1)
    axis = vec / (angle + 1e-7)
    ca = jnp.cos(angle)[..., None]
    sa = jnp.sin(angle)[..., None]
    C = 1 - ca
    x, y, z = axis[:, 0, None, None], axis[:, 1, None, None], axis[:, 2, None, None]
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    rot = jnp.block([
        [x * x * C + ca, x * y * C - z * sa, z * x * C + y * sa, zero],
        [x * y * C + z * sa, y * y * C + ca, y * z * C - x * sa, zero],
        [z * x * C - y * sa, y * z * C + x * sa, z * z * C + ca, zero],
        [zero, zero, zero, one],
    ])
    return rot


def transformation_from_parameters(
    axisangle: jnp.ndarray, translation: jnp.ndarray, invert: bool = False
) -> jnp.ndarray:
    """(N, 3), (N, 3) -> (N, 4, 4): T = R @ t for forward, t' @ R^T for
    invert (layers.py:28-45)."""
    R = rot_from_axisangle(axisangle)
    t = jnp.where(invert, -translation, translation)
    if invert:
        R = jnp.swapaxes(R, 1, 2)
    T = jnp.broadcast_to(jnp.eye(4), R.shape).at[:, :3, 3].set(t)
    return jnp.matmul(R, T) if invert else jnp.matmul(T, R)


def grid_sample_border(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """torch F.grid_sample(padding_mode='border', align_corners=True):
    img (N, H, W, C), grid (N, H, W, 2) normalised coords in [-1, 1]."""
    N, H, W, C = img.shape
    x = (grid[..., 0] + 1) * 0.5 * (W - 1)
    y = (grid[..., 1] + 1) * 0.5 * (H - 1)
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    batch = jnp.arange(N)[:, None, None]

    def tap(xi, yi):
        return img[batch, jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]

    top = tap(x0i, y0i) * (1 - fx) + tap(x0i + 1, y0i) * fx
    bot = tap(x0i, y0i + 1) * (1 - fx) + tap(x0i + 1, y0i + 1) * fx
    return top * (1 - fy) + bot * fy


def project_warp(
    src: jnp.ndarray, depth: jnp.ndarray, K: jnp.ndarray, inv_K: jnp.ndarray,
    T: jnp.ndarray,
) -> jnp.ndarray:
    """BackprojectDepth + Project3D + grid_sample (layers.py:139-193,
    trainer.py:377-388): warp the source frame into the target view through
    the target's depth and the relative pose T (target->source).

    src (N, H, W, 3), depth (N, H, W), K/inv_K/T (N, 4, 4)."""
    N, H, W = depth.shape
    jj = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    ii = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    pix = jnp.stack([ii.ravel(), jj.ravel(), jnp.ones(H * W)], 0)   # (3, HW)
    cam = jnp.einsum("nij,jk->nik", inv_K[:, :3, :3], pix)          # (N,3,HW)
    cam = depth.reshape(N, 1, -1) * cam
    cam = jnp.concatenate([cam, jnp.ones((N, 1, H * W))], 1)        # (N,4,HW)
    P = jnp.matmul(K, T)[:, :3]                                     # (N,3,4)
    proj = jnp.einsum("nij,njk->nik", P, cam)                       # (N,3,HW)
    xy = proj[:, :2] / (proj[:, 2:3] + 1e-7)
    gx = xy[:, 0].reshape(N, H, W) / (W - 1)
    gy = xy[:, 1].reshape(N, H, W) / (H - 1)
    grid = jnp.stack([gx, gy], -1) * 2.0 - 1.0
    return grid_sample_border(src, grid)


# ---------------------------------------------------------------------------
# pose encoder (ResnetEncoder(18, num_input_images=2) — resnet_encoder.py:
# the conv1 takes 2 stacked frames, weights /2 when loading pretrained)
# ---------------------------------------------------------------------------

def init_pose_encoder_params(key, prefix: str = "pose_encoder") -> Params:
    """ResNet-18 layout with a 6-channel conv1 (two stacked RGB frames)."""
    p = init_monodepth2_params(key)
    out: Dict[str, jnp.ndarray] = {}
    for k, v in p.items():
        if not k.startswith("encoder."):
            continue
        nk = prefix + k[len("encoder"):]
        if k == "encoder.conv1.weight":
            v = jnp.concatenate([v, v], axis=2) / 2.0   # (7,7,6,64)
        out[nk] = v
    return out


def predict_pose(
    params: Params, frame_a: jnp.ndarray, frame_b: jnp.ndarray,
    invert: bool,
) -> jnp.ndarray:
    """separate_resnet pose path (trainer.py:276-293): stack the two frames
    in TEMPORAL order on channels, pose encoder -> PoseDecoder, take the
    first of the two predicted transforms; invert for past frames."""
    x = jnp.concatenate([frame_a, frame_b], axis=-1)
    feats = resnet18_features(params, x, prefix="pose_encoder")
    aa, tt = pose_decoder_forward(params, [feats[-1]], num_frames=2)
    return transformation_from_parameters(aa[:, 0, 0], tt[:, 0, 0], invert)


def init_selfsup_params(key) -> Params:
    """Depth encoder/decoder + pose encoder/decoder in one flat dict."""
    k1, k2, k3 = jax.random.split(key, 3)
    p = dict(init_monodepth2_params(k1))
    p.update(init_pose_encoder_params(k2))
    p.update(init_pose_decoder_params(k3, num_input_features=1, num_frames=2))
    return p


# ---------------------------------------------------------------------------
# the loss (trainer.py process_batch + generate_images_pred + compute_losses)
# ---------------------------------------------------------------------------

class SelfSupBatch(NamedTuple):
    """One training minibatch. color/prev/next: (N, H, W, 3) RGB in [0,1]
    (H, W multiples of 32); K/inv_K at full resolution. stereo/stereo_T are
    optional (the 's' frame, trainer.py:360-362). The *_aug fields are the
    color-jittered copies fed to the networks (inputs[("color_aug", ...)],
    trainer.py:247/276 — the photometric LOSS always uses the clean
    frames); None means no augmentation (val/test)."""
    color: jnp.ndarray
    prev: jnp.ndarray
    next: jnp.ndarray
    K: jnp.ndarray
    inv_K: jnp.ndarray
    stereo: Optional[jnp.ndarray] = None
    stereo_T: Optional[jnp.ndarray] = None
    color_aug: Optional[jnp.ndarray] = None
    prev_aug: Optional[jnp.ndarray] = None
    next_aug: Optional[jnp.ndarray] = None


@partial(jax.jit, static_argnames=("scales", "min_depth", "max_depth",
                                   "disparity_smoothness", "automasking"))
def selfsup_loss(
    params: Params,
    batch: SelfSupBatch,
    key: jnp.ndarray,
    *,
    scales: Tuple[int, ...] = (0, 1, 2, 3),
    min_depth: float = 0.1,
    max_depth: float = 100.0,
    disparity_smoothness: float = 1e-3,
    automasking: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total self-supervised loss + aux dict (per-scale losses, full-res
    depth). Semantics of trainer.py:407-496 with default options
    (avg_reprojection=False, v1_multiscale=False, no predictive mask):
    min-over-sources reprojection with identity automasking (1e-5 noise
    tie-break), edge-aware smoothness 1e-3/2^s on mean-normalised disp."""
    N, H, W, _ = batch.color.shape
    # networks eat the augmented frames, losses the clean ones
    cur_in = batch.color if batch.color_aug is None else batch.color_aug
    prev_in = batch.prev if batch.prev_aug is None else batch.prev_aug
    next_in = batch.next if batch.next_aug is None else batch.next_aug
    feats = resnet18_features(params, cur_in)
    disps = depth_decoder_forward(params, feats)

    # relative poses: prev uses (prev, cur) inverted; next uses (cur, next)
    sources = [(batch.prev, predict_pose(params, prev_in, cur_in, True)),
               (batch.next, predict_pose(params, cur_in, next_in, False))]
    if batch.stereo is not None:
        sources.append((batch.stereo, batch.stereo_T))

    if automasking:
        ident = jnp.stack(
            [reprojection_loss(src, batch.color) for src, _ in sources], 1
        )  # (N, S, H, W)
        ident = ident + jax.random.normal(key, ident.shape) * 1e-5

    total = 0.0
    aux: Dict[str, jnp.ndarray] = {}
    for s in scales:
        disp_s = disps[s]
        disp_full = disp_s if s == 0 else resize_bilinear(disp_s, H, W)
        _, depth = disp_to_depth(disp_full[..., 0], min_depth, max_depth)
        if s == 0:
            aux["depth"] = depth

        reproj = jnp.stack(
            [reprojection_loss(
                project_warp(src, depth, batch.K, batch.inv_K, T), batch.color)
             for src, T in sources], 1)                     # (N, S, H, W)
        combined = (jnp.concatenate([ident, reproj], 1) if automasking
                    else reproj)
        to_optimise = jnp.min(combined, axis=1)
        loss_s = jnp.mean(to_optimise)

        color_s = batch.color if s == 0 else resize_bilinear(
            batch.color, H >> s, W >> s)
        mean_disp = jnp.mean(disp_s, axis=(1, 2), keepdims=True)
        smooth = get_smooth_loss(disp_s / (mean_disp + 1e-7), color_s)
        loss_s = loss_s + disparity_smoothness * smooth / (2 ** s)
        aux[f"loss/{s}"] = loss_s
        total = total + loss_s

    total = total / len(scales)
    return total, aux


def make_selfsup_train_step(mesh, lr: float = 1e-4, aug: bool = False,
                            **loss_kw):
    """dp-sharded jitted (params, opt_state, batch, key) ->
    (params, opt_state, loss): the trainer.py run_epoch step (Adam 1e-4,
    trainer.py:91) over a device mesh — gradients psum over 'dp'."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vido_slam_tpu.parallel.mesh import param_spec

    opt = optax.adam(lr)
    tp = mesh.shape["tp"]

    def loss_fn(params, batch, key):
        loss, _ = selfsup_loss(params, batch, key, **loss_kw)
        return loss

    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = {
            k: jax.lax.with_sharding_constraint(
                v, NamedSharding(mesh, param_spec(k, v, tp)))
            for k, v in params.items()
        }
        return params, opt_state, loss

    bsh = NamedSharding(mesh, P("dp"))
    a = bsh if aug else None   # aug batches carry the *_aug arrays
    batch_sh = SelfSupBatch(color=bsh, prev=bsh, next=bsh, K=bsh, inv_K=bsh,
                            stereo=None, stereo_T=None,
                            color_aug=a, prev_aug=a, next_aug=a)
    return jax.jit(step, in_shardings=(None, None, batch_sh, None))


# ---------------------------------------------------------------------------
# evaluation metrics (depricated/evaluate_depth.py)
# ---------------------------------------------------------------------------

def compute_depth_errors(gt: jnp.ndarray, pred: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 over valid pixels
    (evaluate_depth.py:27-45; also layers.py compute_depth_errors)."""
    thresh = jnp.maximum(gt / pred, pred / gt)
    return {
        "abs_rel": jnp.mean(jnp.abs(gt - pred) / gt),
        "sq_rel": jnp.mean((gt - pred) ** 2 / gt),
        "rmse": jnp.sqrt(jnp.mean((gt - pred) ** 2)),
        "rmse_log": jnp.sqrt(jnp.mean((jnp.log(gt) - jnp.log(pred)) ** 2)),
        "a1": jnp.mean(thresh < 1.25),
        "a2": jnp.mean(thresh < 1.25 ** 2),
        "a3": jnp.mean(thresh < 1.25 ** 3),
    }


def evaluate_depth(
    pred_disp: jnp.ndarray, gt_depth: jnp.ndarray,
    *,
    min_depth: float = 1e-3, max_depth: float = 80.0,
    median_scaling: bool = True,
) -> Dict[str, float]:
    """The evaluate_depth.py scoring recipe for ONE frame: pred depth =
    1/disp resized to GT resolution, mono predictions median-scaled to GT,
    clipped to [min_depth, max_depth], metrics over gt>0 pixels
    (evaluate_depth.py:135-186). pred_disp (h, w), gt_depth (H, W)."""
    import numpy as np

    H, W = gt_depth.shape
    disp = np.asarray(resize_bilinear(
        jnp.asarray(pred_disp)[None, ..., None], H, W))[0, ..., 0]
    pred = 1.0 / np.maximum(disp, 1e-12)
    gt = np.asarray(gt_depth)
    mask = gt > 0
    p, g = pred[mask], gt[mask]
    if median_scaling:
        p = p * np.median(g) / np.median(p)
    p = np.clip(p, min_depth, max_depth)
    return {k: float(v) for k, v in
            compute_depth_errors(jnp.asarray(g), jnp.asarray(p)).items()}


# ---------------------------------------------------------------------------
# pose evaluation (depricated/evaluate_pose.py — the KITTI-odometry snippet
# ATE protocol from SfMLearner)
# ---------------------------------------------------------------------------

def dump_xyz(rel_transforms) -> "np.ndarray":
    """Accumulate source->target relative transforms into camera positions
    (evaluate_pose.py:23-30). rel_transforms: (M, 4, 4) array-like; returns
    (M+1, 3) positions starting at the origin."""
    import numpy as np

    xyzs = [np.zeros(3)]
    cam_to_world = np.eye(4)
    for T in np.asarray(rel_transforms):
        cam_to_world = cam_to_world @ T
        xyzs.append(cam_to_world[:3, 3].copy())
    return np.stack(xyzs)


def compute_ate_snippet(gt_xyz, pred_xyz) -> float:
    """Snippet ATE with first-frame offset alignment and a closed-form
    optimal scale (evaluate_pose.py:34-46; note the reference normalises by
    N, not sqrt(N) — kept verbatim for comparable numbers)."""
    import numpy as np

    gt_xyz = np.asarray(gt_xyz, np.float64)
    pred = np.asarray(pred_xyz, np.float64)
    pred = pred + (gt_xyz[0] - pred[0])[None]
    scale = np.sum(gt_xyz * pred) / max(np.sum(pred ** 2), 1e-12)
    err = pred * scale - gt_xyz
    return float(np.sqrt(np.sum(err ** 2)) / gt_xyz.shape[0])


def evaluate_pose_snippets(pred_rel, gt_rel, track_length: int = 5):
    """The evaluate_pose.py scoring loop (:114-125): slide a
    `track_length`-frame window over the relative-pose sequences, integrate
    both, and score each snippet's ATE. Returns (mean, std, list)."""
    import numpy as np

    pred_rel = np.asarray(pred_rel)
    gt_rel = np.asarray(gt_rel)
    assert pred_rel.shape == gt_rel.shape
    n = pred_rel.shape[0]
    ates = []
    for i in range(0, n - track_length + 2):
        p = dump_xyz(pred_rel[i:i + track_length - 1])
        g = dump_xyz(gt_rel[i:i + track_length - 1])
        ates.append(compute_ate_snippet(g, p))
    return float(np.mean(ates)), float(np.std(ates)), ates
