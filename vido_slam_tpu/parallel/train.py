"""Multi-chip training step for the perception networks.

The reference's training path is torch DDP + SGD over Mask R-CNN
(src/tools/train_net.py, maskrcnn_benchmark/engine/trainer.py with
`reduce_loss_dict`). The TPU-native counterpart: one jitted train step over
a (dp, tp) `Mesh` — the batch is dp-sharded, parameters are tp-sharded along
output channels, and GSPMD inserts the gradient psum (DDP's all-reduce) and
the tp all-gathers automatically.

The demonstration workload is supervised disparity training of MonoDepth2
(L1 on inverse depth) — the same network family the SLAM pipeline serves —
with optax Adam. The step function is model-agnostic: pass any (params,
batch) loss.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Tuple

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vido_slam_tpu.models.monodepth2 import monodepth2_disp
from vido_slam_tpu.parallel.mesh import param_spec, shard_params


class TrainState(NamedTuple):
    params: Dict[str, jnp.ndarray]
    opt_state: optax.OptState
    step: jnp.ndarray


def depth_loss(params, batch):
    """L1 between predicted disparity and target inverse depth."""
    pred = monodepth2_disp(params, batch["image"])[..., 0]
    return jnp.mean(jnp.abs(pred - batch["target"]))


def make_optimizer(lr: float = 1e-4) -> optax.GradientTransformation:
    return optax.adam(lr)


def init_train_state(params, mesh: Mesh, lr: float = 1e-4) -> TrainState:
    params = shard_params(params, mesh)
    opt = make_optimizer(lr)
    opt_state = opt.init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.int32(0))


def make_train_step(
    mesh: Mesh,
    loss_fn: Callable = depth_loss,
    lr: float = 1e-4,
):
    """Returns a jitted (state, batch) -> (state, loss) step with explicit
    sharding constraints; XLA/GSPMD lowers the gradient reduction to a psum
    over 'dp' and channel collectives over 'tp' on ICI."""
    opt = make_optimizer(lr)
    tp = mesh.shape["tp"]

    def step(state: TrainState, batch) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # keep parameters in their tp-sharded layout
        params = {
            k: jax.lax.with_sharding_constraint(
                v, NamedSharding(mesh, param_spec(k, v, tp))
            )
            for k, v in params.items()
        }
        return TrainState(params, opt_state, state.step + 1), loss

    batch_sharding = NamedSharding(mesh, P("dp"))
    return jax.jit(
        step,
        in_shardings=(None, {"image": batch_sharding, "target": batch_sharding}),
    )


def depth_train_step(state: TrainState, batch, mesh: Mesh):
    """One-off convenience wrapper (compiles per mesh)."""
    return make_train_step(mesh)(state, batch)


# ---------------------------------------------------------------------------
# Detection training (the reference's actual training workload:
# tools/train_net.py — DDP Mask R-CNN)
# ---------------------------------------------------------------------------

def warmup_multistep_schedule(
    base_lr: float = 0.01,
    warmup_factor: float = 1.0 / 3.0,
    warmup_iters: int = 500,
    steps: Tuple[int, ...] = (120000, 160000),
    gamma: float = 0.1,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """The reference's WarmupMultiStepLR (maskrcnn_benchmark/solver/
    lr_scheduler.py: linear warmup from warmup_factor*base_lr over
    warmup_iters, then base_lr * gamma^(#milestones passed); defaults from
    config/defaults.py SOLVER.*)."""

    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        # reference semantics: warmup applies only while step < warmup_iters
        # (warmup_iters=0 means no warmup at all)
        alpha = jnp.where(step >= warmup_iters, 1.0,
                          step / max(warmup_iters, 1))
        warm = warmup_factor * (1.0 - alpha) + alpha
        n_passed = jnp.sum(
            jnp.asarray([step >= s for s in steps], jnp.float32))
        return base_lr * warm * gamma ** n_passed

    return lr


def make_detection_optimizer(
    base_lr: float = 0.01,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    warmup_factor: float = 1.0 / 3.0,
    warmup_iters: int = 500,
    steps: Tuple[int, ...] = (120000, 160000),
    gamma: float = 0.1,
    bias_lr_factor: float = 2.0,
) -> optax.GradientTransformation:
    """The reference solver (tools/train_net.py -> solver/build.py
    make_optimizer): SGD+momentum with WarmupMultiStepLR; biases get
    lr * BIAS_LR_FACTOR(2) and WEIGHT_DECAY_BIAS(0)
    (config/defaults.py:394-409). Defaults are the recipe of the config
    the ROS node runs (e2e_mask_rcnn_X_101_32x8d_FPN_1x.yaml:41-45:
    lr 0.01, wd 1e-4, steps 120k/160k for 180k iters at batch 8) —
    that assumes a pretrained ImageNet backbone; random-init training
    wants ~10x lower lr."""
    sched = warmup_multistep_schedule(
        base_lr, warmup_factor, warmup_iters, steps, gamma)
    is_bias = lambda p: p.ndim <= 1  # noqa: E731  (biases/BN scales)

    def mask(fn):
        return lambda params: {k: fn(v) for k, v in params.items()}

    return optax.chain(
        optax.masked(optax.add_decayed_weights(weight_decay),
                     mask(lambda p: not is_bias(p))),
        optax.masked(optax.scale(bias_lr_factor), mask(is_bias)),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_schedule(lambda step: -sched(step)),
    )


def make_detection_train_step(mesh: Mesh, cfg, lr: float = 1e-4,
                              opt: Optional[optax.GradientTransformation] = None):
    """Jitted (params, opt_state, batch, key) -> (params, opt_state, loss)
    Mask R-CNN train step, dp-sharded over the image batch: each dp shard
    computes its image's loss (maskrcnn_loss), gradients mean-reduce across
    the mesh — the reference's reduce_loss_dict/DDP all-reduce, emitted by
    GSPMD as a psum over 'dp'. `opt` overrides the default Adam (pass
    make_detection_optimizer() for the reference SGD solver)."""
    from vido_slam_tpu.models.maskrcnn.losses import total_loss

    opt = opt if opt is not None else make_optimizer(lr)
    tp = mesh.shape["tp"]

    def loss_fn(params, batch, key):
        def one(img, boxes, labels, masks, valid, k):
            from vido_slam_tpu.models.maskrcnn.losses import DetectionTargets

            tg = DetectionTargets(boxes=boxes, labels=labels, masks=masks,
                                  valid=valid)
            return total_loss(params, img[None], tg, k, cfg)

        t = batch["targets"]
        keys = jax.random.split(key, batch["image"].shape[0])
        losses = jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0))(
            batch["image"], t["boxes"], t["labels"], t["masks"], t["valid"],
            keys,
        )
        return jnp.mean(losses)

    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = {
            k: jax.lax.with_sharding_constraint(
                v, NamedSharding(mesh, param_spec(k, v, tp))
            )
            for k, v in params.items()
        }
        return params, opt_state, loss

    bsh = NamedSharding(mesh, P("dp"))
    shardings = {"image": bsh,
                 "targets": {"boxes": bsh, "labels": bsh, "masks": bsh,
                             "valid": bsh}}
    return jax.jit(step, in_shardings=(None, None, shardings, None))


def run_detection_training(
    params: Dict[str, jnp.ndarray],
    batches,
    mesh: Mesh,
    cfg,
    *,
    num_iters: int,
    base_lr: float = 0.01,
    warmup_iters: int = 500,
    lr_steps: Tuple[int, ...] = (120000, 160000),
    checkpoint_period: int = 2500,
    log_period: int = 20,
    output_dir: Optional[str] = None,
    seed: int = 0,
    start_iter: int = 0,
    log_fn: Callable[[str], None] = print,
) -> Dict[str, jnp.ndarray]:
    """The reference training loop (maskrcnn_benchmark/engine/trainer.py
    do_train + tools/train_net.py): iterate batches through the dp-sharded
    step with the SGD/WarmupMultiStepLR solver, log a smoothed loss + ETA
    every `log_period` iters (MetricLogger semantics: median over a 20-deep
    window), checkpoint params every `checkpoint_period` and at the end
    (DetectronCheckpointer counterpart via utils/checkpoint.save_params).

    `batches` is an iterable of {"image", "targets": {...}} dicts (see
    CocoDetectionDataset.batch); it is cycled if it is a sequence shorter
    than num_iters. Returns the final params.
    """
    import itertools
    import time as _time
    from collections import deque

    from vido_slam_tpu.utils.checkpoint import save_params

    opt = make_detection_optimizer(
        base_lr=base_lr, warmup_iters=warmup_iters, steps=lr_steps)
    opt_state = opt.init(params)
    step = make_detection_train_step(mesh, cfg, opt=opt)
    sched = warmup_multistep_schedule(
        base_lr, warmup_iters=warmup_iters, steps=lr_steps)

    if hasattr(batches, "__getitem__"):
        it = itertools.islice(itertools.cycle(batches), num_iters - start_iter)
    else:
        it = itertools.islice(batches, num_iters - start_iter)

    key = jax.random.PRNGKey(seed)
    window = deque(maxlen=20)
    t0 = _time.perf_counter()
    i = start_iter
    for i, batch in enumerate(it, start=start_iter):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, batch, k)
        window.append(float(loss))
        if (i + 1) % log_period == 0 or i + 1 == num_iters:
            done = i + 1 - start_iter
            rate = (_time.perf_counter() - t0) / max(done, 1)
            eta_s = rate * (num_iters - (i + 1))
            log_fn(
                f"iter {i + 1}/{num_iters}  loss {float(loss):.4f} "
                f"(median {float(np.median(window)):.4f})  "
                f"lr {float(sched(i)):.6f}  "
                f"{rate:.2f} s/it  eta {eta_s/60:.1f} min"
            )
        if output_dir and (i + 1) % checkpoint_period == 0:
            save_params(
                os.path.join(output_dir, f"model_{i + 1:07d}"), params)
    if output_dir:
        save_params(os.path.join(output_dir, "model_final"), params)
    return params
