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

from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
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

def make_detection_train_step(mesh: Mesh, cfg, lr: float = 1e-4):
    """Jitted (params, opt_state, batch, key) -> (params, opt_state, loss)
    Mask R-CNN train step, dp-sharded over the image batch: each dp shard
    computes its image's loss (maskrcnn_loss), gradients mean-reduce across
    the mesh — the reference's reduce_loss_dict/DDP all-reduce, emitted by
    GSPMD as a psum over 'dp'."""
    from vido_slam_tpu.models.maskrcnn.losses import total_loss

    opt = make_optimizer(lr)
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
