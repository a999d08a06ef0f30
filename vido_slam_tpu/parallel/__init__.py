from vido_slam_tpu.parallel.mesh import make_mesh, shard_params, shard_batch  # noqa: F401
from vido_slam_tpu.parallel.train import (  # noqa: F401
    TrainState,
    depth_train_step,
    init_train_state,
)
