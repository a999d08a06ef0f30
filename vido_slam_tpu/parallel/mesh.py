"""Device-mesh construction and sharding helpers.

The reference's only distributed machinery is NCCL DDP around Mask R-CNN
training (src/tools/train_net.py:51,162-164; maskrcnn_benchmark/utils/
comm.py) — gradient all-reduce over data-parallel replicas. The TPU-native
replacement is a `jax.sharding.Mesh` with named axes and GSPMD-partitioned
`jit`: collectives (psum for gradients under `dp`, all-gathers for the
`tp`-sharded channel dimensions) are inserted by XLA and ride the ICI.

Axes used here:
  dp — data parallel over the batch (DDP's replacement);
  tp — tensor parallel over conv output channels (no counterpart in the
       reference, which has no model parallelism at all — SURVEY §2.4; added
       because large perception backbones shard naturally along channels).
Pipeline/sequence/expert parallelism have no counterpart in this workload
(no transformer stack; SURVEY §2.4) — the mesh stays 2D.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, dp: Optional[int] = None, tp: Optional[int] = None
) -> Mesh:
    """Factorise the device count into a (dp, tp) mesh. Defaults: put as much
    as possible into dp, tp from what divides the remainder."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if dp is None and tp is None:
        tp = 1
        dp = n
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def param_spec(path: str, value: jnp.ndarray, tp_size: int) -> P:
    """Channel-sharding rule: conv kernels (kh, kw, cin, cout) and fc weights
    (cin, cout) shard cout over 'tp' when divisible; biases/BN stats shard
    over 'tp' when divisible; everything else replicates."""
    if value.ndim == 4 and value.shape[3] % tp_size == 0:
        return P(None, None, None, "tp")
    if value.ndim == 2 and value.shape[1] % tp_size == 0:
        return P(None, "tp")
    if value.ndim == 1 and value.shape[0] % tp_size == 0:
        return P("tp")
    return P()


def shard_params(params: Dict[str, jnp.ndarray], mesh: Mesh) -> Dict[str, jnp.ndarray]:
    tp = mesh.shape["tp"]
    out = {}
    for k, v in params.items():
        sh = NamedSharding(mesh, param_spec(k, v, tp))
        out[k] = jax.device_put(v, sh)
    return out


def shard_batch(batch, mesh: Mesh):
    sh = NamedSharding(mesh, P("dp"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
