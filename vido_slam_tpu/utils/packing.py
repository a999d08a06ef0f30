"""Pack a pytree of device arrays into two flat buffers (f32 + i32) for a
single-RPC host fetch.

On the tunneled TPU transport every `device_get` leaf is its own serialized
round trip (~0.5-1.5 ms each); the per-frame StepOutputs pytree has ~36
leaves, which profiled at ~48 ms/frame of pure fetch latency — 2 leaves
make it one. The pack is a device-side concatenate of a few hundred KB
(trivial next to the step itself); the unpack is host-side numpy slicing.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_float(dtype) -> bool:
    return jnp.issubdtype(dtype, jnp.floating)


def pack_pytree(tree) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side: flatten + concat all leaves into (f32_buf, i32_buf).
    Float leaves are cast to f32, bool/int leaves to i32 (lossless for all
    StepOutputs dtypes)."""
    leaves = jax.tree_util.tree_leaves(tree)
    f32 = [l.astype(jnp.float32).reshape(-1) for l in leaves
           if _is_float(l.dtype)]
    i32 = [l.astype(jnp.int32).reshape(-1) for l in leaves
           if not _is_float(l.dtype)]
    fbuf = jnp.concatenate(f32) if f32 else jnp.zeros((0,), jnp.float32)
    ibuf = jnp.concatenate(i32) if i32 else jnp.zeros((0,), jnp.int32)
    return fbuf, ibuf


class PackSpec(NamedTuple):
    treedef: Any
    metas: List[tuple]   # per leaf: (kind 'f'/'i', offset, size, shape, dtype)


def make_spec(struct_tree) -> PackSpec:
    """Host-side: build the unpack layout from a tree of ShapeDtypeStructs
    (e.g. from jax.eval_shape of the unpacked step) in the same leaf order
    pack_pytree uses."""
    leaves, treedef = jax.tree_util.tree_flatten(struct_tree)
    metas = []
    fo = io = 0
    for l in leaves:
        n = int(np.prod(l.shape)) if l.shape else 1
        if _is_float(l.dtype):
            metas.append(("f", fo, n, l.shape, np.dtype(l.dtype)))
            fo += n
        else:
            metas.append(("i", io, n, l.shape, np.dtype(l.dtype)))
            io += n
    return PackSpec(treedef=treedef, metas=metas)


def unpack_pytree(fbuf: np.ndarray, ibuf: np.ndarray, spec: PackSpec):
    """Host-side: slice the fetched buffers back into the original pytree
    (numpy arrays with the original shapes/dtypes)."""
    leaves = []
    for kind, off, n, shape, dtype in spec.metas:
        src = fbuf if kind == "f" else ibuf
        leaves.append(np.asarray(src[off:off + n]).reshape(shape).astype(
            dtype, copy=False))
    return jax.tree_util.tree_unflatten(spec.treedef, leaves)
