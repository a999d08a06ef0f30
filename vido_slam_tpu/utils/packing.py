"""Pack a pytree of device arrays into two flat buffers (f32 + i32) for a
single-RPC host fetch.

On the tunneled TPU transport every `device_get` leaf is its own serialized
round trip (~0.5-1.5 ms each); the per-frame StepOutputs pytree has ~36
leaves, which profiled at ~48 ms/frame of pure fetch latency — 2 leaves
make it one. The transport is also BANDWIDTH-bound (~50 MB/s measured), so
sub-word dtypes are packed at their true width instead of widening to i32:
bool/[u]int8 leaves ride 4-per-word and [u]int16 leaves 2-per-word via
`lax.bitcast_convert_type` (TPU and host are both little-endian, so the
host-side unpack is a plain numpy `.view`). The pack is a device-side
concatenate of ~100 KB (trivial next to the step itself); the unpack is
host-side numpy slicing.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _is_float(dtype) -> bool:
    return jnp.issubdtype(dtype, jnp.floating)


def _bytes_per_elem(dtype) -> int:
    return np.dtype(dtype).itemsize if np.dtype(dtype) != np.bool_ else 1


def _pack_nonfloat(leaf: jnp.ndarray) -> jnp.ndarray:
    """Flatten a bool/int leaf into int32 words at its true byte width."""
    dt = np.dtype(leaf.dtype) if leaf.dtype != jnp.bool_ else np.dtype(np.bool_)
    if dt == np.bool_ or dt.itemsize == 1:
        b = leaf.astype(jnp.uint8).reshape(-1)
        pad = (-b.size) % 4
        if pad:
            b = jnp.pad(b, (0, pad))
        return lax.bitcast_convert_type(b.reshape(-1, 4), jnp.int32)
    if dt.itemsize == 2:
        h = leaf.astype(jnp.int16).reshape(-1)
        pad = (-h.size) % 2
        if pad:
            h = jnp.pad(h, (0, pad))
        return lax.bitcast_convert_type(h.reshape(-1, 2), jnp.int32)
    return leaf.astype(jnp.int32).reshape(-1)


def _words_for(dtype, n_elems: int) -> int:
    bpe = _bytes_per_elem(dtype)
    if bpe >= 4:
        return n_elems
    per = 4 // bpe
    return -(-n_elems // per)


def pack_pytree(tree) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side: flatten + concat all leaves into (f32_buf, i32_buf).
    Float leaves are cast to f32; bool/int leaves keep their byte width
    inside the i32 word stream (lossless for all StepOutputs dtypes)."""
    leaves = jax.tree_util.tree_leaves(tree)
    f32 = [l.astype(jnp.float32).reshape(-1) for l in leaves
           if _is_float(l.dtype)]
    i32 = [_pack_nonfloat(l) for l in leaves if not _is_float(l.dtype)]
    fbuf = jnp.concatenate(f32) if f32 else jnp.zeros((0,), jnp.float32)
    ibuf = jnp.concatenate(i32) if i32 else jnp.zeros((0,), jnp.int32)
    return fbuf, ibuf


class PackSpec(NamedTuple):
    treedef: Any
    metas: List[tuple]   # per leaf: (kind 'f'/'i', offset, n_words, shape, dtype)


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
            nw = _words_for(l.dtype, n)
            metas.append(("i", io, nw, l.shape, np.dtype(l.dtype)))
            io += nw
    return PackSpec(treedef=treedef, metas=metas)


class ParamPackSpec(NamedTuple):
    treedef: Any
    metas: Tuple[tuple, ...]   # per leaf: (buf_index, offset, n, shape)
    keys: Tuple[str, ...]      # dtype names, one per buffer


def pack_params(tree) -> Tuple[Tuple[jnp.ndarray, ...], ParamPackSpec]:
    """Device-side: concatenate all leaves of a (large, inference-static)
    parameter pytree into ONE flat buffer per dtype.

    Why: closing a jit over ~650 weight arrays bakes them into the
    executable as literals — a ~0.5 GB serialized program that a remote
    (tunneled) TPU runtime must re-load on every process start, measured
    at multiple MINUTES of startup. Passing the dicts as jit arguments
    instead costs ~1.2 ms of per-call signature flattening. Packing to
    one-buffer-per-dtype gets both: O(1) dispatch leaves and a small
    executable, with the weights staying resident on device."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = tuple(sorted({str(l.dtype) for l in leaves}))
    offs = {k: 0 for k in keys}
    parts = {k: [] for k in keys}
    metas = []
    for l in leaves:
        k = str(l.dtype)
        n = int(np.prod(l.shape)) if l.shape else 1
        metas.append((keys.index(k), offs[k], n, tuple(l.shape)))
        offs[k] += n
        parts[k].append(l.reshape(-1))
    bufs = tuple(jnp.concatenate(parts[k]) for k in keys)
    return bufs, ParamPackSpec(treedef, tuple(metas), keys)


def unpack_params(bufs, spec: ParamPackSpec):
    """Rebuild the parameter pytree from packed buffers; works both eagerly
    and under jit (static slices of traced buffer arguments)."""
    leaves = [bufs[g][o:o + n].reshape(shape)
              for g, o, n, shape in spec.metas]
    return jax.tree_util.tree_unflatten(spec.treedef, leaves)


def unpack_pytree(fbuf: np.ndarray, ibuf: np.ndarray, spec: PackSpec):
    """Host-side: slice the fetched buffers back into the original pytree
    (numpy arrays with the original shapes/dtypes)."""
    leaves = []
    for kind, off, nw, shape, dtype in spec.metas:
        n = int(np.prod(shape)) if shape else 1
        if kind == "f":
            leaves.append(np.asarray(fbuf[off:off + nw]).reshape(shape).astype(
                dtype, copy=False))
            continue
        words = np.ascontiguousarray(ibuf[off:off + nw])
        bpe = _bytes_per_elem(dtype)
        if bpe >= 4:
            arr = words.astype(dtype, copy=False)[:n]
        elif bpe == 2:
            arr = words.view(np.int16)[:n].astype(dtype, copy=False)
        else:
            raw = words.view(np.uint8)[:n]
            arr = raw.astype(dtype, copy=False) if dtype != np.bool_ \
                else raw.astype(np.bool_)
        leaves.append(arr.reshape(shape))
    return jax.tree_util.tree_unflatten(spec.treedef, leaves)
