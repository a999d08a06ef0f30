"""utils/packing.py roundtrip: the single-RPC transport pack must be
lossless for every dtype StepOutputs carries, including the sub-word
(bool / int8 / int16) bitcast packing added for the bandwidth-bound tunnel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vido_slam_tpu.utils.packing import make_spec, pack_pytree, unpack_pytree


def _roundtrip(tree):
    fbuf, ibuf = jax.jit(pack_pytree)(tree)
    struct = jax.eval_shape(lambda t: t, tree)
    spec = make_spec(struct)
    return unpack_pytree(np.asarray(fbuf), np.asarray(ibuf), spec)


class TestPackRoundtrip:
    def test_mixed_dtypes(self):
        rng = np.random.RandomState(0)
        tree = {
            "f32": jnp.asarray(rng.randn(37, 3).astype(np.float32)),
            "f_scalar": jnp.float32(3.25),
            "bool": jnp.asarray(rng.rand(41) > 0.5),
            "u8": jnp.asarray(rng.randint(0, 256, 13, dtype=np.uint8)),
            "i16": jnp.asarray(rng.randint(-30000, 30000, 29).astype(np.int16)),
            "i32": jnp.asarray(rng.randint(-2**31, 2**31 - 1, 7, dtype=np.int32)),
            "i_scalar": jnp.int32(-123456),
        }
        out = _roundtrip(tree)
        for k in tree:
            a = np.asarray(tree[k])
            b = np.asarray(out[k])
            assert b.dtype == a.dtype, k
            assert b.shape == a.shape, k
            np.testing.assert_array_equal(a, b, err_msg=k)

    def test_odd_lengths_pad_isolated(self):
        """Padding of one sub-word leaf must not bleed into the next."""
        tree = {
            "b1": jnp.asarray(np.array([True])),           # 3 pad bytes
            "b2": jnp.asarray(np.array([True, False, True])),
            "h1": jnp.asarray(np.array([-7], np.int16)),   # 1 pad short
            "h2": jnp.asarray(np.array([1000, -1000, 77], np.int16)),
            "i": jnp.asarray(np.array([42], np.int32)),
        }
        out = _roundtrip(tree)
        for k in tree:
            np.testing.assert_array_equal(np.asarray(tree[k]),
                                          np.asarray(out[k]), err_msg=k)

    def test_bool_values_exact(self):
        x = jnp.asarray(np.tile([True, False], 50))
        out = _roundtrip({"v": x})
        assert np.asarray(out["v"]).sum() == 50

    def test_float_only_and_int_only(self):
        t1 = {"a": jnp.ones((4, 4), jnp.float32)}
        o1 = _roundtrip(t1)
        np.testing.assert_array_equal(np.asarray(o1["a"]), np.ones((4, 4)))
        t2 = {"a": jnp.arange(10, dtype=jnp.int32)}
        o2 = _roundtrip(t2)
        np.testing.assert_array_equal(np.asarray(o2["a"]), np.arange(10))

    def test_bf16_leaf_promotes_to_f32(self):
        x = jnp.asarray(np.linspace(-2, 2, 16), jnp.bfloat16)
        fbuf, ibuf = pack_pytree({"x": x})
        spec = make_spec(jax.eval_shape(lambda t: t, {"x": x}))
        out = unpack_pytree(np.asarray(fbuf), np.asarray(ibuf), spec)
        np.testing.assert_allclose(
            np.asarray(out["x"], np.float32),
            np.asarray(x, np.float32), rtol=1e-6)


class TestParamPack:
    """pack_params/unpack_params: per-dtype weight buffers passed as O(1)
    jit arguments (no 0.5 GB baked-constant executables)."""

    def test_roundtrip_exact_mixed_dtypes(self):
        from vido_slam_tpu.utils.packing import pack_params, unpack_params
        tree = {
            "conv.w": jnp.asarray(
                np.random.RandomState(0).randn(3, 3, 4, 8), jnp.float32),
            "conv.b": jnp.zeros((8,), jnp.float32),
            "bn.scale": jnp.asarray(np.linspace(-1, 1, 8), jnp.bfloat16),
            "scalar": jnp.asarray(2.5, jnp.float32),
            "steps": jnp.asarray([3], jnp.int32),
        }
        bufs, spec = pack_params(tree)
        assert len(bufs) == len(spec.keys) == 3  # f32, bf16, i32
        out = unpack_params(bufs, spec)
        for k in tree:
            assert out[k].dtype == tree[k].dtype, k
            np.testing.assert_array_equal(np.asarray(out[k], np.float32),
                                          np.asarray(tree[k], np.float32),
                                          err_msg=k)

    def test_unpack_under_jit_matches_direct_apply(self):
        from vido_slam_tpu.utils.packing import pack_params, unpack_params
        rng = np.random.RandomState(1)
        params = {"w": jnp.asarray(rng.randn(4, 4), jnp.float32),
                  "b": jnp.asarray(rng.randn(4), jnp.float32)}
        x = jnp.asarray(rng.randn(2, 4), jnp.float32)
        bufs, spec = pack_params(params)

        @jax.jit
        def apply_packed(bufs, x):
            p = unpack_params(bufs, spec)
            return x @ p["w"] + p["b"]

        np.testing.assert_allclose(
            np.asarray(apply_packed(bufs, x)),
            np.asarray(x @ params["w"] + params["b"]), rtol=1e-6)
