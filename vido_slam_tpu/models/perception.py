"""Fused perception graph — the three ROS GPU services of the reference
(FlowNetService, MonoDepthService, MaskRcnnService; SURVEY §2.3/§3.2)
collapsed into ONE jitted TPU program per frame pair.

The reference calls three networks sequentially over ROS IPC
(src/realtime_demo/src/run_vido.cc:142-157). Here preprocessing (BGR->RGB,
resizes, normalisation), MonoDepth2, LiteFlowNet and Mask R-CNN all live in
a single XLA graph: no host round-trips, shared input handling, and XLA
overlaps the three branches' compute.

Service-parity output semantics:
  depth: uint16-style min-max normalised inverse depth at camera resolution
         (run_mono_depth.py:137-146);
  flow:  (H, W, 2) float32 full-resolution flow (run_flow_net.py:85-107);
  mask:  (H, W) uint8 semantic mask = sum(instance mask * label index)
         (run_mask_rcnn.py:83-127).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vido_slam_tpu.models.layers import Params
from vido_slam_tpu.models.liteflownet import (
    init_liteflownet_params,
    liteflownet_forward,
)
from vido_slam_tpu.models.maskrcnn.model import (
    MaskRCNNConfig,
    RESNET50_FPN,
    init_maskrcnn_params,
    maskrcnn_inference,
    paste_semantic_mask,
)
from vido_slam_tpu.models.monodepth2 import (
    FEED_HEIGHT,
    FEED_WIDTH,
    disp_to_uint16_depth,
    init_monodepth2_params,
    monodepth2_disp,
)


def _resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="bilinear")


def _ceil32(v: int) -> int:
    return -(-v // 32) * 32


class PerceptionOutput(NamedTuple):
    depth_u16: jnp.ndarray  # (H, W) float in [0, 65536] (service mono16)
    flow: jnp.ndarray       # (H, W, 2)
    mask: jnp.ndarray       # (H, W) uint8 semantic labels


@partial(jax.jit, static_argnames=("height", "width", "mask_cfg", "use_pallas"))
def perception_forward(
    depth_params: Params,
    flow_params: Params,
    mask_params: Params,
    prev_bgr: jnp.ndarray,   # (H, W, 3) float32 BGR 0..255
    cur_bgr: jnp.ndarray,
    *,
    height: int,
    width: int,
    mask_cfg: MaskRCNNConfig,
    use_pallas: bool = False,
) -> PerceptionOutput:
    prev_rgb = prev_bgr[None, :, :, ::-1] / 255.0
    cur_rgb = cur_bgr[None, :, :, ::-1] / 255.0

    # --- MonoDepth2 (current frame) ---
    # conv-heavy branches run in the params' dtype (bf16 on TPU rides the
    # MXU natively; f32 convs are emulated as 3-pass bf16 and ~2-3x slower);
    # normalisation and geometry return to f32
    d_dt = jax.tree_util.tree_leaves(depth_params)[0].dtype
    d_in = _resize(cur_rgb, FEED_HEIGHT, FEED_WIDTH).astype(d_dt)
    disp = monodepth2_disp(depth_params, d_in).astype(jnp.float32)
    depth_u16 = disp_to_uint16_depth(disp, height, width)[0]

    # --- LiteFlowNet (prev -> cur) --- (compute dtype follows flow_params;
    # liteflownet_forward casts inputs and returns f32 flow)
    ph, pw = _ceil32(height), _ceil32(width)
    f_first = _resize(prev_rgb, ph, pw)
    f_second = _resize(cur_rgb, ph, pw)
    net_flow = liteflownet_forward(flow_params, f_first, f_second,
                                   use_pallas=use_pallas)
    flow = _resize(net_flow, height, width)[0]
    flow = flow * jnp.asarray([width / pw, height / ph], flow.dtype)

    # --- Mask R-CNN (current frame; wrapper feeds raw RGB floats 0..255,
    #     resized to the model input size — predictor.py:283-286) ---
    m_dt = jax.tree_util.tree_leaves(mask_params)[0].dtype
    m_in = _resize(cur_bgr[None, :, :, ::-1],
                   mask_cfg.input_h, mask_cfg.input_w).astype(m_dt)
    det = maskrcnn_inference(mask_params, m_in, mask_cfg)
    det = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, det)
    mask = paste_semantic_mask(
        det, mask_cfg.input_h, mask_cfg.input_w, height, width,
        mask_cfg.mask_threshold,
    )
    return PerceptionOutput(depth_u16=depth_u16, flow=flow, mask=mask)


class PerceptionModel:
    """Holds the three parameter sets and the jitted fused forward."""

    def __init__(
        self,
        height: int,
        width: int,
        mask_cfg: MaskRCNNConfig = RESNET50_FPN,
        seed: int = 0,
        depth_params: Optional[Params] = None,
        flow_params: Optional[Params] = None,
        mask_params: Optional[Params] = None,
        use_pallas: bool = True,
        compute_dtype=None,
        mask_dtype=None,
        flow_dtype=None,
    ):
        """compute_dtype casts the depth + detector params (bf16 rides the
        MXU natively); mask_dtype casts ONLY the detector. The detector is
        the safe bf16 target: its outputs are discrete (labels, thresholded
        masks) and box/NMS decode is pinned to f32 (rpn.py/roi_heads.py),
        while bf16 disparity would quantise metric depth at ~2^-8 relative —
        directly visible in ATE. flow_dtype casts ONLY LiteFlowNet: the
        correlation / image-mean reductions and warp coordinates stay f32
        (ops/correlation.py, ops/warp.py) and the output flow is f32; the
        end-to-end bf16-vs-f32 flow deviation is sub-0.1 px (test_liteflownet)
        against flow values of O(10) px, well inside the 0.4 px RANSAC gate
        the flow feeds (Tracking.cc:1965-1968). NOTE: on v5e bf16 flow was
        measured SLOWER (7.94 vs 6.39 ms device) — the net is gather/latency
        bound, so the boundary converts dominate; keep f32 unless profiling
        says otherwise on your chip."""
        self.height = height
        self.width = width
        self.mask_cfg = mask_cfg
        self.use_pallas = use_pallas

        # Build (init + dtype-cast) all three parameter sets in ONE jitted
        # program: eager init dispatches ~650 individual RNG/cast ops, each
        # a serialized RPC on a remote (tunneled) TPU transport — measured
        # at ~145 s of ctor time; one program makes it a single dispatch.
        # Provided params ride through as ARGUMENTS (never closure
        # constants) so the init executable stays small and cacheable.
        def build(key, provided):
            d, f, m = provided
            k1, k2, k3 = jax.random.split(key, 3)
            d = d if d is not None else init_monodepth2_params(k1)
            f = f if f is not None else init_liteflownet_params(k2)
            m = m if m is not None else init_maskrcnn_params(k3, mask_cfg)
            if compute_dtype is not None:
                cast = lambda p: {k: v.astype(compute_dtype)
                                  for k, v in p.items()}
                d, m = cast(d), cast(m)
            if mask_dtype is not None:
                m = {k: v.astype(mask_dtype) for k, v in m.items()}
            if flow_dtype is not None:
                f = {k: v.astype(flow_dtype) for k, v in f.items()}
            return d, f, m

        provided = (depth_params or None, flow_params or None,
                    mask_params or None)
        key = jax.random.PRNGKey(seed)
        if jax.default_backend() == "cpu":
            d, f, m = build(key, provided)   # CPU: eager is fast
        else:
            d, f, m = jax.jit(build)(key, provided)
        self.depth_params, self.flow_params, self.mask_params = d, f, m

        # The weight sets ride into the jitted forwards as PACKED arguments
        # (one flat buffer per dtype, utils/packing.py::pack_params): baking
        # them in as closure constants makes a ~0.5 GB executable that a
        # tunneled TPU runtime re-loads on every process start (minutes),
        # while ~650 per-call argument leaves cost ~1.2 ms of dispatch.
        # Packed buffers give O(1) dispatch leaves AND a small executable.
        from vido_slam_tpu.utils.packing import pack_params

        self._pp, self._pp_spec = pack_params(
            (self.depth_params, self.flow_params, self.mask_params))
        self._fwd = jax.jit(self.forward_from_packed)

    def forward_from_packed(self, bufs, prev_bgr, cur_bgr) -> PerceptionOutput:
        """Traceable forward from the packed weight buffers (`self._pp`).
        This is the seam the fused tracking program calls
        (Tracker.attach_perception) — anything implementing it plus `_pp`
        can stand in for the three nets."""
        from vido_slam_tpu.utils.packing import unpack_params

        dp, fp, mp = unpack_params(bufs, self._pp_spec)
        return perception_forward(
            dp, fp, mp, prev_bgr, cur_bgr, height=self.height,
            width=self.width, mask_cfg=self.mask_cfg,
            use_pallas=self.use_pallas,
        )

    @classmethod
    def from_pretrained(cls, weights_dir: str, height: int, width: int,
                        mask_cfg: MaskRCNNConfig = RESNET50_FPN, **kw):
        """Build from a tools/convert_weights.py output directory (bundles
        named flow / depth / mask; any missing net keeps random init)."""
        import os

        from vido_slam_tpu.utils.checkpoint import load_params

        def maybe(name):
            base = os.path.join(weights_dir, name)
            if os.path.exists(base + ".npz") or os.path.exists(base):
                return load_params(base)
            return None

        return cls(height, width, mask_cfg,
                   depth_params=maybe("depth"), flow_params=maybe("flow"),
                   mask_params=maybe("mask"), **kw)

    def __call__(self, prev_bgr, cur_bgr) -> PerceptionOutput:
        return self._fwd(self._pp, jnp.asarray(prev_bgr, jnp.float32),
                         jnp.asarray(cur_bgr, jnp.float32))

    def make_slam_forward(self, depth_mode: str, depth_map_factor: float,
                          bf: float, scale: float = 1.0):
        """One jitted program from raw frames to SLAM-ready inputs
        (metric depth, flow, int32 mask). Folding the service-parity depth
        conversion + mask cast into the perception graph removes two extra
        per-frame program dispatches — each program boundary costs tunnel
        scheduling on a remote TPU transport."""
        from vido_slam_tpu.geometry.camera import convert_depth

        @jax.jit
        def fwd(bufs, prev_bgr, cur_bgr):
            out = self.forward_from_packed(bufs, prev_bgr, cur_bgr)
            depth = convert_depth(out.depth_u16, depth_mode,
                                  depth_map_factor, bf, scale=scale)
            return depth, out.flow, out.mask.astype(jnp.int32)

        pp = self._pp
        return lambda prev_bgr, cur_bgr: fwd(pp, prev_bgr, cur_bgr)
