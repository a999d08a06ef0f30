#!/usr/bin/env python
"""Map the `while.N` ops seen in device traces of the fused pair program to
their jax source (metadata op_name/source_file), so kernel work targets the
right loops. Builds the same tracker/perception as tools/profile_e2e.py,
compiles track_frames_pair's program, and prints every while instruction
with its trip-count shape and metadata."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vido_slam_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    from vido_slam_tpu.config import config_from_dict
    from vido_slam_tpu.models.maskrcnn.model import MaskRCNNConfig
    from vido_slam_tpu.models.perception import PerceptionModel
    from vido_slam_tpu.tracking import Tracker

    H, W = 192, 640
    cfg = config_from_dict({
        "Camera.width": W, "Camera.height": H,
        "Camera.fx": 408.201, "Camera.fy": 408.69,
        "Camera.cx": 304.1329, "Camera.cy": 133.344, "Camera.bf": 193.785,
        "ChooseData": 3, "DepthMapFactor": 500, "WINDOW_SIZE": 20,
        "MaxTrackPointBG": 3000, "MaxTrackPointOBJ": 800,
    })
    perception = PerceptionModel(H, W, MaskRCNNConfig(input_h=544, input_w=800),
                                 seed=0, use_pallas=True,
                                 mask_dtype=jnp.bfloat16)
    tracker = Tracker(cfg, n_bg=3000, n_obj=4000, max_objects=8, seed=0,
                      local_ba=True, ba_max_points=1000, ba_iters=10,
                      pipelined=True, fused_ba=True)
    tracker.attach_perception(perception, "kaist",
                              cfg.system.depth_map_factor, cfg.camera.bf)
    rng = np.random.RandomState(0)
    frames = [jnp.asarray((rng.rand(H, W, 3) * 255).astype(np.float32))
              for _ in range(3)]
    tracker.track_frames_pair(frames[0], frames[1], frames[2])  # init state
    lowered = tracker._step_frames2.lower(
        tracker._pp, tracker.state, frames[0], frames[1], frames[2],
        np.float32(1.0))
    compiled = lowered.compile()
    mod = compiled.hlo_modules()[0]
    for comp in mod.computations():
        for instr in comp.instructions():
            if instr.opcode == "while":
                md = instr.metadata
                print(f"{instr.name:16s} op={md.op_name[:90]}")
                print(f"    src={md.source_file}:{md.source_line}")


if __name__ == "__main__":
    main()
