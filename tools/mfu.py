#!/usr/bin/env python
"""CLI self-check for the MFU measurement helpers
(vido_slam_tpu/utils/mfu.py): a big bf16 matmul should land near the
device's peak (measured 0.95 on v5e)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vido_slam_tpu.utils.mfu import measure_mfu

if __name__ == "__main__":
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(8192, 8192), jnp.bfloat16)
    b = jnp.asarray(rng.rand(8192, 8192), jnp.bfloat16)
    f = jax.jit(lambda a, b: a @ b)
    print(json.dumps(measure_mfu(f, (a, b), n=8)))
