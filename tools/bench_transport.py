#!/usr/bin/env python
"""Transport micro-benchmark: measures per-RPC launch/put/get latencies of
the TPU transport (run from the repo root). Motivates the single-buffer
packed transfers in estimation/window_ba.py."""
import time, numpy as np, jax, jax.numpy as jnp
from vido_slam_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
print("devices:", jax.devices())

f = jax.jit(lambda x: x + 1.0)
x = jnp.zeros((8, 8)); f(x).block_until_ready()

# 1. tiny jit launch + fetch (full RTT)
t0 = time.perf_counter()
for _ in range(10):
    np.asarray(f(x))
print("tiny launch+fetch: %.2f ms" % ((time.perf_counter()-t0)/10*1000))

# 2. launch-only (no fetch) x10 then one fetch
t0 = time.perf_counter()
y = x
for _ in range(10):
    y = f(y)
np.asarray(y)
print("10 chained launches + 1 fetch: %.2f ms" % ((time.perf_counter()-t0)*1000))

# 3. device_put: 8 small arrays separately
arrs = [np.random.rand(20, 1000).astype(np.float32) for _ in range(8)]
t0 = time.perf_counter()
d = [jnp.asarray(a) for a in arrs]
jax.block_until_ready(d)
print("8 separate device_put: %.2f ms" % ((time.perf_counter()-t0)*1000))

# 4. device_put as one tree
t0 = time.perf_counter()
d = jax.device_put(tuple(arrs))
jax.block_until_ready(d)
print("1 tree device_put: %.2f ms" % ((time.perf_counter()-t0)*1000))

# 5. device_get of a medium tree
outs = tuple(jnp.zeros((3000, 3)) for _ in range(10))
jax.block_until_ready(outs)
t0 = time.perf_counter()
for _ in range(5):
    jax.device_get(outs)
print("batched device_get 10x(3000,3): %.2f ms" % ((time.perf_counter()-t0)/5*1000))

# 6. dispatch overlap: launch big then fetch small-other
big = jax.jit(lambda a: (a @ a).sum())
A = jnp.zeros((4096, 4096), jnp.bfloat16); big(A).block_until_ready()
t0 = time.perf_counter(); r = big(A); print("  big dispatch: %.2f ms" % ((time.perf_counter()-t0)*1000))
t0 = time.perf_counter(); np.asarray(f(x)); print("  tiny fetch while big in flight: %.2f ms" % ((time.perf_counter()-t0)*1000))
t0 = time.perf_counter(); np.asarray(r); print("  big fetch: %.2f ms" % ((time.perf_counter()-t0)*1000))
