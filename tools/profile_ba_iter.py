#!/usr/bin/env python
"""Split the fused window-BA iteration cost: Hessian assembly/Schur vs the
dense 120x120 Cholesky + triangular solves (LAPACK-style custom calls) vs
the cost-only pass. W=20, P=1000 bench shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, n=50, warm=3):
    for _ in range(warm):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return 1000 * (time.perf_counter() - t0) / n


def main():
    from vido_slam_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    from vido_slam_tpu.estimation.window_ba import solve_window_ba

    W, P = 20, 1000
    rng = np.random.RandomState(0)
    pts = rng.uniform(-3, 3, (P, 3)) + [0, 0, 10.0]
    t_true = np.arange(W)[:, None] * [0.1, 0, 0]
    Twc = np.tile(np.eye(4), (W, 1, 1))
    Twc[:, :3, 3] = t_true
    obs = pts[None] - Twc[:, None, :3, 3]
    odom = np.tile(np.eye(4), (W - 1, 1, 1))
    odom[:, 0, 3] = 0.1
    Twc0 = Twc.copy()
    Twc0[1:, :3, 3] += 0.03 * rng.randn(W - 1, 3)
    X0 = pts + 0.03 * rng.randn(P, 3)
    args = (jnp.asarray(Twc0, jnp.float32), jnp.asarray(odom, jnp.float32),
            jnp.ones(W - 1, bool), jnp.asarray(X0, jnp.float32),
            jnp.asarray(obs, jnp.float32), jnp.ones((W, P), bool),
            jnp.ones(P, bool), jnp.ones(W, bool))

    for it in (1, 5, 10):
        f = jax.jit(lambda *a, it=it: solve_window_ba(*a, max_iters=it))
        r = f(*args)
        print(f"solve {it:2d} iters: {bench(f, *args):.3f} ms "
              f"(used {int(r.num_iters)}, cost {float(r.cost):.5f})")

    # isolated pieces
    D = 6 * W
    S = jnp.asarray(rng.randn(D, D).astype(np.float32))
    S = S @ S.T + D * jnp.eye(D)
    rhs = jnp.asarray(rng.randn(D).astype(np.float32))

    def chol_solve(S, rhs):
        L = jnp.linalg.cholesky(S)
        y = jax.scipy.linalg.solve_triangular(L, -rhs, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

    f = jax.jit(chol_solve)
    print(f"cholesky+2 triangular solves (120): {bench(f, S, rhs):.3f} ms")

    def cg_solve(S, rhs, iters=40):
        b = -rhs
        x = jnp.zeros_like(b)
        r = b
        p = r
        rs = jnp.dot(r, r)

        def body(_, st):
            x, r, p, rs = st
            Sp = S @ p
            a = rs / jnp.maximum(jnp.dot(p, Sp), 1e-30)
            x = x + a * p
            r = r - a * Sp
            rs_new = jnp.dot(r, r)
            p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
            return (x, r, p, rs_new)

        x, r, p, rs = jax.lax.fori_loop(0, iters, body, (x, r, p, rs))
        return x

    f2 = jax.jit(cg_solve)
    d1 = f(S, rhs)
    d2 = f2(S, rhs)
    err = float(jnp.linalg.norm(d1 - d2) / jnp.linalg.norm(d1))
    print(f"CG-40 solve (120): {bench(f2, S, rhs):.3f} ms rel_err {err:.2e}")


if __name__ == "__main__":
    main()
