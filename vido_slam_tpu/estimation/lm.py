"""Generic batched Levenberg–Marquardt engine, pure JAX.

Replaces g2o's `OptimizationAlgorithmLevenberg` (reference
vido_slam/3rdparty/g2o/g2o/core/optimization_algorithm_levenberg.cpp) for the
small dense problems of the per-frame pipeline: camera pose, object motions,
joint flow refinements, and the inertial initialization. The sliding-window BA
has its own sparse-Schur solver (estimation/window_ba.py) built on the same
iteration policy.

Design notes (TPU-first):
- Fully jittable: fixed iteration count inside `lax.while_loop` with an
  early-exit condition; every shape static.
- Residuals are (N, d) blocks with a per-block validity mask; invalid blocks
  get zero weight — the fixed-size-masking pattern that replaces g2o's
  dynamic edge levels.
- Jacobians via `jax.jacfwd` of the residual function on a flat chart (for
  poses: the SE(3) exponential chart around the initial guess) — 6–100 JVPs of
  a vectorised residual is cheap and XLA fuses it with the normal-equation
  build.
- Damping follows g2o's Levenberg policy: additive lambda on the Hessian
  diagonal, gain-ratio accept/reject with `ni` doubling (Madsen–Nielsen /
  g2o `computeScale`).
- Normal equations solved with Cholesky at f32-highest precision; problems are
  preconditioned by construction (chart centered at the current estimate).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class LMResult(NamedTuple):
    x: jnp.ndarray           # (P,) final parameters
    cost: jnp.ndarray        # scalar robust cost at x
    chi2: jnp.ndarray        # (N,) per-block squared error (unrobustified)
    num_iters: jnp.ndarray   # iterations actually taken
    lam: jnp.ndarray         # final damping


def huber_weight(chi2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """g2o RobustKernelHuber: weight rho'(chi2) applied to the normal eqs.

    rho(s) = s for s <= delta^2, else 2*delta*sqrt(s) - delta^2;
    rho'(s) = 1 or delta/sqrt(s).
    """
    delta2 = delta * delta
    safe = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, 1.0, delta / jnp.sqrt(safe))


def _solve_spd(H: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Solve H x = g for SPD H; H is (P, P) small and dense.

    For P <= 8 the Cholesky factorisation + triangular solves are UNROLLED
    into plain scalar arithmetic: `jnp.linalg.cholesky` lowers to a LAPACK-
    style custom call that costs ~0.1 ms per invocation on TPU — ruinous
    inside a per-iteration LM while_loop (profiled as the dominant cost of
    the pose loops). The unrolled form fuses into the surrounding kernel
    and vmaps cleanly."""
    n = H.shape[0]
    if n > 8:
        L = jnp.linalg.cholesky(H)
        y = jax.scipy.linalg.solve_triangular(L, g, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = H[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(jnp.maximum(s, 1e-20))
        L[j][j] = Ljj
        for i in range(j + 1, n):
            s2 = H[i, j]
            for k in range(j):
                s2 = s2 - L[i][k] * L[j][k]
            L[i][j] = s2 / Ljj
    y = [None] * n
    for i in range(n):
        s = g[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


@partial(
    jax.jit,
    static_argnames=("residual_fn", "max_iters", "huber_delta", "jac_mode",
                     "jac_fn", "retract_fn", "tangent_dim"),
)
def lm_solve(
    residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    weights: Optional[jnp.ndarray] = None,
    *,
    max_iters: int = 100,
    huber_delta: Optional[float] = None,
    init_lambda: float = 1e-5,
    gain_tol: float = 1e-9,
    rel_tol: float = 1e-5,
    jac_mode: str = "fwd",
    jac_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    retract_fn: Optional[Callable] = None,
    tangent_dim: Optional[int] = None,
) -> LMResult:
    """Minimise 0.5 * sum_n w_n * rho(|r_n(x)|^2) over x.

    Args:
      residual_fn: x (P,) -> residuals (N, d). Must be jax-traceable.
      x0: initial parameters (P,).
      mask: optional (N,) bool — invalid residual blocks contribute nothing.
      weights: optional (N,) or (N, d) information weights (sigma^-2).
      max_iters: iteration budget (static).
      huber_delta: if set, Huber robustification with this delta (g2o
        semantics: threshold on sqrt(chi2)).
      init_lambda: initial damping as a fraction of max diag(H) (g2o _tau).
      gain_tol: terminate when the predicted gain is below this.
      rel_tol: terminate on an accepted step whose RELATIVE cost improvement
        is below this — the g2o SparseOptimizerTerminateAction semantics
        (core/sparse_optimizer_terminate_action.cpp, gain threshold; the
        reference installs it with 1e-3 for the window BA, Optimizer.cc:
        182-184). Each extra while_loop trip costs fixed device time, so a
        live early-exit is what keeps the per-frame solves cheap on TPU.
      jac_mode: "fwd" (few params) or "rev" (many params, few residuals).
      jac_fn: optional ANALYTIC Jacobian x -> (N, d, P); replaces the
        autodiff pass. The per-frame LM while-loops are op-count bound on
        TPU, and a closed-form J roughly halves the body (profiled).
      retract_fn: optional manifold retraction (x, delta (P,)) -> x. When
        given, the state x may be any array (e.g. a (4, 4) SE(3) matrix),
        `tangent_dim` fixes P, residual_fn/jac_fn receive the STATE, and
        the chart is re-centered every iteration — g2o's vertex oplus
        semantics, where each accepted step applies the increment to the
        estimate and the next linearisation happens at zero.
    """
    x0 = jnp.asarray(x0)
    if retract_fn is None:
        P = x0.shape[0]
        retract_fn = lambda x, d: x + d
    else:
        assert tangent_dim is not None, "tangent_dim required with retract_fn"
        P = tangent_dim
    if jac_fn is None:
        if retract_fn is not None and tangent_dim is not None:
            def jac_fn(x):
                return jax.jacfwd(
                    lambda d: residual_fn(retract_fn(x, d)))(jnp.zeros(P))
        else:
            jac_fn = (jax.jacfwd(residual_fn) if jac_mode == "fwd"
                      else jax.jacrev(residual_fn))

    def block_stats(x):
        r = residual_fn(x)  # (N, d)
        if weights is not None:
            w_info = weights if weights.ndim == r.ndim else weights[..., None]
        else:
            w_info = jnp.ones_like(r)
        chi2 = jnp.sum(r * r * w_info, axis=-1)  # (N,)
        if huber_delta is not None:
            w_rob = huber_weight(chi2, huber_delta)
        else:
            w_rob = jnp.ones_like(chi2)
        if mask is not None:
            w_rob = jnp.where(mask, w_rob, 0.0)
        # robust cost: sum rho(chi2) (g2o chi2 with robust kernel)
        if huber_delta is not None:
            d2 = huber_delta * huber_delta
            rho = jnp.where(
                chi2 <= d2, chi2, 2.0 * huber_delta * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - d2
            )
        else:
            rho = chi2
        cost = jnp.sum(jnp.where(mask, rho, 0.0) if mask is not None else rho)
        return r, w_info, chi2, w_rob, cost

    def normal_eqs(x):
        r, w_info, chi2, w_rob, cost = block_stats(x)
        J = jac_fn(x)  # (N, d, P)
        w = (w_info * w_rob[..., None])  # (N, d)
        Jw = J * w[..., None]
        H = jnp.einsum("ndp,ndq->pq", Jw, J, precision=lax.Precision.HIGHEST)
        g = jnp.einsum("ndp,nd->p", Jw, r, precision=lax.Precision.HIGHEST)
        return H, g, cost, chi2

    H0, g0, cost0, chi2_0 = normal_eqs(x0)
    # floor lam0: an all-masked problem has H0 == 0, and with lam0 == 0 the
    # damping-explosion exit below (lam > 1e10*lam0 with lam_rej = lam*ni)
    # could never fire — the loop would burn the full iteration cap. Under
    # vmap (the 8 object slots) every real solve pays the worst slot's trip
    # count, so empty slots must terminate instantly (done0 below).
    lam0 = jnp.maximum(init_lambda * jnp.max(jnp.diag(H0)), 1e-30)
    done0 = cost0 <= gain_tol  # degenerate/empty or already-converged

    def cond(state):
        it, x, lam, ni, cost, H, g, done = state
        return (it < max_iters) & jnp.logical_not(done)

    def body(state):
        it, x, lam, ni, cost, H, g, done = state
        # Marquardt scaling: damp proportionally to diag(H) so parameters of
        # very different magnitudes (velocities vs biases vs log-scale) get
        # commensurate trust regions; floor keeps null directions bounded.
        dH = jnp.diag(H)
        floor = 1e-6 * jnp.maximum(jnp.max(dH), 1e-12)
        Hd = H + lam * jnp.diag(jnp.maximum(dH, floor))
        delta = _solve_spd(Hd, -g)
        # numerical failure guard: if cholesky produced nans, reject step
        bad = jnp.any(jnp.isnan(delta))
        delta = jnp.where(bad, jnp.zeros_like(delta), delta)
        x_new = retract_fn(x, delta)
        # ONE linearisation per iteration: H/g/cost at the trial point. On
        # accept they become the next state; on reject the old H/g/cost are
        # kept (same x, only lam changes) — the wasted Jacobian on a reject
        # is far cheaper than a second residual pass every iteration (the
        # while-loop body latency is the per-frame floor on TPU).
        H_new, g_new, cost_new, _ = normal_eqs(x_new)
        # predicted reduction: 0.5 * delta^T (lam*D*delta - g)
        pred = 0.5 * jnp.dot(delta, lam * jnp.maximum(dH, floor) * delta - g)
        rho = (cost - cost_new) / jnp.maximum(pred, 1e-20)
        accept = (cost_new < cost) & jnp.logical_not(bad)
        # g2o policy: on accept lam *= max(1/3, 1-(2rho-1)^3), ni=2
        #             on reject lam *= ni, ni *= 2
        lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_rej = lam * ni
        lam_new = jnp.where(accept, lam_acc, lam_rej)
        ni_new = jnp.where(accept, 2.0, ni * 2.0)
        x_next = jnp.where(accept, x_new, x)
        cost_next = jnp.where(accept, cost_new, cost)
        H_next = jnp.where(accept, H_new, H)
        g_next = jnp.where(accept, g_new, g)
        # terminate if converged: tiny predicted gain, or an accepted step
        # whose relative improvement is below rel_tol (g2o terminate action)
        done_new = accept & (pred < gain_tol * jnp.maximum(cost, 1e-20))
        done_new = done_new | (
            accept & (cost - cost_new < rel_tol * jnp.maximum(cost, 1e-20))
        )
        # also terminate if damping exploded (stuck)
        done_new = done_new | (lam_new > 1e10 * jnp.maximum(lam0, 1e-30))
        return (it + 1, x_next, lam_new, ni_new, cost_next, H_next, g_next, done_new)

    init = (jnp.int32(0), x0, lam0, jnp.float32(2.0), cost0, H0, g0, done0)
    it, x, lam, ni, cost, H, g, done = lax.while_loop(cond, body, init)
    _, _, chi2, _, final_cost = block_stats(x)
    return LMResult(x=x, cost=final_cost, chi2=chi2, num_iters=it, lam=lam)


@partial(
    jax.jit,
    static_argnames=("residual_fn", "max_iters", "huber_delta", "jac_fn",
                     "retract_fn", "tangent_dim"),
)
def gn_solve(
    residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    weights: Optional[jnp.ndarray] = None,
    *,
    max_iters: int = 20,
    huber_delta: Optional[float] = None,
    rel_tol: float = 1e-6,
    jac_fn: Optional[Callable] = None,
    retract_fn: Optional[Callable] = None,
    tangent_dim: Optional[int] = None,
) -> LMResult:
    """Plain Gauss-Newton — g2o's OptimizationAlgorithmGaussNewton
    (3rdparty/g2o/g2o/core/optimization_algorithm_gauss_newton.{h,cpp}):
    undamped normal-equation steps, stop on relative-improvement / NaN.
    Interface matches lm_solve. Dispatched as Levenberg with zero damping
    and always-accept-unless-worse, so the two share one engine."""
    return _lm_like(residual_fn, x0, mask, weights, max_iters=max_iters,
                    huber_delta=huber_delta, rel_tol=rel_tol, jac_fn=jac_fn,
                    retract_fn=retract_fn, tangent_dim=tangent_dim,
                    algorithm="gn")


@partial(
    jax.jit,
    static_argnames=("residual_fn", "max_iters", "huber_delta", "jac_fn",
                     "retract_fn", "tangent_dim"),
)
def dogleg_solve(
    residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    weights: Optional[jnp.ndarray] = None,
    *,
    max_iters: int = 50,
    huber_delta: Optional[float] = None,
    rel_tol: float = 1e-6,
    trust_radius: float = 1.0,
    jac_fn: Optional[Callable] = None,
    retract_fn: Optional[Callable] = None,
    tangent_dim: Optional[int] = None,
) -> LMResult:
    """Powell's Dogleg — g2o's OptimizationAlgorithmDogleg
    (3rdparty/g2o/g2o/core/optimization_algorithm_dogleg.{h,cpp}): blend
    of the Cauchy (steepest-descent) point and the Gauss-Newton step
    inside an adaptive trust region, gain-ratio radius update."""
    return _lm_like(residual_fn, x0, mask, weights, max_iters=max_iters,
                    huber_delta=huber_delta, rel_tol=rel_tol, jac_fn=jac_fn,
                    retract_fn=retract_fn, tangent_dim=tangent_dim,
                    algorithm="dogleg", trust_radius=trust_radius)


def _lm_like(residual_fn, x0, mask, weights, *, max_iters, huber_delta,
             rel_tol, jac_fn, retract_fn, tangent_dim, algorithm,
             trust_radius: float = 1.0):
    """Shared GN/Dogleg iteration engine (the Levenberg policy lives in
    lm_solve; only these two alternatives route here — in the reference
    pipeline only Levenberg is ever constructed, so GN/Dogleg exist for
    g2o API completeness, selectable but off the hot path)."""
    x0 = jnp.asarray(x0)
    if retract_fn is None:
        P = x0.shape[0]
        retract_fn = lambda x, d: x + d
    else:
        assert tangent_dim is not None
        P = tangent_dim
    if jac_fn is None:
        def jac_fn(x):
            return jax.jacfwd(
                lambda d: residual_fn(retract_fn(x, d)))(jnp.zeros(P))

    def stats(x):
        r = residual_fn(x)
        w_info = (jnp.ones_like(r) if weights is None else
                  (weights if weights.ndim == r.ndim else weights[..., None]))
        chi2 = jnp.sum(r * r * w_info, axis=-1)
        w_rob = (jnp.ones_like(chi2) if huber_delta is None
                 else huber_weight(chi2, huber_delta))
        if mask is not None:
            w_rob = jnp.where(mask, w_rob, 0.0)
        cost = jnp.sum(chi2 * w_rob)
        return r, w_info, chi2, w_rob, cost

    def normal_eqs(x):
        r, w_info, chi2, w_rob, cost = stats(x)
        J = jac_fn(x)
        w = w_info * w_rob[..., None]
        Jw = J * w[..., None]
        H = jnp.einsum("ndp,ndq->pq", Jw, J, precision=lax.Precision.HIGHEST)
        g = jnp.einsum("ndp,nd->p", Jw, r, precision=lax.Precision.HIGHEST)
        return H, g, cost, chi2

    H0, g0, cost0, _ = normal_eqs(x0)
    floor0 = 1e-12 * jnp.maximum(jnp.max(jnp.abs(H0)), 1e-20)

    def step_gn(H, g, _radius):
        Hd = H + floor0 * jnp.eye(H.shape[0], dtype=H.dtype)
        return _solve_spd(Hd, -g), _radius

    def step_dogleg(H, g, radius):
        Hd = H + floor0 * jnp.eye(H.shape[0], dtype=H.dtype)
        d_gn = _solve_spd(Hd, -g)
        gHg = jnp.dot(g, Hd @ g)
        alpha = jnp.dot(g, g) / jnp.maximum(gHg, 1e-20)
        d_sd = -alpha * g                       # Cauchy point
        n_gn = jnp.linalg.norm(d_gn)
        n_sd = jnp.linalg.norm(d_sd)
        # three dogleg cases (optimization_algorithm_dogleg.cpp:90-130)
        diff = d_gn - d_sd
        a = jnp.dot(diff, diff)
        b = 2.0 * jnp.dot(d_sd, diff)
        c = jnp.dot(d_sd, d_sd) - radius * radius
        disc = jnp.sqrt(jnp.maximum(b * b - 4 * a * c, 0.0))
        beta = (-b + disc) / jnp.maximum(2 * a, 1e-20)
        d_mix = d_sd + jnp.clip(beta, 0.0, 1.0) * diff
        d = jnp.where(
            n_gn <= radius, d_gn,
            jnp.where(n_sd >= radius,
                      d_sd * (radius / jnp.maximum(n_sd, 1e-20)), d_mix))
        return d, radius

    stepper = step_gn if algorithm == "gn" else step_dogleg

    def cond(s):
        it, x, radius, cost, H, g, done = s
        return (it < max_iters) & ~done

    def body(s):
        it, x, radius, cost, H, g, done = s
        delta, radius = stepper(H, g, radius)
        bad = jnp.any(jnp.isnan(delta))
        delta = jnp.where(bad, jnp.zeros_like(delta), delta)
        x_new = retract_fn(x, delta)
        H_new, g_new, cost_new, _ = normal_eqs(x_new)
        accept = (cost_new < cost) & ~bad
        if algorithm == "dogleg":
            # cost = sum(w*r^2), so d(cost)/d(delta) = 2g and the quadratic
            # model reduction is -(2 g.delta + delta' H delta) (the factor
            # of 2 matters: with -(g.delta + 0.5 delta' H delta) rho is
            # inflated 2x and the trust region grows too eagerly).
            pred = -(2.0 * jnp.dot(g, delta) + jnp.dot(delta, H @ delta))
            rho = (cost - cost_new) / jnp.maximum(pred, 1e-20)
            radius = jnp.where(rho > 0.75, jnp.maximum(radius,
                               3.0 * jnp.linalg.norm(delta)),
                               jnp.where(rho < 0.25, radius * 0.5, radius))
            done_new = radius < 1e-12
        else:
            done_new = ~accept  # GN: a non-improving step terminates
        x_n = jnp.where(accept, x_new, x) if x.ndim == 1 else \
            jnp.where(accept, x_new, x)
        cost_n = jnp.where(accept, cost_new, cost)
        done_new = done_new | (
            accept & (cost - cost_new < rel_tol * jnp.maximum(cost, 1e-20)))
        return (it + 1, x_n,
                radius, cost_n,
                jnp.where(accept, H_new, H), jnp.where(accept, g_new, g),
                done_new)

    init = (jnp.int32(0), x0, jnp.float32(trust_radius), cost0, H0, g0,
            cost0 <= 1e-20)
    it, x, radius, cost, H, g, done = lax.while_loop(cond, body, init)
    _, _, chi2, _, final_cost = stats(x)
    return LMResult(x=x, cost=final_cost, chi2=chi2, num_iters=it,
                    lam=radius)
