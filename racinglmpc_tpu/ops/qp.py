"""Batched dense QP solver: OSQP-style ADMM + active-set polish, in pure JAX.

This is the TPU-native replacement for the reference's per-step call into the
native OSQP library (`/root/reference/src/fnc/controller/PredictiveControllers.py:259-283`,
``OSQP().setup(P, q, A, l, u, polish=True)``). Same problem form:

    min 1/2 x'Px + q'x   s.t.   l <= Ax <= u

and the same algorithmic ingredients — Ruiz equilibration, sigma/rho-regularized
ADMM with over-relaxation, rho adaptation on the primal/dual residual ratio,
and an active-set "polish" solve — but re-designed for the hardware:

- **fixed-shape, fixed-iteration**: everything is statically shaped so a whole
  *scenario batch* of QPs compiles to one XLA program (vmap over the leading
  axis turns every matvec into a batched GEMM on the MXU);
- **matmul-structured iterations**: the ADMM KKT matrix is factorized once per
  rho segment and applied as a precomputed *inverse* — each iteration is then
  three dense matvecs + elementwise work (no sequential triangular solves);
- **branch-free termination**: convergence is recorded per scenario as data
  (iteration counts, residuals) rather than control flow; infeasible problems
  return a status flag instead of raising (SURVEY §5.3);
- **masked polish**: OSQP's reduced-KKT polish is reformulated with an active-
  set *mask* so its shape is static; inactive rows carry an identity block.

The float64 parity oracle lives in ``tests/oracles/qp_ip.py``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from racinglmpc_tpu.utils.config import SolverConfig


class QPData(NamedTuple):
    """One dense QP in OSQP form (add leading batch dims and vmap to batch)."""

    P: jnp.ndarray  # (n, n) symmetric PSD cost
    q: jnp.ndarray  # (n,)
    A: jnp.ndarray  # (m, n) constraint matrix
    l: jnp.ndarray  # (m,) lower bounds (-inf for one-sided rows)
    u: jnp.ndarray  # (m,) upper bounds


class QPSolution(NamedTuple):
    x: jnp.ndarray        # (n,) primal
    y: jnp.ndarray        # (m,) dual
    pri_res: jnp.ndarray  # () final unscaled primal residual (inf norm)
    dua_res: jnp.ndarray  # () final unscaled dual residual (inf norm)
    solved: jnp.ndarray   # () bool — residuals below tolerance
    iters: jnp.ndarray    # () int32 — first iteration at which tolerance held
    polished: jnp.ndarray  # () bool — polish improved the KKT residual


def _ruiz_equilibrate(qp: QPData, iters: int):
    """Modified Ruiz equilibration of the stacked KKT (OSQP scaling).

    Returns scaled problem + (D, E, c) such that
    x = D x_scaled,  y = E y_scaled / c.
    """
    P, q, A, l, u = qp
    n, m = P.shape[0], A.shape[0]
    D = jnp.ones(n, dtype=P.dtype)
    E = jnp.ones(m, dtype=P.dtype)
    c = jnp.asarray(1.0, dtype=P.dtype)

    def body(_, carry):
        P, q, A, l, u, D, E, c = carry
        col_norm = jnp.maximum(
            jnp.max(jnp.abs(P), axis=0), jnp.max(jnp.abs(A), axis=0)
        )
        d = 1.0 / jnp.sqrt(jnp.where(col_norm > 1e-12, col_norm, 1.0))
        row_norm = jnp.max(jnp.abs(A), axis=1)
        e = 1.0 / jnp.sqrt(jnp.where(row_norm > 1e-12, row_norm, 1.0))
        P = d[:, None] * P * d[None, :]
        q = d * q
        A = e[:, None] * A * d[None, :]
        l = e * l
        u = e * u
        # cost scaling (OSQP): gamma = 1/max(mean col norm of P, ||q||_inf)
        cn = jnp.mean(jnp.max(jnp.abs(P), axis=0))
        gamma = 1.0 / jnp.maximum(jnp.maximum(cn, jnp.max(jnp.abs(q))), 1e-12)
        P = gamma * P
        q = gamma * q
        return (P, q, A, l, u, D * d, E * e, c * gamma)

    P, q, A, l, u, D, E, c = jax.lax.fori_loop(
        0, iters, body, (P, q, A, l, u, D, E, c)
    )
    return QPData(P, q, A, l, u), D, E, c


def _residuals(qp: QPData, x, y, D, E, c):
    """Unscaled primal/dual residual inf-norms + OSQP relative scales."""
    Ax = qp.A @ x
    z = jnp.clip(Ax, qp.l, qp.u)
    pri = jnp.max(jnp.abs((Ax - z) / E))
    dua_vec = (qp.P @ x + qp.q + qp.A.T @ y) * D / c
    dua = jnp.max(jnp.abs(dua_vec))
    pri_scale = jnp.maximum(jnp.max(jnp.abs(Ax / E)), jnp.max(jnp.abs(z / E)))
    dua_scale = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs((qp.P @ x) * D)), jnp.max(jnp.abs((qp.A.T @ y) * D))),
        jnp.max(jnp.abs(qp.q * D)),
    ) / c
    return pri, dua, pri_scale, dua_scale


def _admm_segment(qp: QPData, rho, sigma, alpha, x, z, y, n_iter: int,
                  refine_steps: int = 0):
    """Run ``n_iter`` ADMM iterations with fixed rho (one factorization).

    ``refine_steps`` rounds of iterative refinement are applied to each
    x-update: in float32 the KKT matrix condition number (~1e5-1e6 for the
    LMPC FTOCP) makes a raw ``Kinv @ rhs`` lose ~2 digits; refinement against
    the exact (matvec-level) K restores them for two extra matvecs/round.
    """
    P, q, A, l, u = qp
    n = P.shape[0]
    K = P + sigma * jnp.eye(n, dtype=P.dtype) + (A.T * rho) @ A
    Kinv = jnp.linalg.inv(K)

    def apply_K(v):
        return P @ v + sigma * v + A.T @ (rho * (A @ v))

    def body(carry, _):
        x, z, y = carry
        rhs = sigma * x - q + A.T @ (rho * z - y)
        xt = Kinv @ rhs
        for _ in range(refine_steps):
            xt = xt + Kinv @ (rhs - apply_K(xt))
        zt = A @ xt
        x_new = alpha * xt + (1.0 - alpha) * x
        z_rel = alpha * zt + (1.0 - alpha) * z
        z_new = jnp.clip(z_rel + y / rho, l, u)
        y_new = y + rho * (z_rel - z_new)
        return (x_new, z_new, y_new), None

    (x, z, y), _ = jax.lax.scan(body, (x, z, y), None, length=n_iter)
    return x, z, y


def _polish(qp: QPData, x, y, is_eq, cfg: SolverConfig):
    """Masked active-set polish (OSQP polish reformulated with static shapes).

    Active rows: equalities always; inequalities by dual sign (y<0 lower,
    y>0 upper). Solves the regularized reduced KKT with ``refine_steps`` of
    iterative refinement against the unregularized system.
    """
    P, q, A, l, u = qp
    n, m = P.shape[0], A.shape[0]
    dt = P.dtype
    low_act = jnp.logical_and(~is_eq, (y < -1e-12) & jnp.isfinite(l))
    up_act = jnp.logical_and(~is_eq, (y > 1e-12) & jnp.isfinite(u))
    act = is_eq | low_act | up_act
    b_act = jnp.where(low_act, l, u)  # for eq rows l == u
    mask = act.astype(dt)

    Am = A * mask[:, None]
    delta = jnp.asarray(cfg.polish_delta, dtype=dt)

    def make_kkt(dlt):
        top = jnp.concatenate([P + dlt * jnp.eye(n, dtype=dt), Am.T], axis=1)
        diag = jnp.where(act, -dlt, 1.0)
        bot = jnp.concatenate([Am, jnp.diag(diag)], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    M = make_kkt(delta)
    M0 = make_kkt(jnp.asarray(0.0, dtype=dt))
    rhs = jnp.concatenate([-q, jnp.where(act, b_act, 0.0)])

    lu, piv = jax.scipy.linalg.lu_factor(M)
    sol = jax.scipy.linalg.lu_solve((lu, piv), rhs)
    for _ in range(cfg.polish_refine_steps):
        r = rhs - M0 @ sol
        sol = sol + jax.scipy.linalg.lu_solve((lu, piv), r)

    x_p = sol[:n]
    y_p = jnp.where(act, sol[n:], 0.0)
    return x_p, y_p


def solve(
    qp: QPData,
    cfg: SolverConfig = SolverConfig(),
    warm: "Optional[tuple]" = None,
) -> QPSolution:
    """Solve one QP (vmap for a batch). Pure function of the inputs.

    ``warm``: optional ``(x, y)`` primal/dual warm start in *original*
    (unscaled) coordinates — e.g. the previous control step's solution.

    All matmuls run at ``highest`` precision: on TPU the f32 default lowers
    to bfloat16 passes, which destroys the ~1e6-conditioned KKT solves (the
    MXU still runs these shapes at full speed via 3-pass f32).
    """
    with jax.default_matmul_precision("highest"):
        return _solve_impl(qp, cfg, warm)


def _solve_impl(qp, cfg, warm):
    dt = qp.P.dtype
    orig = qp
    n, m = qp.P.shape[0], qp.A.shape[0]

    is_eq = jnp.isfinite(qp.l) & jnp.isfinite(qp.u) & (qp.u - qp.l < 1e-12)

    if cfg.scaling_iters > 0:
        qp_s, D, E, c = _ruiz_equilibrate(qp, cfg.scaling_iters)
    else:
        qp_s, D, E, c = qp, jnp.ones(n, dt), jnp.ones(m, dt), jnp.asarray(1.0, dt)

    rho0 = jnp.where(is_eq, cfg.rho * cfg.rho_eq_scale, cfg.rho).astype(dt)
    sigma = jnp.asarray(cfg.sigma, dt)
    alpha = jnp.asarray(cfg.alpha, dt)

    if warm is not None:
        x_w, y_w = warm
        fin = jnp.all(jnp.isfinite(x_w)) & jnp.all(jnp.isfinite(y_w))
        x = jnp.where(fin, x_w.astype(dt) / D, jnp.zeros(n, dt))
        y = jnp.where(fin, c * y_w.astype(dt) / E, jnp.zeros(m, dt))
        z = jnp.clip(qp_s.A @ x, qp_s.l, qp_s.u)
    else:
        x = jnp.zeros(n, dt)
        z = jnp.zeros(m, dt)
        y = jnp.zeros(m, dt)

    n_seg = max(cfg.max_iter // cfg.adaptive_rho_interval, 1) if cfg.adaptive_rho else 1
    seg_len = cfg.max_iter // n_seg

    rho = rho0
    iters = jnp.asarray(cfg.max_iter, jnp.int32)
    solved = jnp.asarray(False)
    for seg in range(n_seg):
        x, z, y = _admm_segment(
            qp_s, rho, sigma, alpha, x, z, y, seg_len,
            refine_steps=cfg.kkt_refine_steps,
        )
        pri, dua, pri_sc, dua_sc = _residuals(qp_s, x, y, D, E, c)
        eps_pri = cfg.eps_abs + cfg.eps_rel * pri_sc
        eps_dua = cfg.eps_abs + cfg.eps_rel * dua_sc
        ok = (pri < eps_pri) & (dua < eps_dua)
        iters = jnp.where(~solved & ok, (seg + 1) * seg_len, iters)
        solved = solved | ok
        # rho adaptation: only for the first few segments — in float32 the
        # late-stage dual-residual estimate is precision-noise and adapting
        # on it destabilizes an already-converged primal iterate.
        if cfg.adaptive_rho and seg + 1 < min(n_seg, cfg.adaptive_rho_max_updates + 1):
            ratio = jnp.sqrt(
                (pri / jnp.maximum(pri_sc, 1e-30))
                / jnp.maximum(dua / jnp.maximum(dua_sc, 1e-30), 1e-30)
            )
            scale = jnp.clip(ratio, 0.2, 5.0)
            rho = jnp.where(
                ~solved & ((scale > 2.0) | (scale < 0.5)),
                jnp.clip(rho * scale, 1e-6, 1e6),
                rho,
            )

    # unscale
    x_u = D * x
    y_u = E * y / c

    if cfg.polish:
        x_p, y_p = _polish(orig, x_u, y_u, is_eq, cfg)
        ones_n = jnp.ones(n, dt)
        ones_m = jnp.ones(m, dt)
        one = jnp.asarray(1.0, dt)
        pri_u, dua_u, *_ = _residuals(orig, x_u, y_u, ones_n, ones_m, one)
        pri_p, dua_p, *_ = _residuals(orig, x_p, y_p, ones_n, ones_m, one)
        finite = jnp.all(jnp.isfinite(x_p)) & jnp.all(jnp.isfinite(y_p))
        better = finite & (jnp.maximum(pri_p, dua_p) < jnp.maximum(pri_u, dua_u))
        x_u = jnp.where(better, x_p, x_u)
        y_u = jnp.where(better, y_p, y_u)
        polished = better
    else:
        polished = jnp.asarray(False)

    pri_f, dua_f, pri_sc, dua_sc = _residuals(
        orig, x_u, y_u, jnp.ones(n, dt), jnp.ones(m, dt), jnp.asarray(1.0, dt)
    )
    solved_f = (pri_f < cfg.eps_abs + cfg.eps_rel * pri_sc) & (
        dua_f < cfg.eps_abs + cfg.eps_rel * dua_sc
    )
    return QPSolution(
        x=x_u, y=y_u, pri_res=pri_f, dua_res=dua_f,
        solved=solved_f | solved, iters=iters, polished=polished,
    )


def solve_batch(qp: QPData, cfg: SolverConfig = SolverConfig()) -> QPSolution:
    """Batched solve: leading axis on every QPData leaf is the scenario axis."""
    return jax.vmap(lambda p: solve(p, cfg))(qp)
