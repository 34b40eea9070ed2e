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

from racinglmpc_tpu.ops import kkt_band
from racinglmpc_tpu.utils.config import SolverConfig


class QPData(NamedTuple):
    """One dense QP in OSQP form (add leading batch dims and vmap to batch)."""

    P: jnp.ndarray  # (n, n) symmetric PSD cost
    q: jnp.ndarray  # (n,)
    A: jnp.ndarray  # (m, n) constraint matrix
    l: jnp.ndarray  # (m,) lower bounds (-inf for one-sided rows)
    u: jnp.ndarray  # (m,) upper bounds


class FactorCache(NamedTuple):
    """Per-problem warm factorization state carried across control steps.

    ``kinv`` is the (approximate) inverse of the *scaled* ADMM KKT matrix
    from the previous solve. Because the FTOCP drifts slowly step to step,
    Newton–Schulz refreshes it in a handful of batched GEMMs instead of a
    fresh O(n^3) factorization — the single most expensive piece of the
    batched solve on TPU (measured: LU inverse of 1024x200x200 ≈ 160 ms;
    warm NS ≈ 2-10 ms).

    The adapted rho is deliberately NOT carried across solves: in float32
    the dual residual stalls at its precision floor, which biases each
    adaptation downward — carrying rho lets that bias compound until the
    penalty collapses (observed: rho -> 1e-6 over ~10 steps, every
    subsequent solve rejected). rho is re-derived per solve; with
    ``adaptive_rho=False`` (the throughput preset) K then differs across
    steps only through the drifting dynamics blocks and the warm NS refresh
    costs a few GEMMs every step.

    The Ruiz scaling (D, E, c) is also cached: warm solves apply it directly
    and refine with ``scaling_warm_iters`` sweeps instead of recomputing
    from scratch. Refinement alone goes *stale* over thousands of steps
    (observed round 1: laps collapsing ~9 s -> ~20 s after ~17 laps at 2
    sweeps — the cached c compounds a downward bias), so every
    ``scaling_refresh_every``-th solve re-equilibrates from scratch with the
    full ``scaling_iters`` sweeps. ``age`` counts solves for that schedule;
    it is identical across a scenario batch (every scenario solves every
    step), so the dynamic sweep count stays uniform under vmap.

    kinv: inverse of P_s + sigma I + A_s' rho A_s (scaled problem).
    """

    kinv: jnp.ndarray   # (n, n)
    D: jnp.ndarray      # (n,) Ruiz column scaling
    E: jnp.ndarray      # (m,) Ruiz row scaling
    c: jnp.ndarray      # () cost scaling
    valid: jnp.ndarray  # () bool — cache holds a usable factorization
    age: jnp.ndarray    # () int32 — solves since cache creation


def init_factor_cache(n: int, m: int, dtype=jnp.float32,
                      with_kinv: bool = True) -> FactorCache:
    """``with_kinv=False`` drops the (n, n) cached inverse from the carry —
    the structured block-tridiagonal path (SolverConfig.kkt_structured)
    rebuilds the KKT inverse exactly every step and never reads the cache,
    which at n=200 is 160 KB/scenario of dead state (~10% of the config5
    controller state). The solver falls back to a cold build if a caller
    mixes a kinv-less cache with the Newton-Schulz path."""
    return FactorCache(
        kinv=jnp.zeros((n if with_kinv else 0,) * 2, dtype=dtype),
        D=jnp.ones(n, dtype=dtype),
        E=jnp.ones(m, dtype=dtype),
        c=jnp.ones((), dtype=dtype),
        valid=jnp.asarray(False),
        age=jnp.zeros((), jnp.int32),
    )


class QPSolution(NamedTuple):
    x: jnp.ndarray        # (n,) primal
    y: jnp.ndarray        # (m,) dual
    pri_res: jnp.ndarray  # () final unscaled primal residual (inf norm)
    dua_res: jnp.ndarray  # () final unscaled dual residual (inf norm)
    solved: jnp.ndarray   # () bool — residuals below tolerance
    iters: jnp.ndarray    # () int32 — first iteration at which tolerance held
    polished: jnp.ndarray  # () bool — polish improved the KKT residual
    fac: FactorCache       # warm factorization for the next solve


def _ruiz_equilibrate(qp: QPData, iters: int, init=None):
    """Modified Ruiz equilibration of the stacked KKT (OSQP scaling).

    Returns scaled problem + (D, E, c) such that
    x = D x_scaled,  y = E y_scaled / c.

    ``init``: optional (D0, E0, c0) from a previous, nearby problem — the
    cached scaling is applied first and ``iters`` then only refines it, so
    warm solves need ~2 sweeps instead of ~10.
    """
    P, q, A, l, u = qp
    n, m = P.shape[0], A.shape[0]
    if init is not None:
        D, E, c = init
        D = D.astype(P.dtype)
        E = E.astype(P.dtype)
        c = c.astype(P.dtype)
        P = c * (D[:, None] * P * D[None, :])
        q = c * (D * q)
        A = E[:, None] * A * D[None, :]
        l = E * l
        u = E * u
    else:
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


def _build_K(qp: QPData, rho, sigma):
    P, _, A, _, _ = qp
    n = P.shape[0]
    return P + sigma * jnp.eye(n, dtype=P.dtype) + (A.T * rho) @ A


def _ns_inverse(K, X0, warm_ok, tol: float, max_iters: int,
                staged: bool = False):
    """Newton–Schulz matrix inverse: X <- X(2I - KX), matmul-only (MXU).

    Starts from ``X0`` (previous step's inverse) when it is contracting —
    judged by the *Frobenius* residual ||I - K X0||_F < 0.9, which bounds
    the spectral radius (an elementwise max does not) — otherwise from a
    norm-scaled Jacobi init. Early-exits via while_loop, so a warm refresh
    costs a few GEMMs while a cold build takes ~25-30. If the first pass
    fails to converge (stale warm start), a second pass restarts from the
    Jacobi init — it costs zero iterations when the first pass succeeded.
    Replaces the batched LU inverse, which dominates solve time on TPU
    (see FactorCache).

    Returns ``(X, resid)`` with ``resid = max|I - K X|`` of the result.
    """
    n = K.shape[0]
    dt = K.dtype
    I = jnp.eye(n, dtype=dt)

    d = 1.0 / jnp.clip(jnp.diagonal(K), 1e-12, None)
    KXj = K * d[None, :]                      # K @ diag(d), no GEMM
    cj = jnp.sqrt(jnp.sum((I - KXj) ** 2))
    Xj = (I * d[None, :]) / jnp.maximum(cj, 1.0)

    R0 = I - K @ X0
    r0_m = jnp.max(jnp.abs(R0))
    # Warm-start gate: NS from X0 converges iff the SPECTRAL radius of R0 is
    # < 1 (the residual matrix squares exactly each iteration). The round-1
    # Frobenius gate ||R0||_F < 0.9 overestimates the spectral radius by up
    # to sqrt(rank): measured on the drifting FTOCP K it rejected EVERY warm
    # start (r0_F ~ 0.94 at rho(R0) ~ 0.05), silently degrading the refresh
    # to a ~21-iteration cold Jacobi build per step — 14.4 ms of the 35 ms
    # batch-256 solve. A handful of power iterations on R0 (matvecs, ~free
    # next to one GEMM) estimates the spectral radius instead; forced-warm
    # NS then converges in ~3 iterations at realistic drift.
    def _pow(c, _):
        v, _ = c
        w = R0 @ v
        nrm = jnp.sqrt(jnp.sum(w * w))
        return (w / jnp.maximum(nrm, 1e-30), nrm), None

    v0 = jnp.full((n,), 1.0 / jnp.sqrt(jnp.asarray(n, dt)), dt)
    (_, rho_est), _ = jax.lax.scan(_pow, (v0, jnp.asarray(0.0, dt)), None,
                                   length=12)
    use_warm = warm_ok & jnp.isfinite(rho_est) & (rho_est < 0.9) \
        & jnp.isfinite(r0_m)
    X_init = jnp.where(use_warm, X0, Xj)
    # seed the loop with the guard's residual: a warm start that is STILL
    # within tolerance (slow problem drift) exits with zero iterations —
    # the whole refresh is then the one guard GEMM. Cold lanes seed with a
    # large FINITE value (inf would trip the divergence exit below).
    r_init = jnp.where(use_warm, r0_m, jnp.asarray(1e5, dt))

    def run_phase(X, r_in, prec, level):
        def cond(st):
            _, r, it = st
            # r < 1e6: a mis-gated diverging warm start squares its residual
            # every iteration — exit within a few steps and let the restart
            # pass rebuild from the Jacobi init instead of running to
            # max_iters on exploding values
            return jnp.logical_and(jnp.logical_and(r > level, r < 1e6),
                                   it < max_iters)

        def body(st):
            X, _, it = st
            R = I - jnp.matmul(K, X, precision=prec)
            return (X + jnp.matmul(X, R, precision=prec),
                    jnp.max(jnp.abs(R)), it + 1)

        X, r, _ = jax.lax.while_loop(cond, body, (X, r_in, jnp.int32(0)))
        # r is the residual BEFORE the final (squaring) update — a
        # conservative overestimate; reusing it saves a GEMM per pass.
        return X, r

    def run(X, r_in):
        """Staged-precision cold build (see SolverConfig.ns_staged_precision):
        the early iterations only contract an O(1) residual — bf16-pass
        rounding is irrelevant there — so they run at DEFAULT then HIGH,
        with the final iterations at HIGHEST restoring the tolerance.
        (Measured 12.0 -> 6.8 ms for the batch-256 cold build; on CPU the
        precision arguments are no-ops and the staging is harmless.)"""
        P = jax.lax.Precision
        if staged:
            X, r_in = run_phase(X, r_in, P.DEFAULT, max(0.3, tol))
            X, r_in = run_phase(X, r_in, P.HIGH, max(3e-2, tol))
        return run_phase(X, r_in, P.HIGHEST, tol)

    X, resid = run(X_init, r_init)
    bad = jnp.logical_not(jnp.isfinite(resid)) | (resid > 50 * tol)
    # restart pass: seeding with pass 1's exit residual makes it 0 iterations
    # (not the former mandatory one) whenever pass 1 already converged
    X2, resid2 = run(
        jnp.where(bad, Xj, X),
        jnp.where(bad, jnp.asarray(1e5, dt), resid),
    )
    # final unconditional squaring (2 GEMMs): the tolerance exits above can
    # return a residual JUST under tol — e.g. a zero-iteration warm accept
    # at r0 ~ tol, or a structured build polished exactly to tol — and the
    # Pallas kernel's iteration tail measurably degrades on ~tol-level
    # inverses (resid 9.8e-4 left 9.4% of lanes unconverged at 300
    # iterations vs p99 47 at floor level). One more iteration lands at the
    # f32 fixed-point floor (~3e-4 on the product FTOCP) regardless of
    # which exit produced X; skipped (via where) when X failed to converge
    # so a diverged iterate is not squared into NaN.
    R2 = I - K @ X2
    r2_m = jnp.max(jnp.abs(R2))
    ok2 = jnp.isfinite(r2_m) & (r2_m < 1.0)
    X3 = jnp.where(ok2, X2 + X2 @ R2, X2)
    return X3, jnp.where(ok2, jnp.minimum(resid2, r2_m), resid2)


def _make_admm_iter(qp: QPData, Kinv, rho, sigma, alpha, refine_steps: int):
    """Single-iteration ADMM update closure for a given factorization.

    ``refine_steps`` rounds of iterative refinement are applied to each
    x-update: in float32 the KKT matrix condition number (~1e5-1e6 for the
    LMPC FTOCP) makes a raw ``Kinv @ rhs`` lose ~2 digits; refinement against
    the exact (matvec-level) K restores them for two extra matvecs/round.
    (Refinement also absorbs the approximation error of the Newton–Schulz
    inverse, so a ~1e-3-accurate Kinv suffices.)
    """
    P, q, A, l, u = qp

    def apply_K(v):
        return P @ v + sigma * v + A.T @ (rho * (A @ v))

    def one_iter(x, z, y):
        rhs = sigma * x - q + A.T @ (rho * z - y)
        xt = Kinv @ rhs
        for _ in range(refine_steps):
            xt = xt + Kinv @ (rhs - apply_K(xt))
        zt = A @ xt
        x_new = alpha * xt + (1.0 - alpha) * x
        z_rel = alpha * zt + (1.0 - alpha) * z
        z_new = jnp.clip(z_rel + y / rho, l, u)
        y_new = y + rho * (z_rel - z_new)
        return x_new, z_new, y_new

    return one_iter


def _admm_segment(qp: QPData, Kinv, rho, sigma, alpha, x, z, y, n_iter: int,
                  refine_steps: int = 0):
    """Run ``n_iter`` ADMM iterations with fixed rho/factorization."""
    one_iter = _make_admm_iter(qp, Kinv, rho, sigma, alpha, refine_steps)

    def body(carry, _):
        return one_iter(*carry), None

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
    fac: "Optional[FactorCache]" = None,
    structure: "Optional[kkt_band.BandStructure]" = None,
) -> QPSolution:
    """Solve one QP (vmap for a batch). Pure function of the inputs.

    ``warm``: optional ``(x, y)`` primal/dual warm start in *original*
    (unscaled) coordinates — e.g. the previous control step's solution.
    ``fac``: optional :class:`FactorCache` from the previous solve of a
    slowly-drifting problem; enables warm Newton–Schulz refactorization.
    ``structure``: optional static stage structure of an FTOCP KKT
    (``kkt_band.band_structure``); when given (and ``cfg.kkt_structured``),
    the per-step KKT inverse is built by the exact block-tridiagonal
    factorization instead of the cold Newton–Schulz iteration — the NS
    guard still verifies the result and provides the fallback.

    All matmuls run at ``highest`` precision: on TPU the f32 default lowers
    to bfloat16 passes, which destroys the ~1e6-conditioned KKT solves (the
    MXU still runs these shapes at full speed via 3-pass f32).
    """
    with jax.default_matmul_precision("highest"):
        return _solve_impl(qp, cfg, warm, fac, structure)


def _solve_impl(qp, cfg, warm, fac, structure=None):
    dt = qp.P.dtype
    orig = qp
    n, m = qp.P.shape[0], qp.A.shape[0]

    is_eq = jnp.isfinite(qp.l) & jnp.isfinite(qp.u) & (qp.u - qp.l < 1e-12)

    if fac is not None and cfg.scaling_iters > 0:
        # warm path: apply the cached scaling, refine with a couple sweeps;
        # every scaling_refresh_every-th solve re-equilibrates from scratch
        # (full sweeps, no cached init) so the warm refinement cannot go
        # stale (see FactorCache). The sweep count is a traced fori_loop
        # bound — uniform across a batch because ``age`` is.
        refresh = jnp.logical_not(fac.valid)
        if cfg.scaling_refresh_every > 0:
            refresh = refresh | (
                fac.age % cfg.scaling_refresh_every == 0
            )
        use_warm = fac.valid & jnp.logical_not(refresh)
        one_n, one_m = jnp.ones(n, dt), jnp.ones(m, dt)
        init = (
            jnp.where(use_warm, fac.D.astype(dt), one_n),
            jnp.where(use_warm, fac.E.astype(dt), one_m),
            jnp.where(use_warm, fac.c.astype(dt), jnp.asarray(1.0, dt)),
        )
        n_sweeps = jnp.where(refresh, cfg.scaling_iters,
                             min(cfg.scaling_warm_iters, cfg.scaling_iters))
        qp_s, D, E, c = _ruiz_equilibrate(qp, n_sweeps, init=init)
    elif cfg.scaling_iters > 0:
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

    # --- factorization (warm NS refresh when a cache is provided) ----------
    ns_tol = cfg.ns_tol if cfg.ns_tol is not None else (
        1e-3 if dt == jnp.float32 else 1e-9
    )
    # keep the cached inverse in the RETURNED cache unless the caller
    # explicitly passed a kinv-less cache (fac=None callers follow the
    # docstring's chaining pattern and must receive a warm-startable cache)
    keep_kinv = fac is None or fac.kinv.size > 0
    if fac is not None and fac.kinv.size > 0:
        # The cached kinv approximates the inverse of the PREVIOUS step's
        # scaled K. The Ruiz refinement changes the scaling every step, which
        # perturbs K_s multiplicatively: K_new ~= t K_old t with
        # t = D_new/D_old elementwise (exact for the column scaling of both
        # the P and A'rhoA terms; the row scaling E and cost scaling c drifts
        # are left for Newton-Schulz to absorb). Transforming the warm start
        # by t^-1 on both sides tracks that drift for O(n^2) elementwise work
        # (no GEMM). NOTE: on the LTV/LMPC workload the warm start NEVER
        # contracts regardless (see SolverConfig.ns_staged_precision notes);
        # it pays off only for constant-matrix problems (LTI-MPC).
        ratio = fac.D.astype(dt) / jnp.where(D > 0, D, 1.0)
        kinv0 = fac.kinv.astype(dt) * ratio[:, None] * ratio[None, :]
        warm_ok = fac.valid
        age = fac.age
    elif fac is not None:
        kinv0 = jnp.zeros((n, n), dt)
        warm_ok = jnp.asarray(False)
        age = fac.age
    else:
        kinv0 = jnp.zeros((n, n), dt)
        warm_ok = jnp.asarray(False)
        age = jnp.zeros((), jnp.int32)

    total = cfg.max_iter
    use_pallas = (
        cfg.use_pallas
        and dt == jnp.float32
        and not cfg.adaptive_rho
        and (cfg.pallas_interpret or jax.default_backend() == "tpu")
    )

    # --- Pallas fused path: K build + Newton-Schulz + iteration loop all in
    # one VMEM-resident kernel. Removes every per-step XLA GEMM from the
    # solve; crucially the NS refresh early-exits PER SCENARIO, so one stale
    # lane no longer drags the batch through a lockstep cold build
    # (examples/profile_qp.py measured that at 13.9 ms/step, batch 256).
    # the structured build takes precedence over the (measured-negative)
    # fused-prologue kernel if a config enables both — both are Kinv-build
    # strategies and silently dropping the caller's BandStructure would be
    # the worse surprise
    use_structured = structure is not None and cfg.kkt_structured
    if use_pallas and cfg.pallas_fused_ns and not use_structured:
        from racinglmpc_tpu.ops import pallas_qp

        (x, y, pri_k, dua_k, iters, solved, kinv_new,
         ns_resid) = pallas_qp.admm_iterate_fused(
            qp_s.P, qp_s.A, kinv0, warm_ok,
            qp_s.q, qp_s.l, qp_s.u, rho0, D, E, c,
            x, z, y,
            sigma=cfg.sigma, alpha=cfg.alpha,
            eps_abs=cfg.eps_abs, eps_rel=cfg.eps_rel,
            max_iter=total, check_every=cfg.check_every,
            refine_steps=cfg.kkt_refine_steps,
            ns_tol=ns_tol, ns_max_iters=cfg.ns_max_iters,
            iter_precision=cfg.pallas_iter_precision,
            interpret=cfg.pallas_interpret,
            rescue_max_iter=cfg.rescue_max_iter,
            rescue_rho_scale=cfg.rescue_rho_scale,
            rescue_trigger=cfg.rescue_trigger,
            rescue_exit=cfg.rescue_exit,
        )
        return _finish(orig, cfg, dt, n, m, is_eq,
                       x_u=D * x, y_u=E * y / c,
                       solved=solved, iters=iters,
                       kinv=kinv_new, ns_resid=ns_resid, ns_tol=ns_tol,
                       D=D, E=E, c=c, age=age, pre=(pri_k, dua_k),
                   keep_kinv=keep_kinv)

    # --- phase 1: warmup at rho0, then one rho adaptation ------------------
    # (OSQP-style: adapt on the primal/dual residual ratio. A single early
    # adaptation keeps the factorization count at 2; in steady state the
    # carried rho no longer changes, so the phase-2 NS refresh is free.)
    warmup = min(cfg.warmup_iters, total)
    rho = rho0
    K1 = _build_K(qp_s, rho, sigma)
    if use_structured:
        # exact block-tridiagonal inverse (O(N b^2 n), no cond dependence),
        # polished by FIXED NS squarings. The polish count must be static,
        # not a tolerance loop: the raw structured residual (~1e-3 f32)
        # sits exactly at ns_tol but the Pallas kernel's iteration tail
        # needs the NS fixed-point floor (~3-5e-4 — measured: residual
        # 9.8e-4 left 9.4% of lanes unconverged at 300 iterations,
        # floor-level residual matches the NS-cold path's p99 of 47
        # exactly), and that floor is BELOW any tolerance an f32 NS loop
        # can test for — a while_loop at 1e-4 burns all ns_max_iters
        # chasing it (measured: +9 ms). Two squarings from ~1e-3 reach the
        # floor deterministically (one here + _ns_inverse's unconditional
        # final squaring); _ns_inverse also verifies the result and keeps
        # the Jacobi cold-build fallback if a degenerate problem ever
        # breaks a block inversion.
        X_st = kkt_band.structured_kinv(K1, structure)
        I_n = jnp.eye(n, dtype=dt)
        # one squaring here; _ns_inverse's unconditional final squaring
        # provides the second, so the handoff residual only has to clear
        # the guard (~tol), not the floor
        X_st = X_st + X_st @ (I_n - K1 @ X_st)
        Kinv1, ns_resid1 = _ns_inverse(K1, X_st, jnp.asarray(True), ns_tol,
                                       cfg.ns_max_iters,
                                       staged=cfg.ns_staged_precision)
    else:
        Kinv1, ns_resid1 = _ns_inverse(K1, kinv0, warm_ok, ns_tol,
                                       cfg.ns_max_iters,
                                       staged=cfg.ns_staged_precision)

    # --- Pallas fast path: fixed rho, whole iteration loop in one kernel ---
    if use_pallas:
        from racinglmpc_tpu.ops import pallas_qp

        x, y, pri_k, dua_k, iters, solved, _rescued = pallas_qp.admm_iterate(
            qp_s.P, Kinv1, qp_s.A, qp_s.q, qp_s.l, qp_s.u, rho, D, E, c,
            x, z, y,
            sigma=cfg.sigma, alpha=cfg.alpha,
            eps_abs=cfg.eps_abs, eps_rel=cfg.eps_rel,
            max_iter=total, check_every=cfg.check_every,
            refine_steps=cfg.kkt_refine_steps,
            iter_precision=cfg.pallas_iter_precision,
            interpret=cfg.pallas_interpret,
            rescue_max_iter=cfg.rescue_max_iter,
            rescue_rho_scale=cfg.rescue_rho_scale,
            rescue_trigger=cfg.rescue_trigger,
            rescue_exit=cfg.rescue_exit,
            ns_tol=float(ns_tol), ns_max_iters=cfg.ns_max_iters,
        )
        # pre: the kernel's exit check already computed the UNSCALED
        # residuals at full precision — reuse them instead of the 4-matvec
        # epilogue recompute (round-3 stage profile: 1.4 ms at batch 256)
        return _finish(orig, cfg, dt, n, m, is_eq,
                       x_u=D * x, y_u=E * y / c,
                       solved=solved, iters=iters,
                       kinv=Kinv1, ns_resid=ns_resid1, ns_tol=ns_tol,
                       D=D, E=E, c=c, age=age, pre=(pri_k, dua_k),
                   keep_kinv=keep_kinv)

    x, z, y = _admm_segment(
        qp_s, Kinv1, rho, sigma, alpha, x, z, y, warmup,
        refine_steps=cfg.kkt_refine_steps,
    )
    pri, dua, pri_sc, dua_sc = _residuals(qp_s, x, y, D, E, c)
    solved = (pri < cfg.eps_abs + cfg.eps_rel * pri_sc) & (
        dua < cfg.eps_abs + cfg.eps_rel * dua_sc
    )
    iters = jnp.where(solved, warmup, total).astype(jnp.int32)
    if cfg.adaptive_rho:
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

    # --- phase 2: fixed rho, early-exit chunks -----------------------------
    # Convergence is checked every ``check_every`` iterations inside a
    # while_loop: a converged problem stops iterating. Under vmap the loop
    # runs until the whole batch is done (masked lanes are frozen), so wall
    # time tracks the slowest scenario instead of always paying max_iter.
    K2 = _build_K(qp_s, rho, sigma)
    Kinv2, ns_resid = _ns_inverse(
        K2, Kinv1, jnp.asarray(True), ns_tol, cfg.ns_max_iters,
        staged=cfg.ns_staged_precision,
    )
    chunk = max(cfg.check_every, 1)
    n_chunks = max((total - warmup) // chunk, 0)
    if n_chunks > 0:
        one_iter = _make_admm_iter(
            qp_s, Kinv2, rho, sigma, alpha, cfg.kkt_refine_steps
        )

        def run_chunk(x, z, y):
            def body(carry, _):
                return one_iter(*carry), None

            (x, z, y), _ = jax.lax.scan(body, (x, z, y), None, length=chunk)
            return x, z, y

        def cond(st):
            _, _, _, k, done, _ = st
            return jnp.logical_and(jnp.logical_not(done), k < n_chunks)

        def body(st):
            x, z, y, k, done, iters = st
            x, z, y = run_chunk(x, z, y)
            pri, dua, pri_sc, dua_sc = _residuals(qp_s, x, y, D, E, c)
            ok = (pri < cfg.eps_abs + cfg.eps_rel * pri_sc) & (
                dua < cfg.eps_abs + cfg.eps_rel * dua_sc
            )
            newly = ok & jnp.logical_not(done)
            iters = jnp.where(newly, warmup + (k + 1) * chunk, iters)
            return (x, z, y, k + 1, done | ok, iters)

        x, z, y, _, done, iters = jax.lax.while_loop(
            cond, body, (x, z, y, jnp.int32(0), solved, iters)
        )
        solved = solved | done

    # --- rho-escalation rescue (XLA path; see pallas_qp._admm_core) --------
    # rho is scaled ONLY on lanes whose unscaled primal residual would be
    # rejected; for all other lanes rho_r == rho, K3 == K2, the warm NS
    # refresh converges immediately and the (vmapped, lockstep) rescue loop
    # runs zero chunks — steady-state cost is ~3 batched GEMMs.
    if cfg.rescue_max_iter > 0:
        pri_r, _, _, _ = _residuals(qp_s, x, y, D, E, c)
        need = pri_r > cfg.rescue_trigger
        s_r = jnp.where(need, cfg.rescue_rho_scale, 1.0).astype(dt)
        rho_r = rho * s_r
        K3 = _build_K(qp_s, rho_r, sigma)
        Kinv3, _ = _ns_inverse(
            K3, Kinv2 / s_r, jnp.asarray(True), ns_tol, cfg.ns_max_iters,
            staged=cfg.ns_staged_precision,
        )
        one_iter_r = _make_admm_iter(
            qp_s, Kinv3, rho_r, sigma, alpha, cfg.kkt_refine_steps
        )
        chunk_r = max(cfg.check_every, 1)
        n_rchunks = max(-(-cfg.rescue_max_iter // chunk_r), 1)
        it_main = jnp.minimum(iters, total)

        def rcond(st):
            _, _, _, k, done_r, _ = st
            return jnp.logical_and(jnp.logical_not(done_r), k < n_rchunks)

        def rbody(st):
            x, z, y, k, done_r, iters = st

            def body(carry, _):
                return one_iter_r(*carry), None

            (x, z, y), _ = jax.lax.scan(body, (x, z, y), None, length=chunk_r)
            pri, dua, pri_sc, dua_sc = _residuals(qp_s, x, y, D, E, c)
            ok = (
                (pri < cfg.eps_abs + cfg.eps_rel * pri_sc)
                & (dua < cfg.eps_abs + cfg.eps_rel * dua_sc)
            ) | (pri < cfg.rescue_exit)
            newly = ok & jnp.logical_not(done_r)
            used = jnp.minimum((k + 1) * chunk_r, cfg.rescue_max_iter)
            iters = jnp.where(newly, it_main + used, iters)
            return (x, z, y, k + 1, done_r | ok, iters)

        iters0 = jnp.where(need, it_main + cfg.rescue_max_iter, iters)
        x, z, y, _, done_r, iters = jax.lax.while_loop(
            rcond, rbody,
            (x, z, y, jnp.int32(0), jnp.logical_not(need), iters0),
        )
        # _finish recomputes the final unscaled residuals and the solved
        # flag from them, so rescued lanes are re-judged on their results

    return _finish(orig, cfg, dt, n, m, is_eq,
                   x_u=D * x, y_u=E * y / c,
                   solved=solved, iters=iters,
                   kinv=Kinv2, ns_resid=ns_resid, ns_tol=ns_tol,
                   D=D, E=E, c=c, age=age, keep_kinv=keep_kinv)


def _finish(orig, cfg, dt, n, m, is_eq, *, x_u, y_u, solved, iters,
            kinv, ns_resid, ns_tol, D, E, c, age, pre=None,
            keep_kinv=True):
    """Shared epilogue: optional polish, final residuals, cache packing.

    ``pre``: optional (pri, dua) UNSCALED residuals already computed by the
    Pallas kernel's (full-precision) exit check — with polish off they are
    the same quantities this epilogue would recompute with 4 batched
    matvecs, so reuse them (the kernel's ``solved`` flag already encodes
    the relative-tolerance test).
    """
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

    if pre is not None and not cfg.polish:
        pri_f, dua_f = pre
        solved_f = solved
    else:
        pri_f, dua_f, pri_sc, dua_sc = _residuals(
            orig, x_u, y_u, jnp.ones(n, dt), jnp.ones(m, dt),
            jnp.asarray(1.0, dt)
        )
        solved_f = (pri_f < cfg.eps_abs + cfg.eps_rel * pri_sc) & (
            dua_f < cfg.eps_abs + cfg.eps_rel * dua_sc
        )
    fac_out = FactorCache(
        kinv=kinv if keep_kinv else kinv[:0, :0],
        D=D, E=E, c=c,
        valid=jnp.all(jnp.isfinite(kinv)) & (ns_resid < 50 * ns_tol),
        age=age + 1,
    )
    return QPSolution(
        x=x_u, y=y_u, pri_res=pri_f, dua_res=dua_f,
        solved=solved_f | solved, iters=iters, polished=polished,
        fac=fac_out,
    )


def solve_batch(qp: QPData, cfg: SolverConfig = SolverConfig()) -> QPSolution:
    """Batched solve: leading axis on every QPData leaf is the scenario axis."""
    return jax.vmap(lambda p: solve(p, cfg))(qp)
