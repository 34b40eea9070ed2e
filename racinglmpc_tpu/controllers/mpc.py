"""LTI- and LTV-MPC as pure controller step functions.

Re-designs the reference ``MPC`` class (`/root/reference/src/fnc/controller/
PredictiveControllers.py:56-283`) as pure ``(state, x0, key) -> (state, u)``
functions compatible with :mod:`racinglmpc_tpu.runtime.loop`:

- **LTI** (reference main.py:72-81): a fixed global (A, B) from the one-shot
  ridge regression; the QP equality system is assembled once at trace time.
- **LTV** (reference main.py:86-95, ``timeVarying=True``): every step the
  model is re-identified locally at the current linearization trajectory
  (``computeLTVdynamics`` :140-145 → :mod:`racinglmpc_tpu.models.sysid`), the
  QP is reassembled, and after the solve the linearization trajectory is
  rolled forward: xLin ← [xPred[1:], xPred[-1]], uLin ← [uPred[1:], uPred[-1]]
  (:130-133 with the plain-MPC ``feasibleStateInput`` :157-159).

Controller-internal mutable state of the reference (``OldInput``, ``xLin``,
``uLin``, ``xPred``) becomes an explicit :class:`MPCState` pytree threaded
through the closed-loop scan.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from racinglmpc_tpu.controllers import ocp
from racinglmpc_tpu.models import sysid, track as track_mod
from racinglmpc_tpu.ops import kkt_band
from racinglmpc_tpu.ops import qp as qp_mod
from racinglmpc_tpu.utils.config import LMPCConfig, MPCConfig, SolverConfig


class MPCState(NamedTuple):
    """Per-scenario controller state (a pytree; vmap a leading batch axis)."""

    u_old: jnp.ndarray    # (2,) previously applied input (OldInput)
    x_lin: jnp.ndarray    # (N+1, 6) linearization trajectory (LTV; unused LTI)
    u_lin: jnp.ndarray    # (N, 2)
    x_pred: jnp.ndarray   # (N+1, 6) last predicted trajectory
    u_pred: jnp.ndarray   # (N, 2)
    warm_x: jnp.ndarray   # (nz,) previous primal solution (ADMM warm start)
    warm_y: jnp.ndarray   # (mi+me,) previous dual solution
    fac: qp_mod.FactorCache  # warm KKT factorization (Newton–Schulz refresh)
    feasible: jnp.ndarray  # () bool — last QP converged


def init_state(N: int, x_lin=None, u_lin=None, dtype=jnp.float32,
               nz: int = 0, m: int = 0, solver=None,
               time_varying: bool = False) -> MPCState:
    """Fresh controller state. For LTV, pass the warm-start trajectory
    (reference: first N+1 rows of the last stored lap, :88-90).

    Passing the :class:`SolverConfig` with ``time_varying=True`` drops the
    cached KKT inverse from the carry when the LTV structured path never
    reads it (same reasoning as ``lmpc.init_lmpc_state``); the LTI path
    always keeps it — constant matrices are the one workload where the
    cross-step warm Newton-Schulz refresh contracts."""
    with_kinv = (not time_varying) or solver is None \
        or not solver.kkt_structured
    if x_lin is None:
        x_lin = jnp.zeros((N + 1, 6), dtype=dtype)
    if u_lin is None:
        u_lin = jnp.zeros((N, 2), dtype=dtype)
    return MPCState(
        u_old=jnp.zeros(2, dtype=dtype),
        x_lin=jnp.asarray(x_lin, dtype=dtype),
        u_lin=jnp.asarray(u_lin, dtype=dtype),
        x_pred=jnp.zeros((N + 1, 6), dtype=dtype),
        u_pred=jnp.zeros((N, 2), dtype=dtype),
        warm_x=jnp.zeros(nz, dtype=dtype),
        warm_y=jnp.zeros(m, dtype=dtype),
        fac=qp_mod.init_factor_cache(nz, m, dtype=dtype,
                                     with_kinv=with_kinv),
        feasible=jnp.asarray(False),
    )


def _mpc_templates(cfg: MPCConfig, dtype):
    return ocp.make_templates(
        N=cfg.N, Q=cfg.Q, R=cfg.R, dR=cfg.dR, Qf=cfg.Qf,
        q_slack=cfg.q_slack, x_ref=cfg.x_ref,
        ey_max=cfg.ey_max, delta_max=cfg.delta_max, a_max=cfg.a_max,
        dtype=dtype,
    )


def _solve_and_unpack(dims, tmpl, dyn, x0, state: MPCState, cfg: MPCConfig,
                      solver_cfg: SolverConfig):
    qp = ocp.assemble_qp(dims, tmpl, dyn, x0, state.u_old, cfg.dR)
    # LTV: the matrices change every step and the cached-inverse warm start
    # never contracts -> use the exact structured build. LTI: the matrices
    # are CONSTANT, so the warm Newton-Schulz refresh costs one guard GEMM
    # with zero iterations -> cheaper than any rebuild; keep the NS path.
    sol = qp_mod.solve(
        qp, solver_cfg, warm=(state.warm_x, state.warm_y), fac=state.fac,
        structure=(kkt_band.band_structure(dims.N, dims.K)
                   if cfg.time_varying else None),
    )
    x_pred, u_pred, _, _, _ = ocp.unpack(dims, sol.x)
    # infeasibility/divergence is a data path (SURVEY §5.3): accept only
    # finite solutions whose primal residual is small; otherwise hold the
    # previous prediction/input.
    ok = (
        jnp.all(jnp.isfinite(sol.x))
        & (sol.pri_res < solver_cfg.accept_pri_res)
    )
    x_pred = jnp.where(ok, x_pred, state.x_pred)
    u_pred = jnp.where(ok, u_pred, jnp.broadcast_to(state.u_old, u_pred.shape))
    # one-stage-shifted warm start for the next solve (ocp.shift_warm)
    wx_s, wy_s = ocp.shift_warm(dims, sol.x, sol.y)
    warm_x = jnp.where(ok, wx_s, jnp.zeros_like(sol.x))
    warm_y = jnp.where(ok, wy_s, jnp.zeros_like(sol.y))
    return x_pred, u_pred, sol.solved & ok, warm_x, warm_y, sol.fac


def _clip_u(u, cfg):
    bounds = jnp.asarray([cfg.delta_max, cfg.a_max], dtype=u.dtype)
    return jnp.clip(u, -bounds, bounds)


def make_lti_mpc(
    cfg: MPCConfig,
    A: jnp.ndarray,
    B: jnp.ndarray,
    solver_cfg: SolverConfig = SolverConfig(),
    dtype=jnp.float32,
):
    """LTI-MPC with a fixed global model. Returns ``(step_fn, init_state)``.

    Reference: MPC with ``timeVarying=False`` — G/L assembled once
    (buildEqConstr :200-226 LTI branch), C = 0.
    """
    dims, tmpl = _mpc_templates(cfg, dtype)
    N = cfg.N
    dyn = ocp.StageDynamics(
        A=jnp.broadcast_to(jnp.asarray(A, dtype=dtype), (N, 6, 6)),
        B=jnp.broadcast_to(jnp.asarray(B, dtype=dtype), (N, 6, 2)),
        C=jnp.zeros((N, 6), dtype=dtype),
    )

    def step(state: MPCState, x0, key: Optional[jax.Array]):
        x_pred, u_pred, ok, wx, wy, fac = _solve_and_unpack(
            dims, tmpl, dyn, x0, state, cfg, solver_cfg
        )
        u = _clip_u(u_pred[0], cfg)
        new = state._replace(
            u_old=u, x_pred=x_pred, u_pred=u_pred,
            warm_x=wx, warm_y=wy, fac=fac, feasible=ok,
        )
        return new, u.astype(x0.dtype)

    return step, init_state(N, dtype=dtype, nz=dims.nz, m=dims.mi + dims.me)


def make_ltv_mpc(
    cfg: MPCConfig,
    store: sysid.LapStore,
    trk: track_mod.Track,
    lmpc_cfg: LMPCConfig = LMPCConfig(),
    solver_cfg: SolverConfig = SolverConfig(),
    dt_ctrl: float = 0.1,
    dtype=jnp.float32,
):
    """LTV-MPC with per-step local system-ID over a fixed lap store.

    ``lmpc_cfg`` carries the local-regression hyper-parameters (kNN size,
    kernel bandwidth, feature scaling — reference PredictiveModel.py:18-26).
    Returns ``(step_fn, init_state)`` with the linearization trajectory
    warm-started from the stored lap (reference :88-90: first N+1 rows).
    """
    dims, tmpl = _mpc_templates(cfg, dtype)
    N = cfg.N

    x_lin0 = store.x[0, : N + 1].astype(dtype)
    u_lin0 = store.u[0, :N].astype(dtype)

    def step(state: MPCState, x0, key: Optional[jax.Array]):
        A, B, C = sysid.local_linearization_horizon(
            store, trk, state.x_lin[:N], state.u_lin, lmpc_cfg, dt_ctrl
        )
        dyn = ocp.StageDynamics(A=A, B=B, C=C)
        x_pred, u_pred, ok, wx, wy, fac = _solve_and_unpack(
            dims, tmpl, dyn, x0, state, cfg, solver_cfg
        )
        u = _clip_u(u_pred[0], cfg)
        # roll the linearization trajectory (reference :130-133, :157-159)
        x_lin = jnp.concatenate([x_pred[1:], x_pred[-1:]], axis=0)
        u_lin = jnp.concatenate([u_pred[1:], u_pred[-1:]], axis=0)
        new = MPCState(
            u_old=u, x_lin=x_lin, u_lin=u_lin,
            x_pred=x_pred, u_pred=u_pred,
            warm_x=wx, warm_y=wy, fac=fac, feasible=ok,
        )
        return new, u.astype(x0.dtype)

    return step, init_state(
        N, x_lin0, u_lin0, dtype=dtype, nz=dims.nz, m=dims.mi + dims.me,
        solver=solver_cfg, time_varying=True,
    )
