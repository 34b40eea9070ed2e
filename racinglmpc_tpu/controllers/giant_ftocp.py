"""Giant-horizon FTOCP assembly — the bridge from ``controllers/ocp.py`` to
the cross-chip sharded solver (``ops/qp_sharded.py``).

The product FTOCP (N=14, z in R^200) is VMEM-resident and served by the dense
batched solver. This module assembles the SAME problem family — reference
FTOCP structure `/root/reference/src/fnc/controller/PredictiveControllers.py:200-257`
with the LMPC terminal safe-set block `:345-362` — at horizons two orders of
magnitude longer (N in the hundreds to thousands, z in the 5k-20k range),
where the dense path's n^2 KKT inverse cannot exist and the QP must be
sharded over a device mesh (SURVEY §5.8).

The per-stage dynamics are REAL: the framework's local system identification
(`models/sysid.py` — masked kNN + weighted least squares + analytic
curvilinear Jacobian, the reference's regressionAndLinearization semantics)
evaluated along a stored closed-loop lap, tiled cyclically around the track
for horizons longer than one lap. The safe-set terminal block selects stored
states near the horizon-end arc position with their time-to-go as the
cost-to-go vector, mirroring the reference's selectPoints / Qfun machinery
(`PredictiveControllers.py:478-513`) in assembled form.

Everything flows through :func:`ocp.make_templates` / :func:`ocp.assemble_qp`
— the exact code path the product controller uses — so a sharded solve of
the result is a solve of a genuine LMPC FTOCP, not of a synthetic random QP.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from racinglmpc_tpu.controllers import ocp
from racinglmpc_tpu.models import sysid
from racinglmpc_tpu.models import track as track_mod
from racinglmpc_tpu.ops.qp import QPData
from racinglmpc_tpu.utils.config import LMPCConfig


class GiantFTOCP(NamedTuple):
    dims: ocp.FTOCPDims
    qp: QPData
    x_lin: jnp.ndarray    # (N+1, 6) linearization trajectory (diagnostics)
    ss_points: jnp.ndarray  # (6, K) selected terminal safe-set states
    qfun_sel: jnp.ndarray   # (K,) their cost-to-go


def assemble_giant_ftocp(
    trk: track_mod.Track,
    x_lap: jnp.ndarray,   # (T, 6) one stored closed-loop lap (curvilinear)
    u_lap: jnp.ndarray,   # (T, 2)
    steps,                # () int — valid rows of the lap
    *,
    N: int,
    K: int = 48,
    cfg: LMPCConfig = LMPCConfig(),
    dt: float = 0.1,
    dtype=jnp.float32,
) -> GiantFTOCP:
    """Assemble one giant-horizon LMPC FTOCP from real lap data.

    The linearization trajectory tiles the stored lap cyclically (index
    ``k % steps``), so a horizon longer than one lap wraps around the track —
    the giant-N analog of the reference's rolled linearization trajectory.
    Returns the QP in OSQP form via the product assembly path.
    """
    T = x_lap.shape[0]
    steps = jnp.asarray(steps, jnp.int32)

    # --- sys-ID store: the lap as the model data (reference trToUse laps) ---
    store = sysid.make_lap_store(cfg.model_laps, max(T, cfg.model_pts),
                                 dtype=dtype)
    for _ in range(cfg.model_laps):
        store = sysid.add_lap(store, x_lap.astype(dtype),
                              u_lap.astype(dtype), steps)

    # --- linearization trajectory: the lap tiled cyclically over N+1 stages
    idx = jnp.arange(N + 1, dtype=jnp.int32) % jnp.maximum(steps, 1)
    x_lin = x_lap[idx].astype(dtype)
    u_lin = u_lap[jnp.arange(N, dtype=jnp.int32)
                  % jnp.maximum(steps, 1)].astype(dtype)

    A, B, C = sysid.local_linearization_horizon(
        store, trk, x_lin[:N], u_lin, cfg, dt
    )

    # --- terminal safe set: K stored states nearest (in s) to the horizon
    # end, successors included, cost-to-go = steps remaining in the lap
    s_end = x_lin[N, 4]
    t_idx = jnp.arange(T, dtype=jnp.int32)
    valid = t_idx < steps
    ds = jnp.abs(jnp.where(valid, x_lap[:, 4].astype(dtype), 1e9) - s_end)
    j0 = jnp.argmin(ds).astype(jnp.int32)
    # CLAMPED window: a modular window would mix points from s ~ 0 and
    # s ~ L with lap-discontinuous cost-to-go in one terminal block — the
    # optimizer would chase the near-zero time-to-go of the s ~ L points
    # and drag x_N a whole lap from the linearization. The product LMPC
    # handles crossings with explicit +-L shifts (lmpc.select_terminal_set);
    # here the window is clamped inside the lap instead, which reproduces
    # the reference's forward-window-at-lap-start branch
    # (PredictiveControllers.py:492-495) at the other boundary too.
    j0c = jnp.clip(j0, K // 2, jnp.maximum(steps - (K - K // 2), K // 2))
    sel = jnp.clip(j0c + jnp.arange(K, dtype=jnp.int32) - K // 2,
                   0, jnp.maximum(steps - 1, 0))
    ss_points = x_lap[sel].astype(dtype).T                      # (6, K)
    qfun_sel = (steps - sel).astype(dtype)                      # time-to-go

    dims, tmpl = ocp.make_templates(
        N=N, Q=cfg.Q, R=cfg.R, dR=cfg.dR, Qf=(0.0,) * 6,
        q_slack=cfg.q_slack, x_ref=(0.0,) * 6,
        ey_max=cfg.ey_max, delta_max=cfg.delta_max, a_max=cfg.a_max,
        K=K, q_terminal_slack=cfg.q_terminal_slack, dtype=dtype,
    )
    qp = ocp.assemble_qp(
        dims, tmpl, ocp.StageDynamics(A, B, C),
        x_lap[0].astype(dtype), u_lap[0].astype(dtype), cfg.dR,
        ss_points=ss_points, qfun_sel=qfun_sel,
    )
    return GiantFTOCP(dims=dims, qp=qp, x_lin=x_lin,
                      ss_points=ss_points, qfun_sel=qfun_sel)
