"""LMPC: sampled-safe-set terminal machinery as pure functions over buffers.

TPU-native re-design of the reference ``LMPC`` class
(`/root/reference/src/fnc/controller/PredictiveControllers.py:286-513`). The
reference grows Python lists of ragged arrays; here the safe set is a
fixed-capacity :class:`SafeSet` pytree (``(max_laps, max_pts, ·)`` buffers +
per-lap valid-row counts), so every operation is static-shape and vmaps over
a scenario batch.

Parity-critical semantics reproduced (SURVEY §2.b / reference file:line):
- cost-to-go backward DP, cost = 1/step until s ≥ L      computeCost :447-464
- safe-set selection: 4 fastest laps, L1-nearest window   selectPoints :478-513,
  addTerminalComponents :386-416
- Qfun lap-crossing correction                            :501-512
- s-wrap of zt / linearization at lap crossing            :391-394
  (NOTE: the reference subtracts the track length from ``xLin[4, -1]`` — the
  *ey of horizon point 4* — which is an indexing slip for ``xLin[-1, 4]``;
  this implementation applies the intended semantics: the arc length of the
  last linearization point.)
- addPoint cross-lap appends with s + TrackLength         addPoint :466-476
- zt/zt_u as safe-set successors weighted by λ            feasibleStateInput :382-384
- per-lap bookkeeping and xLin seeding                    addTrajectory :418-445

Index-window deviation: the reference's selection window can run past the end
of a stored lap (a latent IndexError it avoids only because ``addPoint`` keeps
extending the most recent lap); here indices are clamped to the last valid
row, which repeats the final stored point instead of crashing.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from racinglmpc_tpu.controllers import ocp
from racinglmpc_tpu.models import sysid, track as track_mod
from racinglmpc_tpu.ops import kkt_band
from racinglmpc_tpu.ops import qp as qp_mod
from racinglmpc_tpu.utils.config import LMPCConfig, SolverConfig

# plain int (NOT a jnp scalar): module import must not initialize the XLA
# backend — multi-host jobs call jax.distributed.initialize after importing
_EMPTY_TIME = 2**30              # lap-time sentinel for unused slots
_PAD_QFUN = 10000.0              # reference computeCost init value (:469)


class SafeSet(NamedTuple):
    """Fixed-capacity sampled safe set (a pytree; add leading dims to batch).

    ``n_pts`` grows during the *following* lap via :func:`add_point`;
    ``lap_time`` is the original lap length used for fastest-lap sorting
    (reference ``LapTime``, :425) and never changes.
    """

    x: jnp.ndarray         # (max_laps, max_pts, 6) curvilinear states
    u: jnp.ndarray         # (max_laps, max_pts, 2) inputs
    x_glob: jnp.ndarray    # (max_laps, max_pts, 6) global states (viz only)
    qfun: jnp.ndarray      # (max_laps, max_pts) cost-to-go
    n_pts: jnp.ndarray     # (max_laps,) int32 valid rows
    lap_time: jnp.ndarray  # (max_laps,) int32 lap length in steps
    n_laps: jnp.ndarray    # () int32 stored laps (reference ``it``)


def make_safe_set(max_laps: int, max_pts: int, dtype=jnp.float32,
                  glob_pts: Optional[int] = None) -> SafeSet:
    """``glob_pts`` sizes the global-frame mirror (reference ``SS_glob``,
    used only for plotting — nothing in the controller reads it). Pass a
    small value (e.g. 8) to drop it at scale: it is 40% of the safe set's
    HBM footprint (LMPCConfig.store_glob)."""
    gp = max_pts if glob_pts is None else glob_pts
    return SafeSet(
        x=jnp.zeros((max_laps, max_pts, 6), dtype=dtype),
        u=jnp.zeros((max_laps, max_pts, 2), dtype=dtype),
        x_glob=jnp.zeros((max_laps, gp, 6), dtype=dtype),
        qfun=jnp.full((max_laps, max_pts), _PAD_QFUN, dtype=dtype),
        n_pts=jnp.zeros((max_laps,), dtype=jnp.int32),
        lap_time=jnp.full((max_laps,), _EMPTY_TIME, dtype=jnp.int32),
        n_laps=jnp.zeros((), dtype=jnp.int32),
    )


def compute_qfun(s: jnp.ndarray, steps: jnp.ndarray, track_len) -> jnp.ndarray:
    """Backward-DP cost-to-go over one lap (reference computeCost :447-464).

    ``s``: (T,) arc lengths (rows ≥ ``steps`` are padding). cost[steps-1] = 0;
    going backwards cost[t] = cost[t+1] + 1 while s[t] < L, reset to 0 once
    the state has crossed the finish line. Padding rows keep the reference's
    10000 init value.
    """
    T = s.shape[0]
    t_idx = jnp.arange(T)
    is_last = t_idx == steps - 1
    crossed = s >= track_len

    def body(carry, inp):
        last, crossed_t = inp
        c = jnp.where(last | crossed_t, 0.0, carry + 1.0)
        return c, c

    _, rev = jax.lax.scan(
        body, 0.0, (jnp.flip(is_last), jnp.flip(crossed)), length=T
    )
    cost = jnp.flip(rev)
    return jnp.where(t_idx < steps, cost, _PAD_QFUN).astype(s.dtype)


def add_trajectory(ss: SafeSet, x: jnp.ndarray, u: jnp.ndarray,
                   x_glob: jnp.ndarray, steps: jnp.ndarray,
                   track_len) -> SafeSet:
    """Store a completed lap in the next free slot (addTrajectory :418-445).

    ``x``/``u``/``x_glob`` may be shorter than ``max_pts``; rows ≥ ``steps``
    are ignored. Pure and jittable (called once per lap).

    Capacity guard: once ``n_laps == max_laps`` the newest lap overwrites the
    last slot and ``n_laps`` stays capped, so ``select_terminal_set``'s
    most-recent-lap test (``order == n_laps - 1``) keeps matching the slot
    that actually holds the current lap.
    """
    max_laps = ss.x.shape[0]
    slot = jnp.minimum(ss.n_laps, max_laps - 1)
    T = ss.x.shape[1]
    Tg = ss.x_glob.shape[1]     # may be tiny when store_glob is off
    steps = jnp.minimum(steps, T)
    pad = lambda a, w, n=T: jnp.zeros((n, w), dtype=ss.x.dtype).at[: min(a.shape[0], n)].set(  # noqa: E731
        a[:n].astype(ss.x.dtype)
    )
    xk = pad(x, 6)
    qf = compute_qfun(xk[:, 4], steps, track_len)
    return SafeSet(
        x=ss.x.at[slot].set(xk),
        u=ss.u.at[slot].set(pad(u, 2)),
        x_glob=ss.x_glob.at[slot].set(pad(x_glob, 6, Tg)),
        qfun=ss.qfun.at[slot].set(qf),
        n_pts=ss.n_pts.at[slot].set(steps.astype(jnp.int32)),
        lap_time=ss.lap_time.at[slot].set(steps.astype(jnp.int32)),
        n_laps=jnp.minimum(ss.n_laps + 1, max_laps),
    )


class ExtBuffer(NamedTuple):
    """Pending ``add_point`` appends to the most recent lap (addPoint :466-476).

    The reference appends every closed-loop point of lap ``j`` to lap
    ``j-1``'s safe set. Scattering those appends into the big
    ``(max_laps, max_pts, ·)`` buffers every control step would drag the
    whole safe set through the ``lax.scan`` carry (per-step copies of MBs
    per scenario — the dominant non-solve cost and an HBM blow-up at large
    batch). Instead appends land in this small extension buffer (part of
    the scan carry); terminal-set selection reads stored-rows ∪ ext-rows
    for the most recent lap, and :func:`flush_ext` merges the buffer into
    the safe set once per lap (so the big buffers stay scan-*constants*).
    """

    x: jnp.ndarray   # (E, 6) appended states (s already shifted by +L)
    u: jnp.ndarray   # (E, 2)
    q: jnp.ndarray   # (E,) cost-to-go continuation
    n: jnp.ndarray   # () int32 valid rows


def make_ext_buffer(cap: int, dtype=jnp.float32) -> ExtBuffer:
    return ExtBuffer(
        x=jnp.zeros((cap, 6), dtype=dtype),
        u=jnp.zeros((cap, 2), dtype=dtype),
        q=jnp.full((cap,), _PAD_QFUN, dtype=dtype),
        n=jnp.zeros((), jnp.int32),
    )


def add_point(ss: SafeSet, ext: ExtBuffer, x: jnp.ndarray, u: jnp.ndarray,
              track_len) -> ExtBuffer:
    """Append the current closed-loop point to the *previous* lap's safe set
    with s + TrackLength and decreasing cost-to-go (addPoint :466-476).

    Writes go to the extension buffer, not the safe set (see
    :class:`ExtBuffer`); drops writes when either the buffer or the target
    lap's remaining capacity is full."""
    lap = ss.n_laps - 1
    n0 = ss.n_pts[lap]
    E = ext.x.shape[0]
    e = ext.n
    ok = (e < E) & (n0 + e < ss.x.shape[1])
    e_c = jnp.minimum(e, E - 1)
    x_app = x.astype(ss.x.dtype).at[4].add(jnp.asarray(track_len, ss.x.dtype))
    q_prev = jnp.where(
        e > 0, ext.q[jnp.maximum(e - 1, 0)],
        ss.qfun[lap, jnp.maximum(n0 - 1, 0)],
    )
    return ExtBuffer(
        x=ext.x.at[e_c].set(jnp.where(ok, x_app, ext.x[e_c])),
        u=ext.u.at[e_c].set(jnp.where(ok, u.astype(ext.u.dtype), ext.u[e_c])),
        q=ext.q.at[e_c].set(jnp.where(ok, q_prev - 1.0, ext.q[e_c])),
        n=jnp.where(ok, e + 1, e),
    )


def flush_ext(ss: SafeSet, ext: ExtBuffer) -> tuple[SafeSet, ExtBuffer]:
    """Merge pending appends into the most recent lap's stored rows.

    One dynamic-slice blend + update per buffer instead of a per-step
    scatter; called between laps (``lmpc_add_trajectory``). Positions beyond
    the appended rows rewrite the existing (padding) content unchanged."""
    E = ext.x.shape[0]
    cap = ss.x.shape[1]
    lap = jnp.maximum(ss.n_laps - 1, 0)
    n0 = ss.n_pts[lap]
    e = ext.n                       # add_point guarantees n0 + e <= cap
    start = jnp.clip(n0, 0, cap - E)
    off = n0 - start                # >= 0; block pos i holds ext row i - off
    i = jnp.arange(E)
    j = i - off
    use = (j >= 0) & (j < e)
    j_c = jnp.clip(j, 0, E - 1)

    zero = jnp.zeros((), lap.dtype)

    def blend(big, ext_rows):
        width = big.shape[-1] if big.ndim == 3 else None
        if width is None:
            blk = jax.lax.dynamic_slice(big, (lap, start), (1, E))[0]
            new = jnp.where(use, ext_rows[j_c], blk)
            return jax.lax.dynamic_update_slice(big, new[None], (lap, start))
        blk = jax.lax.dynamic_slice(big, (lap, start, zero), (1, E, width))[0]
        new = jnp.where(use[:, None], ext_rows[j_c], blk)
        return jax.lax.dynamic_update_slice(big, new[None], (lap, start, zero))

    ss2 = ss._replace(
        x=blend(ss.x, ext.x),
        u=blend(ss.u, ext.u),
        qfun=blend(ss.qfun, ext.q),
        n_pts=ss.n_pts.at[lap].add(e),
    )
    return ss2, make_ext_buffer(E, dtype=ext.x.dtype)


def _select_lap_points(ss: SafeSet, ext: ExtBuffer, lap: jnp.ndarray,
                       recent: jnp.ndarray, zt: jnp.ndarray, P: int):
    """L1-nearest window of ``P`` points in one stored lap (selectPoints :478-513).

    For the most recent lap (``recent``), the searchable rows are the stored
    rows followed by the extension-buffer appends (the reference's SS list
    grows during the lap). Returns (pts (P,6), u_pts (P,2), q_pts (P,)).
    Window: centered on the nearest point when it fits, else forward from
    it; indices clamped to the lap's valid rows (see module docstring).
    """
    xs = ss.x[lap]
    cap = xs.shape[0]
    E = ext.x.shape[0]
    n = ss.n_pts[lap]
    e_n = jnp.where(recent, ext.n, 0)
    d_st = jnp.sum(jnp.abs(xs - zt), axis=1)
    d_st = jnp.where(jnp.arange(cap) < n, d_st, jnp.inf)
    d_ex = jnp.sum(jnp.abs(ext.x - zt), axis=1)
    d_ex = jnp.where(jnp.arange(E) < e_n, d_ex, jnp.inf)
    d = jnp.concatenate([d_st, d_ex])
    m_phys = jnp.argmin(d).astype(jnp.int32)
    # physical ext rows sit at cap..cap+E-1; virtually they follow row n-1
    m = jnp.where(m_phys < cap, m_phys, m_phys - cap + n)
    n_eff = n + e_n
    half = P // 2
    # Reference branch condition is `MinNorm - numPoints/2 >= 0` with the
    # FLOAT numPoints/2 = 6.5 (:492), so the centered window needs m >= 7;
    # at m == half the reference still takes the forward window.
    start = jnp.where(m - half >= 1, m - half, m)
    idx = jnp.clip(start + jnp.arange(P), 0, jnp.maximum(n_eff - 1, 0))
    in_st = idx < n
    st_i = jnp.clip(idx, 0, cap - 1)
    ex_i = jnp.clip(idx - n, 0, E - 1)
    pts = jnp.where(in_st[:, None], xs[st_i], ext.x[ex_i])
    u_pts = jnp.where(in_st[:, None], ss.u[lap][st_i], ext.u[ex_i])
    q_pts = jnp.where(in_st, ss.qfun[lap][st_i], ext.q[ex_i])
    return pts, u_pts, q_pts


def select_terminal_set(ss: SafeSet, ext: ExtBuffer, zt: jnp.ndarray,
                        x_pred: jnp.ndarray, time_step: jnp.ndarray,
                        cfg: LMPCConfig, track_len):
    """Build the terminal-set data for one solve (addTerminalComponents :395-416).

    Picks the ``num_ss_it`` fastest stored laps, selects a window per lap
    (the most recent lap includes its pending appends), applies the Qfun
    lap-crossing correction (:501-512), and splits each window into safe-set
    points (first P-1) and their successors (last P-1).

    Returns (ss_pts (6,K), succ_x (6,K), succ_u (2,K), qfun_sel (K,)).
    """
    P = cfg.points_per_lap  # 13
    order = jnp.argsort(ss.lap_time)[: cfg.num_ss_it]  # fastest laps (:395)
    recent = order == ss.n_laps - 1                     # (4,)

    pts, u_pts, q_pts = jax.vmap(
        lambda lap, rec: _select_lap_points(ss, ext, lap, rec, zt, P)
    )(order, recent)                                    # (4,P,6) (4,P,2) (4,P)

    # Qfun lap-crossing correction (:501-512)
    crossed = jnp.any(x_pred[:, 4] > track_len)
    pred_curr = cfg.N - jnp.sum(x_pred[:, 4] > track_len)
    corr = jnp.where(
        crossed,
        jnp.where(
            recent,
            (time_step + pred_curr).astype(q_pts.dtype),
            ss.qfun[order, 0],
        ),
        0.0,
    )
    q_pts = q_pts + corr[:, None]

    K = cfg.num_ss_points
    ss_pts = pts[:, :-1].reshape(K, 6).T               # (6, K)
    succ_x = pts[:, 1:].reshape(K, 6).T
    succ_u = u_pts[:, 1:].reshape(K, 2).T
    qfun_sel = q_pts[:, :-1].reshape(K)
    return ss_pts, succ_x, succ_u, qfun_sel


class LMPCState(NamedTuple):
    """Full LMPC controller state (a pytree; vmap a leading batch axis).

    ``ss`` and ``store`` are loop-*invariant* during a lap (per-step appends
    go to ``ext``; see :class:`ExtBuffer`), so XLA keeps the big buffers in
    place across the closed-loop ``lax.scan`` instead of copying them every
    step."""

    ss: SafeSet
    ext: "ExtBuffer"        # pending addPoint appends (merged once per lap)
    store: sysid.LapStore   # local system-ID lap store
    u_old: jnp.ndarray      # (2,)
    x_lin: jnp.ndarray      # (N+1, 6)
    u_lin: jnp.ndarray      # (N, 2)
    x_pred: jnp.ndarray     # (N+1, 6)
    u_pred: jnp.ndarray     # (N, 2)
    lam: jnp.ndarray        # (K,) last safe-set multipliers
    zt: jnp.ndarray         # (6,) terminal candidate
    zt_u: jnp.ndarray       # (2,)
    warm_x: jnp.ndarray     # (nz,) previous primal solution (ADMM warm start)
    warm_y: jnp.ndarray     # (mi+me,) previous dual solution
    fac: qp_mod.FactorCache  # warm KKT factorization (Newton–Schulz refresh)
    time_step: jnp.ndarray  # () int32, reset each lap
    rejects: jnp.ndarray    # () int32 consecutive rejected solves
    feasible: jnp.ndarray   # () bool
    pri_res: jnp.ndarray    # () last QP primal residual (observability)
    dua_res: jnp.ndarray    # () last QP dual residual
    iters: jnp.ndarray      # () int32 ADMM iterations to tolerance


def init_lmpc_state(cfg: LMPCConfig, dtype=jnp.float32,
                    solver=None) -> LMPCState:
    """Empty state; seed laps go in via :func:`lmpc_add_trajectory`.

    zt starts at [0,0,0,0,10,0] (reference :333). Passing the
    :class:`SolverConfig` lets the state drop the cached KKT inverse from
    the carry when the structured path never reads it
    (``qp.init_factor_cache(with_kinv=False)`` — 160 KB/scenario)."""
    dims = ocp.FTOCPDims(N=cfg.N, K=cfg.num_ss_points)
    with_kinv = solver is None or not solver.kkt_structured
    return LMPCState(
        ss=make_safe_set(cfg.max_laps, cfg.max_pts, dtype=dtype,
                         glob_pts=cfg.glob_cap),
        ext=make_ext_buffer(cfg.ext_cap, dtype=dtype),
        store=sysid.make_lap_store(cfg.model_laps, cfg.model_pts, dtype=dtype),
        u_old=jnp.zeros(2, dtype=dtype),
        x_lin=jnp.zeros((cfg.N + 1, 6), dtype=dtype),
        u_lin=jnp.zeros((cfg.N, 2), dtype=dtype),
        x_pred=jnp.zeros((cfg.N + 1, 6), dtype=dtype),
        u_pred=jnp.zeros((cfg.N, 2), dtype=dtype),
        lam=jnp.zeros(cfg.num_ss_points, dtype=dtype),
        zt=jnp.asarray([0.0, 0.0, 0.0, 0.0, 10.0, 0.0], dtype=dtype),
        zt_u=jnp.zeros(2, dtype=dtype),
        warm_x=jnp.zeros(dims.nz, dtype=dtype),
        warm_y=jnp.zeros(dims.mi + dims.me, dtype=dtype),
        fac=qp_mod.init_factor_cache(dims.nz, dims.mi + dims.me, dtype=dtype,
                                     with_kinv=with_kinv),
        time_step=jnp.zeros((), jnp.int32),
        rejects=jnp.zeros((), jnp.int32),
        feasible=jnp.asarray(False),
        pri_res=jnp.zeros((), dtype=dtype),
        dua_res=jnp.zeros((), dtype=dtype),
        iters=jnp.zeros((), jnp.int32),
    )


def lmpc_add_trajectory(state: LMPCState, cfg: LMPCConfig,
                        x: jnp.ndarray, u: jnp.ndarray, x_glob: jnp.ndarray,
                        steps: jnp.ndarray, track_len,
                        add_to_model: bool = True) -> LMPCState:
    """Per-lap bookkeeping: flush pending addPoint appends into the previous
    lap, store the new lap in the safe set (+ model store), seed the
    linearization trajectory on the first lap (reference :431-433: rows
    1..N+1), and reset the step counter (:444-445)."""
    ss0, ext = flush_ext(state.ss, state.ext)
    first = ss0.n_laps == 0
    ss = add_trajectory(ss0, x, u, x_glob, steps, track_len)
    store = (
        sysid.add_lap(state.store, x, u, steps) if add_to_model else state.store
    )
    N = cfg.N
    dt = state.x_lin.dtype
    pad_x = jnp.zeros((N + 2, 6), dtype=dt).at[: min(x.shape[0], N + 2)].set(
        x[: N + 2].astype(dt)
    )
    pad_u = jnp.zeros((N + 1, 2), dtype=dt).at[: min(u.shape[0], N + 1)].set(
        u[: N + 1].astype(dt)
    )
    x_lin = jnp.where(first, pad_x[1:], state.x_lin)
    u_lin = jnp.where(first, pad_u[1:], state.u_lin)
    return state._replace(
        ss=ss, ext=ext, store=store, x_lin=x_lin, u_lin=u_lin,
        time_step=jnp.zeros((), jnp.int32),
    )


def make_lmpc(
    cfg: LMPCConfig,
    trk: track_mod.Track,
    solver_cfg: SolverConfig = SolverConfig(),
    dt_ctrl: float = 0.1,
    dtype=jnp.float32,
):
    """Build the LMPC step function ``(LMPCState, x0, key) -> (LMPCState, u)``.

    One step = s-wrap bookkeeping → terminal-set selection → LTV local
    system-ID over the horizon → FTOCP assembly → batched-ADMM QP solve →
    successor-based zt update → linearization roll → addPoint
    (the reference wires addPoint through the simulator's ``flagLMPC``,
    SysModel.py:37-38; here it is part of the controller step).
    """
    dims, tmpl = ocp.make_templates(
        N=cfg.N, Q=cfg.Q, R=cfg.R, dR=cfg.dR, Qf=(0.0,) * 6,
        q_slack=cfg.q_slack, x_ref=(0.0,) * 6,
        ey_max=cfg.ey_max, delta_max=cfg.delta_max, a_max=cfg.a_max,
        K=cfg.num_ss_points, q_terminal_slack=cfg.q_terminal_slack,
        dtype=dtype,
    )
    N = cfg.N
    L = trk.total_len

    use_pallas_sysid = (
        cfg.use_pallas_sysid
        and dtype == jnp.float32
        and cfg.model_pts % 128 == 0
        and (cfg.sysid_interpret or jax.default_backend() == "tpu")
    )
    if use_pallas_sysid:
        from racinglmpc_tpu.ops import pallas_sysid

        def sysid_horizon(store, x_lin, u_lin):
            return pallas_sysid.local_linearization_horizon(
                store, trk, x_lin, u_lin, cfg, dt_ctrl,
                interpret=cfg.sysid_interpret,
            )
    else:
        def sysid_horizon(store, x_lin, u_lin):
            return sysid.local_linearization_horizon(
                store, trk, x_lin, u_lin, cfg, dt_ctrl
            )

    def step(state: LMPCState, x0, key: Optional[jax.Array]):
        x0 = x0.astype(dtype)
        # s-wrap zt / last linearization point at lap crossing (:391-394)
        wrap = state.zt[4] - x0[4] > L / 2
        zt = state.zt.at[4].set(
            jnp.where(wrap, jnp.maximum(state.zt[4] - L, 0.0), state.zt[4])
        )
        x_lin = state.x_lin.at[N, 4].add(jnp.where(wrap, -L, 0.0))

        ss_pts, succ_x, succ_u, qfun_sel = select_terminal_set(
            state.ss, state.ext, zt, state.x_pred, state.time_step, cfg, L
        )

        A, B, C = sysid_horizon(state.store, x_lin[:N], state.u_lin)
        qp = ocp.assemble_qp(
            dims, tmpl, ocp.StageDynamics(A, B, C), x0, state.u_old, cfg.dR,
            ss_points=ss_pts, qfun_sel=qfun_sel,
        )
        sol = qp_mod.solve(
            qp, solver_cfg, warm=(state.warm_x, state.warm_y), fac=state.fac,
            structure=kkt_band.band_structure(dims.N, dims.K),
        )
        x_pred, u_pred, _, lam, _ = ocp.unpack(dims, sol.x)
        # QP divergence is a data path (SURVEY §5.3): accept only finite
        # solutions with small primal residual; otherwise hold the previous
        # prediction/input/multipliers.
        ok = (
            jnp.all(jnp.isfinite(sol.x))
            & (sol.pri_res < solver_cfg.accept_pri_res)
        )
        x_pred = jnp.where(ok, x_pred, state.x_pred)
        u_pred = jnp.where(ok, u_pred, jnp.broadcast_to(state.u_old, u_pred.shape))
        lam = jnp.where(ok, lam, state.lam)
        # one-stage-shifted warm start for the next solve (ocp.shift_warm)
        wx_s, wy_s = ocp.shift_warm(dims, sol.x, sol.y)
        warm_x = jnp.where(ok, wx_s, jnp.zeros_like(sol.x))
        warm_y = jnp.where(ok, wy_s, jnp.zeros_like(sol.y))

        # terminal candidate update (feasibleStateInput :382-384). On a
        # rejected solve zt is HELD: rolling it through the stale λ makes it
        # random-walk away from the car, turning every later QP infeasible.
        zt_new = jnp.where(ok, succ_x @ lam, zt)
        zt_u_new = jnp.where(ok, succ_u @ lam, state.zt_u)

        # recovery: after several consecutive rejected solves (a crashed or
        # numerically stuck scenario), fall back to the PID law
        # (Utilities.py:61-68, braking capped to keep racing speed through
        # transients) and RE-ANCHOR the controller at the car: zt <- x0 (the
        # safe-set window re-centers on the nearest stored point) and the
        # linearization trajectory collapses onto the current state. The
        # reference would have dropped into pdb here; batched scenarios must
        # self-recover.
        rejects = jnp.where(ok, 0, state.rejects + 1)
        u_pid = jnp.stack([
            -0.6 * x0[5] - 0.9 * x0[3],
            jnp.maximum(1.5 * (cfg.fallback_vt - x0[0]), -1.0),
        ]).astype(dtype)
        use_pid = rejects >= cfg.fallback_after
        bounds = jnp.asarray([cfg.delta_max, cfg.a_max], dtype=dtype)
        u_apply = jnp.clip(
            jnp.where(use_pid, u_pid, u_pred[0]), -bounds, bounds
        )
        zt_new = jnp.where(use_pid, x0, zt_new)
        zt_u_new = jnp.where(use_pid, u_apply, zt_u_new)
        x_lin_new = jnp.concatenate([x_pred[1:], zt_new[None]], axis=0)
        u_lin_new = jnp.concatenate([u_pred[1:], zt_u_new[None]], axis=0)
        x_lin_new = jnp.where(
            use_pid, jnp.broadcast_to(x0, x_lin_new.shape), x_lin_new
        )
        u_lin_new = jnp.where(
            use_pid, jnp.broadcast_to(u_apply, u_lin_new.shape), u_lin_new
        )
        ext = add_point(state.ss, state.ext, x0, u_apply, L)  # addPoint :466-476

        new = LMPCState(
            ss=state.ss, ext=ext, store=state.store, u_old=u_apply,
            x_lin=x_lin_new, u_lin=u_lin_new,
            x_pred=x_pred, u_pred=u_pred, lam=lam,
            zt=zt_new, zt_u=zt_u_new,
            warm_x=warm_x, warm_y=warm_y, fac=sol.fac,
            time_step=state.time_step + 1, rejects=rejects,
            feasible=sol.solved & ok,
            pri_res=sol.pri_res.astype(dtype),
            dua_res=sol.dua_res.astype(dtype),
            iters=sol.iters,
        )
        return new, u_apply.astype(x0.dtype)

    return step
