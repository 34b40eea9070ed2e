"""System identification: global LTI ridge regression + local weighted LS.

TPU-native re-design of the reference's two model-learning paths:

1. :func:`lti_regression` — the one-shot global ridge fit used by the LTI-MPC
   stage (`/root/reference/src/fnc/Utilities.py:5-28`): one batched
   normal-equations solve (mask-weighted so fixed-capacity trajectories work).

2. :class:`LapStore` + :func:`local_linearization` — the per-step local model
   of `PredictiveModel` (`/root/reference/src/fnc/controller/PredictiveModel.py`):
   for a query (x, u), per stored lap select the <=7 nearest samples in a
   scaled L1 feature metric with Epanechnikov weights (``computeIndices``,
   :180-197), solve the weighted least squares for the velocity rows
   (``compute_Q_M``/``compute_b``/``LMPC_LocLinReg``, :141-178 — the
   reference's 3 CVXOPT calls become two 5x5 linear solves), and fill the
   kinematic rows (epsi, s, ey) with the analytic constant-curvature Jacobian
   (:99-135). Everything is fixed-shape: ragged lap lengths and the
   fewer-than-7-neighbors case become masks, so the whole thing vmaps over
   (scenario batch x N horizon points) into large batched GEMMs.

The reference keeps *all* laps sorted ascending by step count and regresses on
the first ``trToUse`` (`PredictiveModel.py:31,35-46`), i.e. on the *shortest*
laps. :func:`add_lap` keeps exactly that multiset (the K shortest seen so
far) in a fixed-capacity buffer; since the weighted LS sums over laps
symmetrically, slot order is irrelevant.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from racinglmpc_tpu.models import track as track_mod
from racinglmpc_tpu.utils.config import LMPCConfig

# plain int (NOT a jnp scalar): importing must not initialize the XLA backend
_EMPTY = 2**30  # sentinel length for empty slots ("infinitely slow")


# ---------------------------------------------------------------------------
# Global LTI regression (Utilities.py:5-28)
# ---------------------------------------------------------------------------

def lti_regression(x: jnp.ndarray, u: jnp.ndarray, lamb: float,
                   steps: jnp.ndarray | None = None):
    """Ridge fit x_{k+1} ~ A x_k + B u_k over a stored trajectory.

    ``x``: (T, 6), ``u``: (T, 2); rows ``>= steps`` are padding (ignored).
    Matches the reference exactly: samples are pairs (t -> t+1) for
    t in [1, T-2] (sample 0 skipped, Utilities.py:13-14), no intercept.
    Returns (A (6,6), B (6,2), err (2,6) max/min one-step residuals).
    """
    T = x.shape[0]
    t = jnp.arange(T - 1)
    n_valid = (T if steps is None else steps) - 1
    w = ((t >= 1) & (t < n_valid)).astype(x.dtype)          # weight per pair
    X = jnp.concatenate([x[:-1], u[:-1]], axis=1)            # (T-1, 8)
    Y = x[1:]                                                # (T-1, 6)
    Xw = X * w[:, None]
    with jax.default_matmul_precision("highest"):
        Q = X.T @ Xw + lamb * jnp.eye(X.shape[1], dtype=x.dtype)
        W = jnp.linalg.solve(Q, Xw.T @ Y)                    # (8, 6)
    A = W.T[:, :6]
    B = W.T[:, 6:8]
    resid = (X @ W - Y) * w[:, None]
    err = jnp.stack([resid.max(axis=0), resid.min(axis=0)])
    return A, B, err


# ---------------------------------------------------------------------------
# Local weighted regression (PredictiveModel)
# ---------------------------------------------------------------------------

class LapStore(NamedTuple):
    """Fixed-capacity store of the K shortest laps seen (a pytree)."""

    x: jnp.ndarray      # (K, T, 6)
    u: jnp.ndarray      # (K, T, 2)
    steps: jnp.ndarray  # (K,) int32; _EMPTY marks an unused slot


def make_lap_store(n_laps: int, capacity: int, dtype=jnp.float32) -> LapStore:
    return LapStore(
        x=jnp.zeros((n_laps, capacity, 6), dtype=dtype),
        u=jnp.zeros((n_laps, capacity, 2), dtype=dtype),
        steps=jnp.full((n_laps,), _EMPTY, dtype=jnp.int32),
    )


def add_lap(store: LapStore, x: jnp.ndarray, u: jnp.ndarray,
            steps: jnp.ndarray) -> LapStore:
    """Insert a lap of ``steps`` valid rows, evicting the slowest stored lap
    if (and only if) the new lap is strictly faster (PredictiveModel.py:35-46
    sorted-insert semantics restricted to the used window)."""
    cap = store.x.shape[1]
    slot = jnp.argmax(store.steps)                  # slowest / empty slot
    steps = jnp.minimum(steps, cap)                 # truncate over-long laps
    do = steps < store.steps[slot]
    steps_new = jnp.where(do, steps.astype(jnp.int32), store.steps[slot])
    pad = lambda buf, new: jnp.where(do, new, buf[slot])  # noqa: E731
    xk = jnp.zeros_like(store.x[slot]).at[: x.shape[0]].set(
        x[:cap].astype(store.x.dtype)
    )
    uk = jnp.zeros_like(store.u[slot]).at[: u.shape[0]].set(
        u[:cap].astype(store.u.dtype)
    )
    return LapStore(
        x=store.x.at[slot].set(pad(store.x, xk)),
        u=store.u.at[slot].set(pad(store.u, uk)),
        steps=store.steps.at[slot].set(steps_new),
    )


def _solve_small_spd(Q: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve Q X = B for tiny SPD Q via unrolled Gauss–Jordan (no pivoting).

    ``jnp.linalg.solve`` on (...,5,5) lowers to tiny batched LU kernels that
    are pure overhead on TPU (measured ~40 ms of the sys-ID pass at B=1024);
    five unrolled elimination steps are plain broadcast VPU ops. SPD + the
    ridge jitter make diagonal pivoting safe.
    """
    n = Q.shape[-1]
    M = jnp.concatenate([Q, B], axis=-1)            # (..., n, n+nY)
    for k in range(n):
        piv = M[..., k:k + 1, k:k + 1]
        row_k = M[..., k:k + 1, :] / piv            # normalized pivot row
        col_k = M[..., :, k:k + 1]
        M = M - col_k * row_k                       # eliminate col k everywhere
        M = M.at[..., k, :].set(row_k[..., 0, :])   # restore the pivot row
    return M[..., :, n:]


def _knn_per_lap(lap_x, lap_u, lap_steps, z_query, cfg: LMPCConfig):
    """Scaled-L1 k-nearest-neighbour selection within one stored lap.

    Matches computeIndices (PredictiveModel.py:180-197): candidate rows are
    0..steps-2 (successor must exist), distance is the L1 norm of the scaled
    feature difference [vx, vy, wz, delta, a], take the MaxNumPoint smallest,
    Epanechnikov-weight and zero out those at distance >= h.
    """
    dt = lap_x.dtype
    T = lap_x.shape[0]
    scaling = jnp.asarray(cfg.feat_scaling, dtype=dt)
    feats = jnp.concatenate([lap_x[:, :3], lap_u], axis=1)          # (T, 5)
    d = jnp.sum(jnp.abs((feats - z_query) * scaling), axis=1)       # (T,)
    n_valid = jnp.minimum(lap_steps, T) - 1
    valid = (jnp.arange(T) < n_valid) & (lap_steps < _EMPTY)
    d = jnp.where(valid, d, jnp.asarray(jnp.inf, dtype=dt))
    # k smallest via knn_max unrolled masked argmins: O(k*T) min-reduces,
    # much cheaper on TPU than lax.top_k's sort for k=7, T=O(512).
    # Masking by comparison (not scatter) keeps it pure vector ops.
    t_idx = jnp.arange(T)
    idxs, ds = [], []
    for _ in range(cfg.knn_max):
        i = jnp.argmin(d)
        idxs.append(i)
        ds.append(d[i])
        d = jnp.where(t_idx == i, jnp.asarray(jnp.inf, dtype=dt), d)
    idx = jnp.stack(idxs)
    d_sel = jnp.stack(ds)
    w = 0.75 * (1.0 - (d_sel / cfg.kernel_h) ** 2)
    w = jnp.where(d_sel < cfg.kernel_h, w, 0.0)
    return idx, w


def local_linearization(store: LapStore, trk: track_mod.Track,
                        x: jnp.ndarray, u: jnp.ndarray, cfg: LMPCConfig,
                        dt_ctrl: float = 0.1
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Affine local model x_{k+1} = A x + B u + C at one query point.

    Reference: regressionAndLinearization (PredictiveModel.py:48-139).
    vmap over horizon points / scenarios for the batched version.

    Matmuls at ``highest`` precision: the 5x5 weighted normal equations are
    near-singular (reference lambda=0) and bf16-pass accumulation on TPU
    corrupts them.
    """
    with jax.default_matmul_precision("highest"):
        return _local_linearization_impl(store, trk, x, u, cfg, dt_ctrl)


def _local_linearization_impl(store, trk, x, u, cfg, dt_ctrl):
    dt = store.x.dtype
    x = x.astype(dt)
    u = u.astype(dt)
    K = store.x.shape[0]
    z_query = jnp.concatenate([x[:3], u])

    idxs, ws = [], []
    for k in range(K):  # static unroll over stored-lap slots
        idx, w = _knn_per_lap(store.x[k], store.u[k], store.steps[k], z_query, cfg)
        idxs.append(idx)
        ws.append(w)

    # gather selected samples + successors, stacked over laps -> (K*knn, .)
    xs = jnp.concatenate([store.x[k][idxs[k]] for k in range(K)], axis=0)
    us = jnp.concatenate([store.u[k][idxs[k]] for k in range(K)], axis=0)
    ys = jnp.concatenate([store.x[k][idxs[k] + 1] for k in range(K)], axis=0)
    w = jnp.concatenate(ws, axis=0)                                  # (K*knn,)

    ones = jnp.ones((xs.shape[0], 1), dtype=dt)
    reg = (cfg.reg_lambda + cfg.reg_jitter) * jnp.eye(5, dtype=dt)

    def wls(M, Y):
        Mw = M * w[:, None]
        Q = M.T @ Mw + reg
        return _solve_small_spd(Q, Mw.T @ Y)                         # (5, nY)

    # vx row: features [vx, vy, wz, a, 1] (inputFeaturesVx = accel)
    M_vx = jnp.concatenate([xs[:, :3], us[:, 1:2], ones], axis=1)
    th_vx = wls(M_vx, ys[:, 0:1])[:, 0]
    # vy & wz rows: features [vx, vy, wz, delta, 1] (inputFeaturesLat)
    M_lat = jnp.concatenate([xs[:, :3], us[:, 0:1], ones], axis=1)
    th_lat = wls(M_lat, ys[:, 1:3])                                  # (5, 2)

    A = jnp.zeros((6, 6), dtype=dt)
    B = jnp.zeros((6, 2), dtype=dt)
    C = jnp.zeros((6,), dtype=dt)
    A = A.at[0, :3].set(th_vx[:3]).at[1, :3].set(th_lat[:3, 0]).at[2, :3].set(th_lat[:3, 1])
    B = B.at[0, 1].set(th_vx[3]).at[1, 0].set(th_lat[3, 0]).at[2, 0].set(th_lat[3, 1])
    C = C.at[0].set(th_vx[4]).at[1].set(th_lat[4, 0]).at[2].set(th_lat[4, 1])

    # analytic constant-curvature kinematics rows (PredictiveModel.py:99-135)
    vx, vy, wz, epsi, s, ey = (x[i] for i in range(6))
    h = jnp.asarray(dt_ctrl, dtype=dt)
    cur = track_mod.curvature(trk, s)
    den = 1.0 - cur * ey
    # same off-track guard as the plant (models/dynamics.py): keep the
    # linearization finite for scenarios that have left the lane.
    den = jnp.where(den >= 0, jnp.maximum(den, 0.05), jnp.minimum(den, -0.05))
    ce, se = jnp.cos(epsi), jnp.sin(epsi)
    sdot = (vx * ce - vy * se) / den

    row_epsi = jnp.stack([
        -h * ce / den * cur,
        h * se / den * cur,
        h * jnp.ones((), dt),
        1.0 - h * (-vx * se - vy * ce) / den * cur,
        jnp.zeros((), dt),
        h * (vx * ce - vy * se) / (den ** 2) * cur * (-cur),
    ])
    f_epsi = epsi + h * (wz - sdot * cur)

    row_s = jnp.stack([
        h * ce / den,
        -h * se / den,
        jnp.zeros((), dt),
        h * (-vx * se - vy * ce) / den,
        jnp.ones((), dt),
        -h * (vx * ce - vy * se) / (den ** 2) * (-cur),
    ])
    f_s = s + h * sdot

    row_ey = jnp.stack([
        h * se,
        h * ce,
        jnp.zeros((), dt),
        h * (vx * ce - vy * se),
        jnp.zeros((), dt),
        jnp.ones((), dt),
    ])
    f_ey = ey + h * (vx * se + vy * ce)

    A = A.at[3].set(row_epsi).at[4].set(row_s).at[5].set(row_ey)
    C = C.at[3].set(f_epsi - row_epsi @ x)
    C = C.at[4].set(f_s - row_s @ x)
    C = C.at[5].set(f_ey - row_ey @ x)
    return A, B, C


def local_linearization_horizon(store: LapStore, trk: track_mod.Track,
                                x_lin: jnp.ndarray, u_lin: jnp.ndarray,
                                cfg: LMPCConfig, dt_ctrl: float = 0.1):
    """Vectorized over the N horizon points: (N,6),(N,2) -> (N,6,6),(N,6,2),(N,6)."""
    return jax.vmap(
        lambda xi, ui: local_linearization(store, trk, xi, ui, cfg, dt_ctrl)
    )(x_lin, u_lin)
