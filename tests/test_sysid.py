"""Local weighted regression vs a NumPy oracle of the reference semantics.

Oracle implements SURVEY §2.b.6-8 (PredictiveModel.py:48-197) with explicit
loops: scaled-L1 kNN per stored lap, Epanechnikov weights, weighted ridge LS
for the velocity rows, analytic constant-curvature Jacobian rows.
"""
import jax.numpy as jnp
import numpy as np

from racinglmpc_tpu.models import sysid, track as track_mod
from racinglmpc_tpu.utils.config import LMPCConfig


def _np_local_model(laps, trk_curv, x, u, h=5.0, kmax=7, dt=0.1):
    """Reference-semantics oracle (loop-based)."""
    scaling = np.array([0.1, 1.0, 1.0, 1.0, 1.0])
    zq = np.concatenate([x[:3], u])
    Xs, Ys, Us, Ws = [], [], [], []
    for lx, lu in laps:
        feats = np.concatenate([lx[:-1, :3], lu[:-1]], axis=1)
        d = np.abs((feats - zq) * scaling).sum(axis=1)
        order = np.argsort(d, kind="stable")[:kmax]
        w = 0.75 * (1 - (d[order] / h) ** 2)
        w[d[order] >= h] = 0.0
        Xs.append(lx[order])
        Ys.append(lx[order + 1])
        Us.append(lu[order])
        Ws.append(w)
    X = np.concatenate(Xs)
    Y = np.concatenate(Ys)
    U = np.concatenate(Us)
    W = np.concatenate(Ws)

    def wls(M, y):
        Mw = M * W[:, None]
        Q = M.T @ Mw + 1e-9 * np.eye(M.shape[1])
        return np.linalg.solve(Q, Mw.T @ y)

    ones = np.ones((X.shape[0], 1))
    th_vx = wls(np.hstack([X[:, :3], U[:, 1:2], ones]), Y[:, 0:1])[:, 0]
    th_lat = wls(np.hstack([X[:, :3], U[:, 0:1], ones]), Y[:, 1:3])

    A = np.zeros((6, 6))
    B = np.zeros((6, 2))
    C = np.zeros(6)
    A[0, :3], B[0, 1], C[0] = th_vx[:3], th_vx[3], th_vx[4]
    A[1, :3], B[1, 0], C[1] = th_lat[:3, 0], th_lat[3, 0], th_lat[4, 0]
    A[2, :3], B[2, 0], C[2] = th_lat[:3, 1], th_lat[3, 1], th_lat[4, 1]

    vx, vy, wz, epsi, s, ey = x
    cur = trk_curv(s)
    den = 1 - cur * ey
    ce, se = np.cos(epsi), np.sin(epsi)
    A[3] = [-dt * ce / den * cur, dt * se / den * cur, dt,
            1 - dt * (-vx * se - vy * ce) / den * cur, 0,
            dt * (vx * ce - vy * se) / den ** 2 * cur * (-cur)]
    A[4] = [dt * ce / den, -dt * se / den, 0,
            dt * (-vx * se - vy * ce) / den, 1,
            -dt * (vx * ce - vy * se) / den ** 2 * (-cur)]
    A[5] = [dt * se, dt * ce, 0, dt * (vx * ce - vy * se), 0, 1]
    f = np.array([
        epsi + dt * (wz - (vx * ce - vy * se) / den * cur),
        s + dt * (vx * ce - vy * se) / den,
        ey + dt * (vx * se + vy * ce),
    ])
    C[3:] = f - A[3:] @ x
    return A, B, C


def _make_laps(rng, n_laps=4, T=60):
    laps = []
    for _ in range(n_laps):
        x = rng.normal(scale=0.3, size=(T, 6))
        x[:, 0] += 0.8
        x[:, 4] = np.linspace(0, 18.0, T)
        u = rng.normal(scale=0.2, size=(T, 2))
        laps.append((x, u))
    return laps


def test_local_linearization_matches_oracle():
    rng = np.random.default_rng(5)
    laps = _make_laps(rng)
    cfg = LMPCConfig(model_laps=4, model_pts=64)
    store = sysid.make_lap_store(4, 64, dtype=jnp.float64)
    for x, u in laps:
        store = sysid.add_lap(store, jnp.asarray(x), jnp.asarray(u), jnp.int32(x.shape[0]))

    trk = track_mod.make_track(dtype=jnp.float64)

    def np_curv(s):
        return float(track_mod.curvature(trk, jnp.float64(s)))

    for trial in range(5):
        xq = rng.normal(scale=0.2, size=6)
        xq[0] += 0.8
        xq[4] = rng.uniform(0, 18)
        uq = rng.normal(scale=0.2, size=2)
        A, B, C = sysid.local_linearization(
            store, trk, jnp.asarray(xq), jnp.asarray(uq), cfg, 0.1
        )
        A_o, B_o, C_o = _np_local_model(laps, np_curv, xq, uq)
        np.testing.assert_allclose(np.asarray(A), A_o, atol=1e-8)
        np.testing.assert_allclose(np.asarray(B), B_o, atol=1e-8)
        np.testing.assert_allclose(np.asarray(C), C_o, atol=1e-8)


def test_small_spd_solver_matches_numpy():
    rng = np.random.default_rng(0)
    M = rng.normal(size=(64, 7, 5))
    Q = np.einsum("bij,bik->bjk", M, M) + 1e-6 * np.eye(5)
    B = rng.normal(size=(64, 5, 3))
    X = np.asarray(sysid._solve_small_spd(jnp.asarray(Q), jnp.asarray(B)))
    X_ref = np.linalg.solve(Q, B)
    np.testing.assert_allclose(X, X_ref, rtol=1e-6, atol=1e-8)


def test_lti_regression_matches_numpy_ridge():
    rng = np.random.default_rng(2)
    T = 80
    x = rng.normal(size=(T, 6))
    u = rng.normal(size=(T, 2))
    A, B, err = sysid.lti_regression(jnp.asarray(x), jnp.asarray(u), 1e-7)
    # oracle: pairs t=1..T-2 (sample 0 skipped), no intercept
    X = np.hstack([x[1:-1], u[1:-1]])
    Y = x[2:]
    W = np.linalg.solve(X.T @ X + 1e-7 * np.eye(8), X.T @ Y)
    np.testing.assert_allclose(np.asarray(A), W.T[:, :6], atol=1e-8)
    np.testing.assert_allclose(np.asarray(B), W.T[:, 6:], atol=1e-8)
