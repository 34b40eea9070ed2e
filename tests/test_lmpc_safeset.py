"""Safe-set machinery: Qfun DP, addPoint, point selection, Qfun corrections.

Oracles are independent NumPy transcriptions of the semantics documented in
SURVEY §2.b (computeCost / addPoint / selectPoints / addTerminalComponents,
reference PredictiveControllers.py:386-513).
"""
import jax
import jax.numpy as jnp
import numpy as np

from racinglmpc_tpu.controllers import lmpc as lmpc_mod
from racinglmpc_tpu.utils.config import LMPCConfig

L = 19.2296


def _np_qfun(s, track_len):
    """Backward DP oracle (explicit loop)."""
    T = len(s)
    c = np.zeros(T)
    for i in range(T - 2, -1, -1):
        c[i] = 0.0 if s[i] >= track_len else c[i + 1] + 1.0
    return c


def test_compute_qfun_matches_dp():
    rng = np.random.default_rng(0)
    T, steps = 64, 50
    s = np.cumsum(np.abs(rng.normal(0.5, 0.2, size=T)))
    s = s / s[steps - 1] * (L * 1.1)  # crosses the line inside the lap
    out = np.asarray(
        lmpc_mod.compute_qfun(jnp.asarray(s), jnp.int32(steps), L)
    )
    ref = _np_qfun(s[:steps], L)
    np.testing.assert_allclose(out[:steps], ref)
    assert np.all(out[steps:] == 10000.0)


def test_compute_qfun_simple_lap():
    # monotone lap, crossing only at the final stored state
    steps = 30
    s = np.linspace(0.0, L * 0.99, steps)
    out = np.asarray(
        lmpc_mod.compute_qfun(jnp.asarray(np.pad(s, (0, 10))), jnp.int32(steps), L)
    )
    # cost-to-go = steps-1-t (reference: cost 0 at the last stored state)
    np.testing.assert_allclose(out[:steps], np.arange(steps - 1, -1, -1))


def _make_ss_with_lap(x, u, steps, max_laps=4, max_pts=128):
    ss = lmpc_mod.make_safe_set(max_laps, max_pts, dtype=jnp.float64)
    return lmpc_mod.add_trajectory(
        ss, jnp.asarray(x), jnp.asarray(u),
        jnp.asarray(x), jnp.int32(steps), L,
    )


def _empty_ext(cap=16):
    return lmpc_mod.make_ext_buffer(cap, dtype=jnp.float64)


def _sel(ss, lap, zt, P, ext=None, recent=False):
    return lmpc_mod._select_lap_points(
        ss, ext if ext is not None else _empty_ext(),
        jnp.int32(lap), jnp.asarray(recent), jnp.asarray(zt), P,
    )


def test_add_point_appends_with_s_shift():
    """addPoint lands in the extension buffer; flush_ext merges it into the
    most recent lap's stored rows with s + L and decreasing Qfun."""
    rng = np.random.default_rng(1)
    steps = 40
    x = rng.normal(size=(steps, 6))
    x[:, 4] = np.linspace(0, L, steps)
    u = rng.normal(size=(steps, 2))
    ss = _make_ss_with_lap(x, u, steps)
    ss = lmpc_mod.add_trajectory(ss, jnp.asarray(x), jnp.asarray(u),
                                 jnp.asarray(x), jnp.int32(steps), L)

    xp = np.array([0.5, 0.1, 0.0, 0.0, 0.3, 0.05])
    up = np.array([0.1, 0.9])
    ext = lmpc_mod.make_ext_buffer(16, dtype=jnp.float64)
    ext = lmpc_mod.add_point(ss, ext, jnp.asarray(xp), jnp.asarray(up), L)
    lap = int(ss.n_laps) - 1
    p = int(ss.n_pts[lap])
    # visible in the buffer pre-flush
    assert int(ext.n) == 1
    np.testing.assert_allclose(
        np.asarray(ext.x[0]), xp + np.array([0, 0, 0, 0, L, 0])
    )
    np.testing.assert_allclose(
        float(ext.q[0]), float(ss.qfun[lap, p - 1]) - 1.0
    )
    ss2, ext2 = lmpc_mod.flush_ext(ss, ext)
    assert int(ext2.n) == 0
    np.testing.assert_allclose(
        np.asarray(ss2.x[lap, p]), xp + np.array([0, 0, 0, 0, L, 0])
    )
    np.testing.assert_allclose(np.asarray(ss2.u[lap, p]), up)
    np.testing.assert_allclose(
        float(ss2.qfun[lap, p]), float(ss.qfun[lap, p - 1]) - 1.0
    )
    assert int(ss2.n_pts[lap]) == p + 1
    # rows before the append are untouched
    np.testing.assert_allclose(np.asarray(ss2.x[lap, :p]),
                               np.asarray(ss.x[lap, :p]))


def test_select_window_centered_and_forward():
    steps = 60
    x = np.zeros((steps, 6))
    x[:, 4] = np.arange(steps, dtype=float)  # L1-nearest == index match on s
    u = np.tile(np.arange(steps, dtype=float)[:, None], (1, 2))
    ss = _make_ss_with_lap(x, u, steps)

    P = 13
    # centered: nearest index 30 -> window 24..36
    zt = np.zeros(6)
    zt[4] = 30.0
    pts, upts, qpts = jax.tree_util.tree_map(np.asarray, _sel(ss, 0, zt, P))
    np.testing.assert_allclose(pts[:, 4], np.arange(24, 37, dtype=float))
    np.testing.assert_allclose(upts[:, 0], np.arange(24, 37, dtype=float))
    # forward branch: nearest index 2 < P//2 -> window 2..14 (reference :492-495)
    zt[4] = 2.0
    pts, _, _ = jax.tree_util.tree_map(np.asarray, _sel(ss, 0, zt, P))
    np.testing.assert_allclose(pts[:, 4], np.arange(2, 15, dtype=float))
    # boundary: nearest index exactly P//2 = 6 -> the reference's FLOAT
    # condition (6 - 6.5 >= 0 is false) still picks the forward window 6..18
    zt[4] = 6.0
    pts, _, _ = jax.tree_util.tree_map(np.asarray, _sel(ss, 0, zt, P))
    np.testing.assert_allclose(pts[:, 4], np.arange(6, 19, dtype=float))
    # one past the boundary: nearest index 7 -> centered window 1..13
    zt[4] = 7.0
    pts, _, _ = jax.tree_util.tree_map(np.asarray, _sel(ss, 0, zt, P))
    np.testing.assert_allclose(pts[:, 4], np.arange(1, 14, dtype=float))
    # clamp: nearest at the very end -> indices clamped to steps-1
    zt[4] = 59.0
    pts, _, _ = jax.tree_util.tree_map(np.asarray, _sel(ss, 0, zt, P))
    np.testing.assert_allclose(pts[:, 4], np.r_[np.arange(53, 60), [59] * 6])


def test_select_window_reads_pending_ext_rows():
    """For the most recent lap the searchable rows are stored ∪ pending
    appends (the reference's SS list grows during the lap, selectPoints
    :478-513); for older laps the ext buffer is invisible."""
    steps = 20
    x = np.zeros((steps, 6))
    x[:, 4] = np.arange(steps, dtype=float)
    u = np.tile(np.arange(steps, dtype=float)[:, None], (1, 2))
    ss = _make_ss_with_lap(x, u, steps)
    ext = _empty_ext()
    for i in range(4):  # virtual rows 20..23 with s = 20+i (pre-shift s-L)
        xp = np.zeros(6)
        xp[4] = 20.0 + i - L
        up = np.full(2, 100.0 + i)
        ext = lmpc_mod.add_point(ss, ext, jnp.asarray(xp), jnp.asarray(up), L)
    P = 13
    zt = np.zeros(6)
    zt[4] = 22.0  # nearest is a pending ext row (virtual index 22)
    pts, upts, qpts = jax.tree_util.tree_map(
        np.asarray, _sel(ss, 0, zt, P, ext=ext, recent=True)
    )
    # centered window 16..28 clamps at the virtual end (index 23)
    np.testing.assert_allclose(
        pts[:, 4], np.r_[np.arange(16, 24, dtype=float), [23.0] * 5]
    )
    np.testing.assert_allclose(
        upts[:, 0], np.r_[np.arange(16, 20, dtype=float), [100, 101, 102, 103],
                          [103.0] * 5]
    )
    # Qfun continues decreasing across the stored/ext boundary (rows 8+ are
    # the clamped repeat of the last virtual row)
    np.testing.assert_allclose(np.diff(qpts[:8]), -1.0)
    # same query with recent=False ignores the ext rows entirely
    pts_old, _, _ = jax.tree_util.tree_map(
        np.asarray, _sel(ss, 0, zt, P, ext=ext, recent=False)
    )
    np.testing.assert_allclose(
        pts_old[:, 4], np.r_[np.arange(13, 20, dtype=float), [19.0] * 6]
    )


def test_terminal_set_fastest_laps_and_crossing_correction():
    cfg = LMPCConfig(max_laps=8, max_pts=128)
    ss = lmpc_mod.make_safe_set(cfg.max_laps, cfg.max_pts, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    lap_lengths = [50, 40, 60, 45, 55]  # fastest 4: laps 1, 3, 0, 5? -> 40,45,50,55
    for T in lap_lengths:
        x = rng.normal(scale=0.01, size=(T, 6))
        x[:, 4] = np.linspace(0, L * 1.0, T)
        u = rng.normal(size=(T, 2))
        ss = lmpc_mod.add_trajectory(
            ss, jnp.asarray(x), jnp.asarray(u), jnp.asarray(x), jnp.int32(T), L
        )

    zt = jnp.asarray(np.r_[np.zeros(4), [L / 2], [0.0]])
    # not crossed: x_pred all below L
    x_pred = jnp.zeros((cfg.N + 1, 6))
    ss_pts, succ_x, succ_u, qfun = lmpc_mod.select_terminal_set(
        ss, _empty_ext(), zt, x_pred, jnp.int32(7), cfg, L
    )
    assert ss_pts.shape == (6, 48) and succ_u.shape == (2, 48)
    # fastest-4 selection: lap 2 (len 60) must not contribute. Its s-grid is
    # distinguishable via exact successor relation within each 12-block.
    q = np.asarray(qfun).reshape(4, 12)
    # without crossing, per-lap Qfun windows are decreasing by 1
    np.testing.assert_allclose(q[:, :-1] - q[:, 1:], 1.0)

    # crossed & most recent lap: correction = time_step + predCurrLap
    x_pred_crossed = jnp.zeros((cfg.N + 1, 6)).at[:, 4].set(L + 1.0)
    _, _, _, qfun_c = lmpc_mod.select_terminal_set(
        ss, _empty_ext(), zt, x_pred_crossed, jnp.int32(7), cfg, L
    )
    # all 15 predicted states crossed -> predCurrLap = N - 15 = -1; lap-0
    # correction for older laps = Qfun[lap][0]
    order = np.argsort(np.asarray(ss.lap_time))[:4]
    qc = np.asarray(qfun_c).reshape(4, 12)
    q0 = np.asarray(qfun).reshape(4, 12)
    for j, lap in enumerate(order):
        if lap == int(ss.n_laps) - 1:
            np.testing.assert_allclose(qc[j] - q0[j], 7 + (cfg.N - 15))
        else:
            np.testing.assert_allclose(
                qc[j] - q0[j], float(np.asarray(ss.qfun[lap, 0]))
            )


def test_add_trajectory_seeds_linearization():
    cfg = LMPCConfig(max_laps=4, max_pts=64, model_pts=64)
    state = lmpc_mod.init_lmpc_state(cfg, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    T = 40
    x = rng.normal(size=(T, 6))
    u = rng.normal(size=(T, 2))
    st = lmpc_mod.lmpc_add_trajectory(
        state, cfg, jnp.asarray(x), jnp.asarray(u), jnp.asarray(x),
        jnp.int32(T), L,
    )
    # reference :431-433: xLin = SS[0][1:N+2], uLin = uSS[0][1:N+1]
    np.testing.assert_allclose(np.asarray(st.x_lin), x[1:cfg.N + 2])
    np.testing.assert_allclose(np.asarray(st.u_lin), u[1:cfg.N + 1])
    assert int(st.ss.n_laps) == 1 and int(st.time_step) == 0
    # second lap must NOT reseed
    x2 = rng.normal(size=(T, 6))
    st2 = lmpc_mod.lmpc_add_trajectory(
        st, cfg, jnp.asarray(x2), jnp.asarray(u), jnp.asarray(x2),
        jnp.int32(T), L,
    )
    np.testing.assert_allclose(np.asarray(st2.x_lin), x[1:cfg.N + 2])


def test_add_point_at_capacity_drops_writes_but_stays_consistent():
    """A lap stored near max_pts: addPoint appends until the lap's remaining
    capacity is used, then silently drops writes — after flush n_pts sits at
    capacity and the stored data (incl. selection windows) is consistent."""
    max_pts = 48
    steps = 45
    x = np.zeros((steps, 6))
    x[:, 4] = np.linspace(0, L, steps)
    u = np.ones((steps, 2))
    ss = lmpc_mod.make_safe_set(4, max_pts, dtype=jnp.float64)
    ss = lmpc_mod.add_trajectory(ss, jnp.asarray(x), jnp.asarray(u),
                                 jnp.asarray(x), jnp.int32(steps), L)

    xp = np.array([0.5, 0.0, 0.0, 0.0, 0.3, 0.0])
    up = np.array([0.1, 0.9])
    ext = _empty_ext()
    for i in range(6):  # 45 + 3 fills the lap; 3 more writes must drop
        xp[4] = 0.3 + 0.1 * i
        ext = lmpc_mod.add_point(ss, ext, jnp.asarray(xp), jnp.asarray(up), L)
    assert int(ext.n) == 3
    ss, ext = lmpc_mod.flush_ext(ss, ext)
    assert int(ss.n_pts[0]) == max_pts
    # the last in-capacity append is intact (not overwritten by the drops)
    np.testing.assert_allclose(float(ss.x[0, max_pts - 1, 4]), 0.5 + L)
    # Qfun still strictly decreasing across the appended region
    q = np.asarray(ss.qfun[0, steps - 1: max_pts])
    np.testing.assert_allclose(np.diff(q), -1.0)
    # a selection window near the end clamps instead of reading junk
    pts, _, _ = _sel(ss, 0, xp, 13)
    assert np.all(np.isfinite(np.asarray(pts)))


def test_add_point_drops_when_ext_buffer_full():
    """A lap longer than ext capacity: appends past the buffer drop and the
    valid rows stay intact."""
    steps = 10
    x = np.zeros((steps, 6))
    x[:, 4] = np.linspace(0, L, steps)
    ss = lmpc_mod.make_safe_set(4, 256, dtype=jnp.float64)
    ss = lmpc_mod.add_trajectory(ss, jnp.asarray(x), jnp.zeros((steps, 2)),
                                 jnp.asarray(x), jnp.int32(steps), L)
    cap = 4
    ext = _empty_ext(cap)
    xp = np.zeros(6)
    for i in range(cap + 3):
        xp[4] = 0.1 * i
        ext = lmpc_mod.add_point(ss, ext, jnp.asarray(xp), jnp.zeros(2), L)
    assert int(ext.n) == cap
    np.testing.assert_allclose(float(ext.x[cap - 1, 4]), 0.1 * (cap - 1) + L)
    ss2, _ = lmpc_mod.flush_ext(ss, ext)
    assert int(ss2.n_pts[0]) == steps + cap


def test_add_trajectory_at_max_laps_overwrites_last_slot():
    """Capacity guard (ADVICE round 1): once n_laps == max_laps the newest
    lap overwrites the last slot and n_laps stays capped, keeping the
    most-recent-lap test in select_terminal_set correct."""
    max_laps = 3
    steps = 20
    x = np.zeros((steps, 6))
    x[:, 4] = np.linspace(0, L, steps)
    u = np.zeros((steps, 2))
    ss = lmpc_mod.make_safe_set(max_laps, 64, dtype=jnp.float64)
    for k in range(max_laps + 2):  # two laps past capacity
        xk = x.copy()
        xk[:, 0] = float(k)  # tag each lap by vx
        ss = lmpc_mod.add_trajectory(ss, jnp.asarray(xk), jnp.asarray(u),
                                     jnp.asarray(xk), jnp.int32(steps - k), L)
    assert int(ss.n_laps) == max_laps
    # last slot holds the newest lap (tag 4), earlier slots unchanged
    assert float(ss.x[max_laps - 1, 0, 0]) == max_laps + 1
    assert float(ss.x[0, 0, 0]) == 0.0
    assert int(ss.lap_time[max_laps - 1]) == steps - (max_laps + 1)
