"""Property tests (SURVEY §4.6): batch-permutation invariance of the QP
solver, λ simplex feasibility of LMPC solves, s-wrap continuity at the
finish line, and plant determinism under key reuse."""
import jax
import jax.numpy as jnp
import numpy as np

from racinglmpc_tpu.controllers import lmpc as lmpc_mod, ocp
from racinglmpc_tpu.models import track as track_mod
from racinglmpc_tpu.ops import qp as qp_mod
from racinglmpc_tpu.utils.config import LMPCConfig, SolverConfig

RNG = np.random.default_rng(11)


def _random_qps(B, n=24, m=30):
    M = RNG.normal(size=(B, n, n))
    P = M @ M.transpose(0, 2, 1) / n + 0.3 * np.eye(n)
    q = RNG.normal(size=(B, n))
    A = RNG.normal(size=(B, m, n))
    z0 = RNG.normal(size=(B, n)) * 0.2
    Az = np.einsum("bmn,bn->bm", A, z0)
    u = Az + np.abs(RNG.normal(size=(B, m))) + 0.1
    l = Az - np.abs(RNG.normal(size=(B, m))) - 0.1
    return qp_mod.QPData(*map(jnp.asarray, (P, q, A, l, u)))


def test_qp_batch_permutation_invariance():
    B = 6
    qp = _random_qps(B)
    cfg = SolverConfig(max_iter=200)
    sol = qp_mod.solve_batch(qp, cfg)
    perm = np.asarray([3, 0, 5, 1, 4, 2])
    qp_p = qp_mod.QPData(*(leaf[perm] for leaf in qp))
    sol_p = qp_mod.solve_batch(qp_p, cfg)
    np.testing.assert_allclose(
        np.asarray(sol.x)[perm], np.asarray(sol_p.x), rtol=1e-6, atol=1e-8
    )


def test_lambda_simplex_feasibility():
    """Solved LMPC FTOCPs return λ on the unit simplex (within tolerance)."""
    cfg = LMPCConfig()
    K = cfg.num_ss_points
    dims, tmpl = ocp.make_templates(
        N=cfg.N, Q=cfg.Q, R=cfg.R, dR=cfg.dR, Qf=(0.0,) * 6,
        q_slack=cfg.q_slack, x_ref=(0.0,) * 6, ey_max=cfg.ey_max,
        delta_max=cfg.delta_max, a_max=cfg.a_max,
        K=K, q_terminal_slack=cfg.q_terminal_slack,
    )
    N = cfg.N
    A = np.tile(np.eye(6), (N, 1, 1))
    A[:, 3, 2] = 0.1
    A[:, 4, 0] = 0.1
    A[:, 5, 3] = 0.08
    B = np.zeros((N, 6, 2))
    B[:, 0, 1] = 0.1
    B[:, 2, 0] = 0.5
    C = np.zeros((N, 6))
    x0 = np.array([0.8, 0, 0, 0, 1.0, 0.0])
    # reachable terminal set around the nominal rollout end
    ss = np.tile(x0[:, None], (1, K)) + 0.05 * RNG.normal(size=(6, K))
    ss[4] += 0.1 * N * x0[0]
    qfun = np.linspace(60, 40, K)
    qp = ocp.assemble_qp(
        dims, tmpl,
        ocp.StageDynamics(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C)),
        jnp.asarray(x0), jnp.zeros(2), cfg.dR,
        ss_points=jnp.asarray(ss), qfun_sel=jnp.asarray(qfun),
    )
    sol = qp_mod.solve(qp, SolverConfig(max_iter=500))
    _, _, _, lam, _ = ocp.unpack(dims, sol.x)
    lam = np.asarray(lam)
    assert abs(lam.sum() - 1.0) < 1e-4
    assert lam.min() > -1e-5


def test_s_wrap_continuity_at_finish_line():
    trk = track_mod.make_track(dtype=jnp.float64)
    L = float(trk.total_len)
    eps = 1e-6
    for ey in (0.0, 0.2, -0.3):
        xa, ya = track_mod.global_position(trk, jnp.float64(L - eps), jnp.float64(ey))
        xb, yb = track_mod.global_position(trk, jnp.float64(L + eps), jnp.float64(ey))
        assert abs(float(xa) - float(xb)) < 1e-4
        assert abs(float(ya) - float(yb)) < 1e-4
    # curvature continuity across the wrap (closing segment is straight)
    ca = float(track_mod.curvature(trk, jnp.float64(L - eps)))
    cb = float(track_mod.curvature(trk, jnp.float64(L + eps)))
    assert ca == cb == 0.0


def test_safe_set_add_point_batchable():
    """add_point vmaps across scenarios with different lap fill levels."""
    B = 3
    cfg = LMPCConfig(max_laps=4, max_pts=64, model_pts=32)

    def build(i):
        st = lmpc_mod.make_safe_set(cfg.max_laps, cfg.max_pts, dtype=jnp.float32)
        x = jnp.ones((32, 6)) * (i + 1)
        u = jnp.ones((32, 2))
        return lmpc_mod.add_trajectory(st, x, u, x, 10 + 5 * i, 19.23)

    ss = jax.vmap(build)(jnp.arange(B))
    ext = jax.vmap(lambda _: lmpc_mod.make_ext_buffer(8))(jnp.arange(B))
    xp = jnp.tile(jnp.asarray([0.5, 0, 0, 0, 1.0, 0.0]), (B, 1))
    up = jnp.zeros((B, 2))
    ext2 = jax.vmap(
        lambda s, e, x, u: lmpc_mod.add_point(s, e, x, u, 19.23)
    )(ss, ext, xp, up)
    np.testing.assert_array_equal(np.asarray(ext2.n), np.ones(B))
    ss2, _ = jax.vmap(lmpc_mod.flush_ext)(ss, ext2)
    np.testing.assert_array_equal(
        np.asarray(ss2.n_pts[:, 0]), np.asarray(ss.n_pts[:, 0]) + 1
    )
