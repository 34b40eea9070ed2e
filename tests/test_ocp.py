"""FTOCP assembly vs the loop-based NumPy oracle + solved-QP sanity."""
import jax
import jax.numpy as jnp
import numpy as np

from racinglmpc_tpu.controllers import ocp
from racinglmpc_tpu.utils.config import LMPCConfig, MPCConfig, SolverConfig
from racinglmpc_tpu.ops import qp as qp_mod

from tests.oracles import ref_ftocp, qp_ip

RNG = np.random.default_rng(7)


def _rand_dyn(N):
    A = np.eye(6) + 0.05 * RNG.normal(size=(N, 6, 6))
    B = 0.1 * RNG.normal(size=(N, 6, 2))
    C = 0.01 * RNG.normal(size=(N, 6))
    return A, B, C


def _mpc_setup(cfg: MPCConfig):
    dims, tmpl = ocp.make_templates(
        N=cfg.N, Q=cfg.Q, R=cfg.R, dR=cfg.dR, Qf=cfg.Qf,
        q_slack=cfg.q_slack, x_ref=cfg.x_ref, ey_max=cfg.ey_max,
        delta_max=cfg.delta_max, a_max=cfg.a_max,
    )
    return dims, tmpl


def test_mpc_assembly_matches_oracle():
    cfg = MPCConfig(dR=(0.7, 1.3))  # nonzero dR to exercise the rate blocks
    N = cfg.N
    dims, tmpl = _mpc_setup(cfg)
    A, B, C = _rand_dyn(N)
    x0 = RNG.normal(size=6)
    u_old = RNG.normal(size=2)

    qp = ocp.assemble_qp(
        dims, tmpl, ocp.StageDynamics(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C)),
        jnp.asarray(x0), jnp.asarray(u_old), cfg.dR,
    )
    ref = ref_ftocp.build_ftocp(
        N, cfg.Q, cfg.R, cfg.dR, cfg.Qf, cfg.q_slack, cfg.x_ref,
        cfg.ey_max, cfg.delta_max, cfg.a_max, A, B, C, x0, u_old,
    )
    mi = ref["F"].shape[0]
    np.testing.assert_allclose(np.asarray(qp.P), ref["H"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(qp.q), ref["q"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(qp.A)[:mi], ref["F"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(qp.u)[:mi], ref["b"], atol=1e-12)
    assert np.all(np.asarray(qp.l)[:mi] == -np.inf)
    np.testing.assert_allclose(np.asarray(qp.A)[mi:], ref["G"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(qp.l)[mi:], ref["g_eq"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(qp.u)[mi:], ref["g_eq"], atol=1e-12)
    # verified sizes from SURVEY §2.a: z=146, eq=90, ineq=112
    assert dims.nz == 146 and dims.me == 90 and dims.mi == 112


def test_lmpc_assembly_matches_oracle():
    cfg = LMPCConfig()
    N, K = cfg.N, cfg.num_ss_points
    dims, tmpl = ocp.make_templates(
        N=N, Q=cfg.Q, R=cfg.R, dR=cfg.dR, Qf=(0.0,) * 6,
        q_slack=cfg.q_slack, x_ref=(0.0,) * 6, ey_max=cfg.ey_max,
        delta_max=cfg.delta_max, a_max=cfg.a_max,
        K=K, q_terminal_slack=cfg.q_terminal_slack,
    )
    A, B, C = _rand_dyn(N)
    x0 = RNG.normal(size=6)
    u_old = RNG.normal(size=2)
    ss_pts = RNG.normal(size=(6, K))
    qfun = np.abs(RNG.normal(size=K)) * 50

    qp = ocp.assemble_qp(
        dims, tmpl, ocp.StageDynamics(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C)),
        jnp.asarray(x0), jnp.asarray(u_old), cfg.dR,
        ss_points=jnp.asarray(ss_pts), qfun_sel=jnp.asarray(qfun),
    )
    ref = ref_ftocp.build_ftocp(
        N, cfg.Q, cfg.R, cfg.dR, (0.0,) * 6, cfg.q_slack, (0.0,) * 6,
        cfg.ey_max, cfg.delta_max, cfg.a_max, A, B, C, x0, u_old,
        K=K, q_terminal_slack=cfg.q_terminal_slack,
        ss_points=ss_pts, qfun_sel=qfun,
    )
    mi = ref["F"].shape[0]
    np.testing.assert_allclose(np.asarray(qp.P), ref["H"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(qp.q), ref["q"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(qp.A)[:mi], ref["F"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(qp.A)[mi:], ref["G"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(qp.l)[mi:], ref["g_eq"], atol=1e-12)
    # verified sizes from SURVEY §2.a: z=200, eq=97, ineq=160
    assert dims.nz == 200 and dims.me == 97 and dims.mi == 160


def test_mpc_qp_solution_vs_interior_point():
    """End-to-end: assembled MPC QP solved by the batched ADMM matches the
    float64 interior-point oracle on the same matrices."""
    cfg = MPCConfig(dR=(0.5, 0.5))
    dims, tmpl = _mpc_setup(cfg)
    # stable-ish dynamics around the reference operating point
    A, B, C = _rand_dyn(cfg.N)
    A = 0.9 * A
    x0 = np.array([0.6, 0.0, 0.0, 0.05, 1.0, 0.1])
    u_old = np.zeros(2)

    qp = ocp.assemble_qp(
        dims, tmpl, ocp.StageDynamics(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C)),
        jnp.asarray(x0), jnp.asarray(u_old), cfg.dR,
    )
    sol = qp_mod.solve(qp, SolverConfig(max_iter=500))

    ref = ref_ftocp.build_ftocp(
        cfg.N, cfg.Q, cfg.R, cfg.dR, cfg.Qf, cfg.q_slack, cfg.x_ref,
        cfg.ey_max, cfg.delta_max, cfg.a_max, A, B, C, x0, u_old,
    )
    z, _, _, ok = qp_ip.solve_qp(
        ref["H"], ref["q"], G=ref["G"], g=ref["g_eq"], F=ref["F"], b=ref["b"]
    )
    assert ok
    x_pred, u_pred, *_ = ocp.unpack(dims, sol.x)
    x_ref_pred, u_ref_pred, *_ = ocp.unpack(dims, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(u_pred), np.asarray(u_ref_pred), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x_pred), np.asarray(x_ref_pred), atol=2e-4)


def test_unpack_roundtrip_layout():
    cfg = LMPCConfig()
    dims = ocp.FTOCPDims(N=cfg.N, K=cfg.num_ss_points)
    z = jnp.arange(dims.nz, dtype=jnp.float64)
    x, u, sl, lam, ts = ocp.unpack(dims, z)
    assert x.shape == (cfg.N + 1, 6) and u.shape == (cfg.N, 2)
    np.testing.assert_array_equal(np.asarray(x).ravel(), np.arange(90))
    np.testing.assert_array_equal(np.asarray(u).ravel(), np.arange(90, 118))
    np.testing.assert_array_equal(np.asarray(lam), np.arange(146, 194))
    np.testing.assert_array_equal(np.asarray(ts), np.arange(194, 200))
