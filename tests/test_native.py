"""Native C++ runtime library vs the JAX/NumPy paths."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racinglmpc_tpu.models import track as track_mod
from racinglmpc_tpu.models.dynamics import PlantState, plant_step
from racinglmpc_tpu.runtime import native
from racinglmpc_tpu.utils.config import SimConfig, VehicleParams

from tests.oracles import qp_ip

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_admm_matches_interior_point():
    rng = np.random.default_rng(4)
    n, me, mi = 24, 6, 16
    M = rng.normal(size=(n, n))
    P = M @ M.T / n + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    G = rng.normal(size=(me, n))
    F = rng.normal(size=(mi, n))
    z0 = rng.normal(size=n) * 0.3
    g = G @ z0
    b = F @ z0 + np.abs(rng.normal(size=mi)) + 0.1

    A = np.vstack([F, G])
    l = np.concatenate([-np.inf * np.ones(mi), g])
    u = np.concatenate([b, g])

    x, y, info = native.solve_qp_admm(P, q, A, l, u, max_iter=4000)
    assert info["solved"], info
    z_ref, _, _, ok = qp_ip.solve_qp(P, q, G=G, g=g, F=F, b=b)
    assert ok
    np.testing.assert_allclose(x, z_ref, atol=5e-5)


def test_native_rollout_matches_jax_plant():
    rng = np.random.default_rng(5)
    B = 4
    trk = track_mod.make_track(dtype=jnp.float64)
    vp = VehicleParams()
    cfg = SimConfig(noise=False)

    x = rng.normal(scale=0.1, size=(B, 6))
    x[:, 0] += 0.8
    x[:, 4] = rng.uniform(0, 19, B)
    xg = x.copy()
    u = rng.normal(scale=0.2, size=(B, 2))

    segs, L = native.track_segs(trk)
    nx, nxg = native.rollout(
        x, xg, u, native.vehicle_vals(vp), segs, L,
        substeps=cfg.substeps, dt_sub=cfg.delta_t,
    )

    ref = jax.vmap(
        lambda a, b2, c: plant_step(PlantState(a, b2), c, vp, trk, cfg, None)
    )(jnp.asarray(x), jnp.asarray(xg), jnp.asarray(u))
    np.testing.assert_allclose(nx, np.asarray(ref.x), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(nxg, np.asarray(ref.x_glob), rtol=1e-9, atol=1e-9)


def test_native_admm_on_lmpc_shaped_problem():
    """Native solver on a 200-var FTOCP-shaped QP (assembled by ocp)."""
    from racinglmpc_tpu.controllers import ocp
    from racinglmpc_tpu.utils.config import LMPCConfig

    cfg = LMPCConfig()
    K = cfg.num_ss_points
    dims, tmpl = ocp.make_templates(
        N=cfg.N, Q=cfg.Q, R=cfg.R, dR=cfg.dR, Qf=(0.0,) * 6,
        q_slack=cfg.q_slack, x_ref=(0.0,) * 6, ey_max=cfg.ey_max,
        delta_max=cfg.delta_max, a_max=cfg.a_max,
        K=K, q_terminal_slack=cfg.q_terminal_slack,
    )
    rng = np.random.default_rng(6)
    N = cfg.N
    A_dyn = np.tile(np.eye(6), (N, 1, 1))
    A_dyn[:, 4, 0] = 0.1
    B_dyn = np.zeros((N, 6, 2))
    B_dyn[:, 0, 1] = 0.1
    B_dyn[:, 2, 0] = 0.5
    C_dyn = np.zeros((N, 6))
    x0 = np.array([0.8, 0, 0, 0, 1.0, 0.0])
    ss = np.tile(x0[:, None], (1, K)) + 0.05 * rng.normal(size=(6, K))
    ss[4] += 0.1 * N * x0[0]
    qfun = np.linspace(60, 40, K)
    qp = ocp.assemble_qp(
        dims, tmpl,
        ocp.StageDynamics(jnp.asarray(A_dyn), jnp.asarray(B_dyn),
                          jnp.asarray(C_dyn)),
        jnp.asarray(x0), jnp.zeros(2), cfg.dR,
        ss_points=jnp.asarray(ss), qfun_sel=jnp.asarray(qfun),
    )
    x, y, info = native.solve_qp_admm(
        np.asarray(qp.P), np.asarray(qp.q), np.asarray(qp.A),
        np.asarray(qp.l), np.asarray(qp.u), max_iter=4000,
    )
    assert info["solved"], info
    x_pred, u_pred, _, lam, _ = ocp.unpack(dims, jnp.asarray(x))
    assert abs(float(jnp.sum(lam)) - 1.0) < 1e-4
