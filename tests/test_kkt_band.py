"""Block-tridiagonal structured KKT inverse (ops/kkt_band.py).

Verifies on a REAL assembled FTOCP (not a synthetic band) that:
- the stage-interleaved permutation makes K exactly block-tridiagonal;
- the structured inverse matches the dense inverse to f64 accuracy;
- the wiring through qp.solve produces the same solutions as the NS path.
"""
import jax
import jax.numpy as jnp
import numpy as np

from racinglmpc_tpu.controllers import ocp
from racinglmpc_tpu.ops import kkt_band
from racinglmpc_tpu.ops import qp as qp_mod
from racinglmpc_tpu.utils.config import LMPCConfig, SolverConfig


def _ftocp_qp(K_ss=48, dtype=jnp.float64, seed=0):
    cfg = LMPCConfig()
    rng = np.random.default_rng(seed)
    dims, tmpl = ocp.make_templates(
        N=cfg.N, Q=cfg.Q, R=cfg.R, dR=cfg.dR, Qf=(0.0,) * 6,
        q_slack=cfg.q_slack, x_ref=(0.0,) * 6,
        ey_max=cfg.ey_max, delta_max=cfg.delta_max, a_max=cfg.a_max,
        K=K_ss, q_terminal_slack=cfg.q_terminal_slack, dtype=dtype,
    )
    A = jnp.asarray(np.eye(6) + 0.05 * rng.normal(size=(cfg.N, 6, 6)), dtype)
    B = jnp.asarray(0.1 * rng.normal(size=(cfg.N, 6, 2)), dtype)
    C = jnp.asarray(0.01 * rng.normal(size=(cfg.N, 6)), dtype)
    x0 = jnp.asarray([0.5, 0, 0, 0, 0, 0], dtype)
    u_old = jnp.zeros(2, dtype)
    kw = {}
    if K_ss:
        kw = dict(ss_points=jnp.asarray(rng.normal(size=(6, K_ss)), dtype),
                  qfun_sel=jnp.asarray(rng.uniform(1, 50, K_ss), dtype))
    qp = ocp.assemble_qp(dims, tmpl, ocp.StageDynamics(A, B, C), x0, u_old,
                         cfg.dR, **kw)
    return dims, qp


def _K_of(qp, rho_eq_scale=1e3, rho=0.1, sigma=1e-6, scale=True):
    is_eq = jnp.isfinite(qp.l) & jnp.isfinite(qp.u) & (qp.u - qp.l < 1e-12)
    rho_v = jnp.where(is_eq, rho * rho_eq_scale, rho).astype(qp.P.dtype)
    if scale:
        qp_s, D, E, c = qp_mod._ruiz_equilibrate(qp, 10)
    else:
        qp_s = qp
    return qp_mod._build_K(qp_s, rho_v, sigma)


def test_ftocp_K_is_block_tridiagonal():
    dims, qp = _ftocp_qp()
    K = np.asarray(_K_of(qp))
    st = kkt_band.band_structure(dims.N, dims.K)
    assert len(st.perm) == dims.nz
    assert kkt_band.is_block_tridiagonal(K, st)


def test_mpc_K_is_block_tridiagonal():
    dims, qp = _ftocp_qp(K_ss=0)
    K = np.asarray(_K_of(qp))
    st = kkt_band.band_structure(dims.N, 0)
    assert len(st.perm) == dims.nz
    assert kkt_band.is_block_tridiagonal(K, st)


def test_structured_inverse_matches_dense():
    dims, qp = _ftocp_qp()
    K = _K_of(qp)
    st = kkt_band.band_structure(dims.N, dims.K)
    with jax.default_matmul_precision("highest"):
        X = jax.jit(lambda k: kkt_band.structured_kinv(k, st))(K)
    Xt = np.linalg.inv(np.asarray(K, np.float64))
    resid = np.abs(np.eye(dims.nz) - np.asarray(K, np.float64)
                   @ np.asarray(X, np.float64)).max()
    assert resid < 1e-8, resid
    np.testing.assert_allclose(np.asarray(X), Xt,
                               atol=1e-8 * np.abs(Xt).max())


def test_structured_inverse_mpc_layout():
    dims, qp = _ftocp_qp(K_ss=0)
    K = _K_of(qp)
    st = kkt_band.band_structure(dims.N, 0)
    with jax.default_matmul_precision("highest"):
        X = jax.jit(lambda k: kkt_band.structured_kinv(k, st))(K)
    resid = np.abs(np.eye(dims.nz) - np.asarray(K, np.float64)
                   @ np.asarray(X, np.float64)).max()
    assert resid < 1e-8, resid


def test_solve_structured_matches_ns_path():
    """qp.solve with the structured inverse returns the same solution as the
    Newton-Schulz path (both residual-gated to the same tolerance)."""
    dims, qp = _ftocp_qp()
    st = kkt_band.band_structure(dims.N, dims.K)
    cfg_ns = SolverConfig(max_iter=2000, adaptive_rho=False, polish=False,
                          kkt_structured=False)
    cfg_st = SolverConfig(max_iter=2000, adaptive_rho=False, polish=False,
                          kkt_structured=True)
    s_ns = qp_mod.solve(qp, cfg_ns)
    s_st = qp_mod.solve(qp, cfg_st, structure=st)
    assert bool(s_ns.solved) and bool(s_st.solved)
    np.testing.assert_allclose(np.asarray(s_st.x), np.asarray(s_ns.x),
                               atol=2e-5)
    # the structured inverse passes the validity guard
    assert bool(s_st.fac.valid)


def test_throughput_presets_agree_on_solutions():
    """throughput() (NS build) and throughput_max() (structured build) are
    the same algorithm with different KKT-inverse constructions: on the
    same FTOCPs their accepted solutions agree to the solve tolerance
    scale. (Their closed-loop lap-time difference — BASELINE round-5 — is
    chaos amplification of this tolerance-level gap, not a solver bug.)"""
    import dataclasses

    dims, qp = _ftocp_qp()
    st = kkt_band.band_structure(dims.N, dims.K)
    # CPU path: use_pallas gates off; compare the XLA paths head-to-head
    a = dataclasses.replace(SolverConfig.throughput(), use_pallas=False)
    b = dataclasses.replace(SolverConfig.throughput_max(), use_pallas=False)
    sa = qp_mod.solve(qp, a)
    sb = qp_mod.solve(qp, b, structure=st)
    assert bool(sa.solved) and bool(sb.solved)
    assert float(jnp.max(jnp.abs(sa.x - sb.x))) < 5e-2
    assert float(sb.pri_res) < a.eps_abs + a.eps_rel
