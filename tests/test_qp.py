"""Batched ADMM+polish QP solver vs the vendored interior-point oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racinglmpc_tpu.ops import qp as qp_mod
from racinglmpc_tpu.utils.config import SolverConfig

from tests.oracles import qp_ip

INF = np.inf


def _osqp_form(H, q, G, g, F, b):
    """Stack eq+ineq into OSQP l <= Ax <= u."""
    A = np.vstack([F, G])
    l = np.concatenate([-INF * np.ones(F.shape[0]), g])
    u = np.concatenate([b, g])
    return qp_mod.QPData(
        P=jnp.asarray(H), q=jnp.asarray(q), A=jnp.asarray(A),
        l=jnp.asarray(l), u=jnp.asarray(u),
    )


def _random_qp(rng, n=30, me=5, mi=20):
    M = rng.normal(size=(n, n))
    H = M.T @ M / n + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    G = rng.normal(size=(me, n))
    F = rng.normal(size=(mi, n))
    z0 = rng.normal(size=n) * 0.3
    g = G @ z0
    b = F @ z0 + np.abs(rng.normal(size=mi)) + 0.05  # strictly feasible point
    return H, q, G, g, F, b


def test_oracle_sanity_closed_form():
    # min ||z - c||^2 s.t. z >= 0  ->  z = max(c, 0)
    n = 8
    c = np.linspace(-2, 2, n)
    H = 2 * np.eye(n)
    q = -2 * c
    F = -np.eye(n)
    b = np.zeros(n)
    z, _, lam, ok = qp_ip.solve_qp(H, q, F=F, b=b)
    assert ok
    np.testing.assert_allclose(z, np.maximum(c, 0), atol=1e-8)
    # complementarity: lam > 0 only where constraint active
    np.testing.assert_allclose(lam[c > 0], 0, atol=1e-7)
    # stationarity with F = -I: 2 z + q - lam = 0, z = 0 on active rows
    np.testing.assert_allclose(lam[c < 0], q[c < 0], atol=1e-6)


def test_oracle_sanity_equality():
    # min 1/2 z'z s.t. sum(z) = 1 -> z = 1/n
    n = 6
    z, y, _, ok = qp_ip.solve_qp(np.eye(n), np.zeros(n), G=np.ones((1, n)), g=np.ones(1))
    assert ok
    np.testing.assert_allclose(z, np.ones(n) / n, atol=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_admm_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    H, q, G, g, F, b = _random_qp(rng)
    z_ref, y_ref, lam_ref, ok = qp_ip.solve_qp(H, q, G, g, F, b)
    assert ok
    sol = qp_mod.solve(_osqp_form(H, q, G, g, F, b), SolverConfig())
    assert bool(sol.solved)
    np.testing.assert_allclose(np.asarray(sol.x), z_ref, atol=5e-6)
    # duals: rows [F; G] -> [lam; y]
    np.testing.assert_allclose(np.asarray(sol.y[: F.shape[0]]), lam_ref, atol=5e-5)
    np.testing.assert_allclose(np.asarray(sol.y[F.shape[0]:]), y_ref, atol=5e-5)


def test_polish_gives_high_accuracy():
    rng = np.random.default_rng(3)
    H, q, G, g, F, b = _random_qp(rng)
    z_ref, *_ = qp_ip.solve_qp(H, q, G, g, F, b)
    sol = qp_mod.solve(_osqp_form(H, q, G, g, F, b), SolverConfig())
    assert bool(sol.polished)
    np.testing.assert_allclose(np.asarray(sol.x), z_ref, atol=1e-8)
    assert float(jnp.maximum(sol.pri_res, sol.dua_res)) < 1e-8


def test_batched_solve_matches_individual():
    rng = np.random.default_rng(4)
    probs = [_random_qp(rng) for _ in range(6)]
    batch = qp_mod.QPData(
        *(jnp.stack([_osqp_form(*p)[i] for p in probs]) for i in range(5))
    )
    out = jax.jit(lambda d: qp_mod.solve_batch(d, SolverConfig()))(batch)
    assert out.x.shape == (6, 30)
    for i, p in enumerate(probs):
        z_ref, *_ = qp_ip.solve_qp(*p)
        np.testing.assert_allclose(np.asarray(out.x[i]), z_ref, atol=5e-6)
    assert bool(out.solved.all())


def test_psd_only_cost():
    # P singular (zero rows) like the LMPC lambda block
    n = 10
    H = np.zeros((n, n))
    H[:5, :5] = np.eye(5)
    q = np.concatenate([np.full(5, -1.0), np.ones(5)])
    # simplex over the last 5 vars + box on first 5
    G = np.zeros((1, n)); G[0, 5:] = 1.0
    g = np.ones(1)
    F = np.vstack([np.eye(n), -np.eye(n)])
    b = np.concatenate([np.full(n, 2.0), np.full(n, 0.0)])  # 0 <= z <= 2
    z_ref, *_ , ok = qp_ip.solve_qp(H, q, G, g, F, b)
    assert ok
    sol = qp_mod.solve(_osqp_form(H, q, G, g, F, b), SolverConfig())
    assert bool(sol.solved)
    np.testing.assert_allclose(np.asarray(sol.x), z_ref, atol=1e-5)


def test_float32_mode_reasonable():
    rng = np.random.default_rng(5)
    H, q, G, g, F, b = _random_qp(rng, n=20, me=3, mi=12)
    data = _osqp_form(H, q, G, g, F, b)
    data32 = qp_mod.QPData(*(v.astype(jnp.float32) for v in data))
    z_ref, *_ = qp_ip.solve_qp(H, q, G, g, F, b)
    sol = qp_mod.solve(data32, SolverConfig(eps_abs=1e-4, eps_rel=1e-4))
    np.testing.assert_allclose(np.asarray(sol.x), z_ref, atol=2e-3)


def test_scaling_refresh_overrides_stale_cache():
    """scaling_refresh_every: the K-th warm solve re-equilibrates from
    scratch, so a corrupted/stale cached Ruiz scaling cannot poison it
    (ops/qp.FactorCache staleness guard, VERDICT round-2 item 9)."""
    rng = np.random.default_rng(6)
    H, q, G, g, F, b = _random_qp(rng)
    data = _osqp_form(H, q, G, g, F, b)
    n, m = data.P.shape[0], data.A.shape[0]
    z_ref, *_ = qp_ip.solve_qp(H, q, G, g, F, b)

    # deliberately WRONG cached scaling (valid=True so the warm path uses it)
    junk = qp_mod.FactorCache(
        kinv=jnp.zeros((n, n), data.P.dtype),
        D=jnp.asarray(rng.uniform(10.0, 100.0, n), data.P.dtype),
        E=jnp.asarray(rng.uniform(10.0, 100.0, m), data.P.dtype),
        c=jnp.asarray(37.0, data.P.dtype),
        valid=jnp.asarray(True),
        age=jnp.zeros((), jnp.int32),  # age % refresh_every == 0 -> refresh
    )
    cfg = SolverConfig(scaling_warm_iters=2, scaling_refresh_every=10)
    sol_refresh = qp_mod.solve(data, cfg, fac=junk)
    sol_cold = qp_mod.solve(data, cfg)

    # the refresh discards the junk init entirely: scaling == cold scaling
    np.testing.assert_allclose(np.asarray(sol_refresh.fac.D),
                               np.asarray(sol_cold.fac.D), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sol_refresh.x), z_ref, atol=5e-6)
    assert int(sol_refresh.fac.age) == 1  # solve count advances

    # off-schedule (age=1): only the 2 refinement sweeps run on the junk
    # init, so the resulting scaling differs from the cold one
    stale = junk._replace(age=jnp.ones((), jnp.int32))
    sol_stale = qp_mod.solve(data, cfg, fac=stale)
    assert not np.allclose(np.asarray(sol_stale.fac.D),
                           np.asarray(sol_cold.fac.D), rtol=1e-3)
