"""Pallas ADMM kernel (interpret mode) vs the XLA solver path."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from racinglmpc_tpu.ops import qp as qp_mod
from racinglmpc_tpu.utils.config import SolverConfig

RNG = np.random.default_rng(9)


def _random_qp(n=30, me=6, mi=20):
    M = RNG.normal(size=(n, n))
    P = (M.T @ M / n + 0.5 * np.eye(n)).astype(np.float32)
    q = RNG.normal(size=n).astype(np.float32)
    G = RNG.normal(size=(me, n))
    F = RNG.normal(size=(mi, n))
    z0 = RNG.normal(size=n) * 0.3
    g = G @ z0
    b = F @ z0 + np.abs(RNG.normal(size=mi)) + 0.1
    A = np.vstack([F, G]).astype(np.float32)
    l = np.concatenate([-np.inf * np.ones(mi), g]).astype(np.float32)
    u = np.concatenate([b, g]).astype(np.float32)
    return qp_mod.QPData(*map(jnp.asarray, (P, q, A, l, u)))


def test_pallas_path_matches_xla_path():
    base = SolverConfig(max_iter=200, polish=False, adaptive_rho=False,
                        eps_abs=1e-4, eps_rel=1e-4)
    cfg_x = dataclasses.replace(base, use_pallas=False)
    cfg_p = dataclasses.replace(base, use_pallas=True, pallas_interpret=True)
    for _ in range(3):
        qp = _random_qp()
        sx = qp_mod.solve(qp, cfg_x)
        sp = qp_mod.solve(qp, cfg_p)
        assert bool(sp.solved), (float(sp.pri_res), float(sp.dua_res))
        # both converge to the same solution within solver tolerance
        np.testing.assert_allclose(
            np.asarray(sp.x), np.asarray(sx.x), rtol=5e-3, atol=5e-3
        )
        assert float(sp.pri_res) < 1e-3
        assert float(sp.dua_res) < 1e-2


def test_pallas_path_batched_vmap_block1_exact():
    """With scenario tiling off (block=1) a batched solve is per-problem
    identical to single solves (same grid-program math)."""
    base = SolverConfig(max_iter=200, polish=False, adaptive_rho=False,
                        eps_abs=1e-4, eps_rel=1e-4,
                        use_pallas=True, pallas_interpret=True,
                        pallas_block=1)
    qps = [_random_qp() for _ in range(4)]
    batched = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *qps)
    sol = jax.vmap(lambda p: qp_mod.solve(p, base))(batched)
    assert bool(jnp.all(sol.solved))
    # per-problem early exit: iteration counts may differ across the batch
    for i, qp in enumerate(qps):
        s1 = qp_mod.solve(qp, base)
        np.testing.assert_allclose(
            np.asarray(sol.x[i]), np.asarray(s1.x), rtol=1e-4, atol=1e-5
        )


def test_pallas_path_batched_vmap_tiled():
    """Scenario-tiled batched solve (incl. the non-divisible-batch padding
    path): each problem agrees with its single solve to solver tolerance.
    Tiling can flip chunk-quantized iteration counts (1e-7-level dot-order
    noise near the residual threshold), so agreement is at tolerance level,
    not bitwise."""
    base = SolverConfig(max_iter=200, polish=False, adaptive_rho=False,
                        eps_abs=1e-4, eps_rel=1e-4,
                        use_pallas=True, pallas_interpret=True,
                        pallas_block=4)
    qps = [_random_qp() for _ in range(5)]   # 5 % 4 != 0: pads with dummies
    batched = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *qps)
    sol = jax.vmap(lambda p: qp_mod.solve(p, base))(batched)
    assert bool(jnp.all(sol.solved))
    for i, qp in enumerate(qps):
        s1 = qp_mod.solve(qp, base)
        np.testing.assert_allclose(
            np.asarray(sol.x[i]), np.asarray(s1.x), rtol=2e-3, atol=2e-3
        )


def test_pallas_warm_start_reuses_cache():
    base = SolverConfig(max_iter=200, polish=False, adaptive_rho=False,
                        eps_abs=1e-4, eps_rel=1e-4,
                        use_pallas=True, pallas_interpret=True)
    qp = _random_qp()
    s1 = qp_mod.solve(qp, base)
    assert bool(s1.fac.valid)
    s2 = qp_mod.solve(qp, base, warm=(s1.x, s1.y), fac=s1.fac)
    assert bool(s2.solved)
    # warm resolve converges to the same solution (iteration counts near the
    # float32 tolerance floor are noisy, so no count assertion)
    np.testing.assert_allclose(
        np.asarray(s2.x), np.asarray(s1.x), rtol=5e-3, atol=5e-4
    )
