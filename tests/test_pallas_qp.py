"""Pallas ADMM kernel (interpret mode) vs the XLA solver path."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from racinglmpc_tpu.ops import qp as qp_mod
from racinglmpc_tpu.utils.config import SolverConfig

RNG = np.random.default_rng(9)


def _random_qp(n=30, me=6, mi=20, rng=None):
    rng = RNG if rng is None else rng
    M = rng.normal(size=(n, n))
    P = (M.T @ M / n + 0.5 * np.eye(n)).astype(np.float32)
    q = rng.normal(size=n).astype(np.float32)
    G = rng.normal(size=(me, n))
    F = rng.normal(size=(mi, n))
    z0 = rng.normal(size=n) * 0.3
    g = G @ z0
    b = F @ z0 + np.abs(rng.normal(size=mi)) + 0.1
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


def test_pallas_path_batched_vmap():
    """A batched (vmapped) solve is per-problem identical to single solves:
    vmap turns the batch into a Pallas grid of independent programs."""
    base = SolverConfig(max_iter=200, polish=False, adaptive_rho=False,
                        eps_abs=1e-4, eps_rel=1e-4,
                        use_pallas=True, pallas_interpret=True)
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


def test_pallas_path_batched_under_nested_jit():
    """Regression shape for the custom_vmap dispatch bug (see the module
    docstring of ops/pallas_qp.py): jit(vmap(jit(solve))) must produce the
    same per-problem results as plain solves. The TPU miscompile that
    motivated this is invisible in interpret mode, but the shape is kept in
    the suite so any future dispatch rework exercises it."""
    base = SolverConfig(max_iter=200, polish=False, adaptive_rho=False,
                        eps_abs=1e-4, eps_rel=1e-4,
                        use_pallas=True, pallas_interpret=True)

    @jax.jit
    def one(p):
        return qp_mod.solve(p, base)

    rng = np.random.default_rng(3)  # own stream: order-independent problems
    qps = [_random_qp(rng=rng) for _ in range(3)]
    batched = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *qps)
    sol = jax.jit(jax.vmap(one))(batched)
    # the corruption mode returned unwritten buffers: NaN residuals, iters=0
    assert bool(jnp.all(sol.solved))
    assert bool(jnp.all(jnp.isfinite(sol.x))) and bool(jnp.all(sol.iters > 0))
    # self-consistency (not path comparison: two valid iterate paths can
    # drift near active-set boundaries): each solution satisfies its QP's
    # optimality conditions when re-checked outside the solver.
    for i, qp in enumerate(qps):
        x = np.asarray(sol.x[i], np.float64)
        y = np.asarray(sol.y[i], np.float64)
        P, q, A, l, u = (np.asarray(a, np.float64) for a in qp)
        Ax = A @ x
        assert np.max(np.clip(Ax - u, 0, None) + np.clip(l - Ax, 0, None)) < 1e-3
        assert np.max(np.abs(P @ x + q + A.T @ y)) < 5e-2


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


def test_fused_ns_path_matches_unfused():
    """admm_iterate_fused (K build + Newton-Schulz + ADMM in one kernel)
    solves to the same solution as the split path and returns a usable
    refreshed KKT inverse (cold build AND warm refresh)."""
    base = SolverConfig(max_iter=200, polish=False, adaptive_rho=False,
                        eps_abs=1e-4, eps_rel=1e-4,
                        use_pallas=True, pallas_interpret=True)
    cfg_f = dataclasses.replace(base, pallas_fused_ns=True)
    qp = _random_qp()
    s0 = qp_mod.solve(qp, base)

    # cold solve (fac absent -> in-kernel Jacobi-init NS build)
    sf = qp_mod.solve(qp, cfg_f)
    assert bool(sf.solved)
    np.testing.assert_allclose(
        np.asarray(sf.x), np.asarray(s0.x), rtol=5e-3, atol=5e-3)
    # the kernel-refreshed inverse actually inverts the scaled KKT
    assert bool(sf.fac.valid)

    # warm resolve through the cache (in-kernel warm NS refresh)
    s2 = qp_mod.solve(qp, cfg_f, warm=(sf.x, sf.y), fac=sf.fac)
    assert bool(s2.solved)
    np.testing.assert_allclose(
        np.asarray(s2.x), np.asarray(sf.x), rtol=5e-3, atol=5e-4)
    # warm start at the solution: the entry check exits immediately
    assert int(s2.iters) == 0


def test_fused_ns_batched_vmap():
    base = SolverConfig(max_iter=200, polish=False, adaptive_rho=False,
                        eps_abs=3e-4, eps_rel=3e-4, use_pallas=True,
                        pallas_interpret=True, pallas_fused_ns=True)
    rng = np.random.default_rng(11)  # own stream: order-independent problems
    qps = [_random_qp(rng=rng) for _ in range(4)]
    batched = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *qps)
    sol = jax.vmap(lambda p: qp_mod.solve(p, base))(batched)
    assert bool(jnp.all(sol.solved))
    # the batch is a Pallas grid of independent programs: per-problem
    # identical to single solves (including iteration counts)
    for i, qp in enumerate(qps):
        s1 = qp_mod.solve(qp, base)
        assert int(sol.iters[i]) == int(s1.iters)
        np.testing.assert_allclose(
            np.asarray(sol.x[i]), np.asarray(s1.x), rtol=1e-4, atol=1e-5)


def _hard_rho_qp(rng=None):
    """A QP + settings where the MAIN loop's rho is far too small to reach
    primal feasibility within the budget — the regime of the late-lap
    rejection bursts (round 4): the rescue stage must save it."""
    qp = _random_qp(rng=rng)
    base = SolverConfig(
        max_iter=40, polish=False, adaptive_rho=False,
        rho=1e-4, rho_eq_scale=1.0, warmup_iters=10, check_every=10,
        scaling_iters=0, eps_abs=1e-4, eps_rel=1e-4,
    )
    return qp, base


def test_rescue_fixes_low_rho_pallas():
    """In-kernel rho-escalation rescue (interpret mode): a solve the
    controller would reject (pri >= accept_pri_res) is converted into an
    accepted, oracle-accurate one; a control QP that does not need rescue
    is untouched (identical to rescue-off)."""
    from tests.oracles import qp_ip

    qp, base = _hard_rho_qp(np.random.default_rng(3))
    off = dataclasses.replace(base, use_pallas=True, pallas_interpret=True)
    on = dataclasses.replace(off, rescue_max_iter=400, rescue_rho_scale=100.0)

    s_off = qp_mod.solve(qp, off)
    assert float(s_off.pri_res) > off.accept_pri_res  # reproduces the reject

    s_on = qp_mod.solve(qp, on)
    assert float(s_on.pri_res) < on.rescue_exit

    l, u = np.asarray(qp.l, np.float64), np.asarray(qp.u, np.float64)
    A = np.asarray(qp.A, np.float64)
    eq = np.isfinite(l)
    z, _, _, conv = qp_ip.solve_qp(
        np.asarray(qp.P, np.float64), np.asarray(qp.q, np.float64),
        G=A[eq], g=u[eq], F=A[~eq], b=u[~eq],
    )
    assert conv
    np.testing.assert_allclose(np.asarray(s_on.x), z, rtol=2e-2, atol=2e-2)

    # an easy QP (healthy rho) must not trigger the rescue: bit-identical
    easy = _random_qp(rng=np.random.default_rng(4))
    e_on = dataclasses.replace(
        SolverConfig(max_iter=200, polish=False, adaptive_rho=False,
                     use_pallas=True, pallas_interpret=True),
        rescue_max_iter=400)
    e_off = dataclasses.replace(e_on, rescue_max_iter=0)
    s1, s0 = qp_mod.solve(easy, e_on), qp_mod.solve(easy, e_off)
    np.testing.assert_array_equal(np.asarray(s1.x), np.asarray(s0.x))
    assert int(s1.iters) == int(s0.iters)


def test_rescue_fixes_low_rho_xla():
    """Same rescue semantics on the XLA (non-Pallas) path, incl. batched."""
    qp, base = _hard_rho_qp(np.random.default_rng(5))
    off = dataclasses.replace(base, use_pallas=False)
    on = dataclasses.replace(off, rescue_max_iter=400, rescue_rho_scale=100.0)
    s_off = qp_mod.solve(qp, off)
    assert float(s_off.pri_res) > off.accept_pri_res
    s_on = qp_mod.solve(qp, on)
    assert float(s_on.pri_res) < on.rescue_exit

    # batched (vmapped, lockstep loops): per-lane results identical to the
    # solo solves, and an accepted lane must come out accepted
    qp2 = _random_qp(rng=np.random.default_rng(6))
    batched = jax.tree_util.tree_map(lambda *a: jnp.stack(a), qp, qp2)
    sol = jax.vmap(lambda p: qp_mod.solve(p, on))(batched)
    s2 = qp_mod.solve(qp2, on)
    assert float(sol.pri_res[0]) < on.accept_pri_res
    assert float(sol.pri_res[1]) < on.accept_pri_res
    np.testing.assert_allclose(
        np.asarray(sol.x[1]), np.asarray(s2.x), rtol=1e-4, atol=1e-4
    )

    # a healthy-rho config must leave no-trigger solves bit-identical
    e_on = dataclasses.replace(
        SolverConfig(max_iter=200, polish=False, adaptive_rho=False,
                     use_pallas=False), rescue_max_iter=400)
    e_off = dataclasses.replace(e_on, rescue_max_iter=0)
    s1, s0 = qp_mod.solve(qp2, e_on), qp_mod.solve(qp2, e_off)
    np.testing.assert_allclose(
        np.asarray(s1.x), np.asarray(s0.x), rtol=1e-6, atol=1e-6
    )
