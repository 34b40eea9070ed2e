"""Fused Pallas sys-ID kernel (interpret mode) vs the XLA path.

Same oracle strategy as tests/test_pallas_qp.py: the XLA implementation
(models/sysid.py, itself parity-tested against the reference semantics in
tests/test_sysid.py) is the ground truth; the kernel must reproduce its
A/B/C local models on realistic lap stores, including ragged laps, empty
slots, and off-track query states.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from racinglmpc_tpu.models import sysid, track as track_mod
from racinglmpc_tpu.ops import pallas_sysid
from racinglmpc_tpu.utils.config import LMPCConfig

T = 128  # model_pts (multiple of 128)
CFG = LMPCConfig(model_laps=4, model_pts=T)
TRK = track_mod.make_track()


def _store(lap_lengths, seed=0):
    rng = np.random.default_rng(seed)
    st = sysid.make_lap_store(CFG.model_laps, T, dtype=jnp.float32)
    for steps in lap_lengths:
        x = np.zeros((steps, 6), np.float32)
        x[:, 0] = 1.0 + 0.5 * rng.standard_normal(steps)      # vx
        x[:, 1] = 0.1 * rng.standard_normal(steps)            # vy
        x[:, 2] = 0.3 * rng.standard_normal(steps)            # wz
        x[:, 3] = 0.1 * rng.standard_normal(steps)            # epsi
        x[:, 4] = np.linspace(0, 19.0, steps)                 # s
        x[:, 5] = 0.2 * rng.standard_normal(steps)            # ey
        u = 0.3 * rng.standard_normal((steps, 2)).astype(np.float32)
        st = sysid.add_lap(st, jnp.asarray(x), jnp.asarray(u),
                           jnp.int32(steps))
    return st


def _queries(n, seed=1):
    rng = np.random.default_rng(seed)
    x = np.zeros((n, 6), np.float32)
    x[:, 0] = 1.0 + 0.3 * rng.standard_normal(n)
    x[:, 1] = 0.1 * rng.standard_normal(n)
    x[:, 2] = 0.2 * rng.standard_normal(n)
    x[:, 3] = 0.1 * rng.standard_normal(n)
    x[:, 4] = np.linspace(0.5, 21.0, n)   # crosses the wrap at L=19.23
    x[:, 5] = 0.2 * rng.standard_normal(n)
    u = 0.3 * rng.standard_normal((n, 2)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(u)


def _compare(st, x_lin, u_lin, atol=2e-4):
    A0, B0, C0 = sysid.local_linearization_horizon(st, TRK, x_lin, u_lin, CFG)
    A1, B1, C1 = pallas_sysid.local_linearization_horizon(
        st, TRK, x_lin, u_lin, CFG, interpret=True
    )
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A0),
                               rtol=1e-3, atol=atol)
    np.testing.assert_allclose(np.asarray(B1), np.asarray(B0),
                               rtol=1e-3, atol=atol)
    np.testing.assert_allclose(np.asarray(C1), np.asarray(C0),
                               rtol=1e-3, atol=atol)


def test_matches_xla_path_full_store():
    st = _store([100, 90, 110, 80])
    x_lin, u_lin = _queries(14)
    _compare(st, x_lin, u_lin)


def test_matches_xla_path_ragged_and_empty_laps():
    # two empty slots + laps shorter than capacity
    st = _store([60, 25])
    x_lin, u_lin = _queries(14, seed=3)
    _compare(st, x_lin, u_lin)


def test_empty_store_gives_kinematics_only():
    st = sysid.make_lap_store(CFG.model_laps, T, dtype=jnp.float32)
    x_lin, u_lin = _queries(14, seed=4)
    A1, B1, C1 = pallas_sysid.local_linearization_horizon(
        st, TRK, x_lin, u_lin, CFG, interpret=True
    )
    # velocity rows have no data: A/B/C rows 0..2 are zero (ridge-only WLS)
    assert np.allclose(np.asarray(A1)[:, :3, :], 0.0)
    assert np.allclose(np.asarray(B1)[:, :3, :], 0.0)
    assert np.allclose(np.asarray(C1)[:, :3], 0.0)
    # kinematic rows still match the XLA path
    A0, B0, C0 = sysid.local_linearization_horizon(st, TRK, x_lin, u_lin, CFG)
    np.testing.assert_allclose(np.asarray(A1)[:, 3:, :],
                               np.asarray(A0)[:, 3:, :], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(C1)[:, 3:],
                               np.asarray(C0)[:, 3:], rtol=1e-3, atol=1e-4)


def test_vmapped_over_scenarios():
    """vmap over a scenario batch (the product-path shape: grid dispatch)."""
    sts = [_store([100, 90, 110, 80], seed=s) for s in range(3)]
    st_b = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *sts)
    x_lin, u_lin = _queries(14, seed=5)

    f = jax.vmap(lambda st: pallas_sysid.local_linearization_horizon(
        st, TRK, x_lin, u_lin, CFG, interpret=True))
    A1, B1, C1 = jax.jit(f)(st_b)
    for i, st in enumerate(sts):
        A0, B0, C0 = sysid.local_linearization_horizon(
            st, TRK, x_lin, u_lin, CFG)
        np.testing.assert_allclose(np.asarray(A1[i]), np.asarray(A0),
                                   rtol=1e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(C1[i]), np.asarray(C0),
                                   rtol=1e-3, atol=2e-4)


def test_lmpc_step_with_pallas_sysid_matches():
    """make_lmpc with use_pallas_sysid produces the same control as the XLA
    sys-ID on one step (same store, same state)."""
    from racinglmpc_tpu.controllers import lmpc as lmpc_mod
    from racinglmpc_tpu.utils.config import SolverConfig

    cfg = dataclasses.replace(
        CFG, max_laps=6, max_pts=256, N=14,
    )
    rng = np.random.default_rng(7)
    steps = 100
    x = np.zeros((steps, 6), np.float32)
    x[:, 0] = 1.0
    x[:, 4] = np.linspace(0, 19.3, steps)
    x[:, 5] = 0.05 * rng.standard_normal(steps)
    u = 0.1 * rng.standard_normal((steps, 2)).astype(np.float32)

    def build(c):
        st = lmpc_mod.init_lmpc_state(c, dtype=jnp.float32)
        for _ in range(c.num_ss_it):
            st = lmpc_mod.lmpc_add_trajectory(
                st, c, jnp.asarray(x), jnp.asarray(u), jnp.asarray(x),
                jnp.int32(steps), TRK.total_len,
            )
        return st

    scfg = SolverConfig(max_iter=100, polish=False, adaptive_rho=False)
    x0 = jnp.asarray(x[1], jnp.float32)
    outs = []
    for pallas in (False, True):
        c = dataclasses.replace(cfg, use_pallas_sysid=pallas,
                                sysid_interpret=True)
        step = lmpc_mod.make_lmpc(c, TRK, scfg, 0.1, dtype=jnp.float32)
        st2, uu = step(build(c), x0, jax.random.PRNGKey(0))
        outs.append((np.asarray(uu), np.asarray(st2.pri_res)))
    np.testing.assert_allclose(outs[1][0], outs[0][0], rtol=1e-3, atol=1e-3)
