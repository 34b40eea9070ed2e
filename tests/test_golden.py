"""Golden regression fixtures (SURVEY §4.3).

A small deterministic slice of the pipeline — PID rollout, LTI regression,
one LTV linearization, one assembled-and-solved MPC QP — is recorded as an
``.npz`` golden file (float64, CPU). The test regenerates the values and
asserts bit-stability within tight tolerances, catching silent semantic
drift in any layer. Regenerate with ``python tests/test_golden.py`` after an
*intentional* semantic change (the diff then documents the change).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from racinglmpc_tpu.controllers import mpc as mpc_mod
from racinglmpc_tpu.models import sysid, track as track_mod
from racinglmpc_tpu.runtime import experiment as exp
from racinglmpc_tpu.utils.config import (
    LMPCConfig,
    MPCConfig,
    SimConfig,
    SolverConfig,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pipeline_v1.npz")


def _compute():
    cfg = exp.ExperimentConfig(
        stage_steps=120,
        sim=SimConfig(noise=False),
        pid_noise=True,  # exploration noise on (deterministic PRNG stream)
    )
    res = exp.run_experiment(
        jax.random.PRNGKey(7), cfg, batch=1, stages="pid", dtype=jnp.float64
    )
    x_pid = np.asarray(res.pid.x[0])
    u_pid = np.asarray(res.pid.u[0])

    A, B, _ = sysid.lti_regression(res.pid.x[0], res.pid.u[0], 1e-7)

    trk = track_mod.make_track(dtype=jnp.float64)
    lcfg = LMPCConfig(model_laps=1, model_pts=128)
    store = sysid.add_lap(
        sysid.make_lap_store(1, 128, dtype=jnp.float64),
        res.pid.x[0], res.pid.u[0], res.pid.steps[0],
    )
    xq = res.pid.x[0, 60]
    uq = res.pid.u[0, 60]
    Al, Bl, Cl = sysid.local_linearization(store, trk, xq, uq, lcfg, 0.1)

    mcfg = MPCConfig()
    step, state0 = mpc_mod.make_lti_mpc(
        mcfg, A, B, SolverConfig(max_iter=500), dtype=jnp.float64
    )
    x0 = jnp.asarray([0.5, 0, 0, 0, 0, 0], jnp.float64)
    state1, u0 = step(state0, x0, None)

    return {
        "x_pid_head": x_pid[:20],
        "x_pid_tail": x_pid[-5:],
        "u_pid_head": u_pid[:20],
        "A_lti": np.asarray(A),
        "B_lti": np.asarray(B),
        "A_local": np.asarray(Al),
        "B_local": np.asarray(Bl),
        "C_local": np.asarray(Cl),
        "mpc_u0": np.asarray(u0),
        "mpc_x_pred": np.asarray(state1.x_pred),
    }


def test_pipeline_matches_golden():
    assert os.path.exists(GOLDEN), (
        "golden file missing — generate with `python tests/test_golden.py`"
    )
    got = _compute()
    with np.load(GOLDEN) as z:
        for k in z.files:
            np.testing.assert_allclose(
                got[k], z[k], rtol=1e-9, atol=1e-11,
                err_msg=f"golden mismatch in {k!r}",
            )
    assert set(got) == set(np.load(GOLDEN).files)


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez(GOLDEN, **_compute())
    print(f"wrote {GOLDEN}")
