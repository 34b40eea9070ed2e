"""Closed-loop PID lap: completes, matches the NumPy oracle loop step-for-step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racinglmpc_tpu.controllers.pid import make_pid_controller
from racinglmpc_tpu.models import track as T
from racinglmpc_tpu.models.dynamics import PlantState
from racinglmpc_tpu.runtime.loop import run_lap, run_lap_batch
from racinglmpc_tpu.utils.config import SimConfig, VehicleParams

from tests.oracles import ref_plant


@pytest.fixture(scope="module")
def trk():
    return T.make_track(dtype=jnp.float64)


VP = VehicleParams()
CFG = SimConfig(noise=False)
X0 = jnp.asarray([0.5, 0, 0, 0, 0, 0], dtype=jnp.float64)


def _plant0(x0=X0):
    return PlantState(x=x0, x_glob=x0.at[3:].set(0.0))


def test_pid_lap_completes_and_matches_oracle(trk):
    step, cs0 = make_pid_controller(vt=0.8, noise=False)
    res = run_lap(step, cs0, _plant0(), jax.random.PRNGKey(0),
                  trk=trk, vp=VP, sim_cfg=CFG, max_steps=420)
    steps = int(res.steps)
    assert 250 <= steps <= 400

    curv_fn = ref_plant.np_curvature_fn(trk)
    xs_ref, us_ref, steps_ref, xF_ref = ref_plant.closed_loop_lap(
        np.asarray(X0), curv_fn, float(trk.total_len), max_steps=420)
    assert steps == steps_ref
    np.testing.assert_allclose(np.asarray(res.x[:steps]), xs_ref, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.u[:steps]), us_ref, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.x_final.x), xF_ref, atol=1e-7)
    # crossing state wrapped into [0, L)
    assert 0.0 <= float(res.x_final.x[4]) < float(trk.total_len)
    # mask is a prefix
    m = np.asarray(res.mask)
    assert m[:steps].all() and not m[steps:].any()


def test_multi_lap_runs_full_horizon(trk):
    step, cs0 = make_pid_controller(vt=0.8, noise=False)
    res = run_lap(step, cs0, _plant0(), jax.random.PRNGKey(0),
                  trk=trk, vp=VP, sim_cfg=CFG, max_steps=700, multi_lap=True)
    assert int(res.steps) == 700
    # s grows monotonically past one track length (no reset)
    s = np.asarray(res.x[:, 4])
    assert s[-1] > float(trk.total_len)
    assert (np.diff(s) > 0).all()


def test_batched_lap_matches_single(trk):
    step, cs0 = make_pid_controller(vt=0.8, noise=False)
    vx0 = jnp.asarray([0.4, 0.5, 0.6, 0.8], dtype=jnp.float64)
    x0 = jnp.zeros((4, 6), dtype=jnp.float64).at[:, 0].set(vx0)
    plants = PlantState(x=x0, x_glob=x0)
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    batch = run_lap_batch(step, (), plants, keys,
                          trk=trk, vp=VP, sim_cfg=CFG, max_steps=420)
    single = run_lap(step, (), PlantState(x=x0[1], x_glob=x0[1]), keys[1],
                     trk=trk, vp=VP, sim_cfg=CFG, max_steps=420)
    assert int(batch.steps[1]) == int(single.steps)
    np.testing.assert_allclose(np.asarray(batch.x[1]), np.asarray(single.x), atol=0)
