"""Sharded experiment on the 8-virtual-device CPU mesh (SURVEY §4.5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racinglmpc_tpu.parallel import make_mesh, scenario_sharding
from racinglmpc_tpu.runtime import experiment as exp
from racinglmpc_tpu.utils.config import LMPCConfig, SimConfig, SolverConfig


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_pid_stage_sharded_matches_unsharded():
    mesh = make_mesh()
    cfg = exp.ExperimentConfig(stage_steps=40, sim=SimConfig(noise=False),
                               pid_noise=False)
    r_sharded = exp.run_experiment(
        jax.random.PRNGKey(0), cfg, batch=16, stages="pid",
        dtype=jnp.float32, mesh=mesh,
    )
    r_plain = exp.run_experiment(
        jax.random.PRNGKey(0), cfg, batch=16, stages="pid",
        dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(r_sharded.pid.x), np.asarray(r_plain.pid.x),
        rtol=1e-6, atol=1e-6,
    )
    # the batched outputs really were sharded over the mesh
    shard_set = {s.device for s in r_sharded.pid.x.addressable_shards}
    assert len(shard_set) == 8


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_lmpc_lap_sharded_runs():
    mesh = make_mesh()
    cfg = exp.ExperimentConfig(
        stage_steps=450, n_lmpc_laps=1, lap_max_steps=500, lap_chunk=100,
        solver=SolverConfig.throughput(),
        lmpc=LMPCConfig(max_laps=6, max_pts=768, model_pts=512),
    )
    res = exp.run_experiment(
        jax.random.PRNGKey(0), cfg, batch=8, stages="pid,lmpc",
        dtype=jnp.float32, mesh=mesh,
    )
    assert np.all(res.lap_steps < 500)
