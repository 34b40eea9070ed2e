"""Checkpoint round-trip + metrics summaries."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racinglmpc_tpu.controllers import lmpc as lmpc_mod
from racinglmpc_tpu.runtime import checkpoint, metrics
from racinglmpc_tpu.utils.config import LMPCConfig


def _small_state(batch=2):
    cfg = LMPCConfig(max_laps=4, max_pts=64, model_pts=32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(40, 6)), dtype=jnp.float32)
    u = jnp.asarray(rng.normal(size=(40, 2)), dtype=jnp.float32)

    def build(i):
        st = lmpc_mod.init_lmpc_state(cfg)
        st = lmpc_mod.lmpc_add_trajectory(
            st, cfg, x * (1.0 + i), u, x, jnp.int32(40), 19.23
        )
        return st

    return cfg, jax.vmap(build)(jnp.arange(batch, dtype=jnp.float32))


def test_checkpoint_roundtrip(tmp_path):
    cfg, state = _small_state()
    key = jax.random.PRNGKey(123)
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, state, key, lap=7, meta={"note": "test"})

    _, template = _small_state()
    restored, key2, lap = checkpoint.load(path, template)
    assert lap == 7
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(key)), np.asarray(jax.random.key_data(key2))
    )
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_mismatch_raises(tmp_path):
    cfg, state = _small_state(batch=2)
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, state, jax.random.PRNGKey(0), lap=0)
    _, template3 = _small_state(batch=3)
    try:
        checkpoint.load(path, template3)
        assert False, "expected shape mismatch"
    except ValueError:
        pass


def test_metrics_summary_and_latency():
    m = metrics.StepMetrics(
        feasible=jnp.asarray([True, True, False, True]),
        pri_res=jnp.asarray([1e-4, 2e-4, 5e-2, 1e-4]),
        dua_res=jnp.asarray([1e-3, 1e-3, 1.0, 2e-3]),
        iters=jnp.asarray([50, 100, 200, 50]),
        lap_progress=jnp.asarray([1.0, 2.0, 3.0, 4.0]),
    )
    s = metrics.summarize(m)
    assert abs(s["feasible_rate"] - 0.75) < 1e-9
    assert s["s_mean"] == 2.5

    lat = metrics.latency_report(np.asarray([0.01, 0.02, 0.015, 0.05]))
    assert lat["within_budget_p99"]
    lat2 = metrics.latency_report(np.full(100, 0.2))
    assert not lat2["within_budget_p99"]


def test_lmpc_state_carries_solver_diagnostics():
    cfg, state = _small_state()
    assert state.pri_res.shape == (2,)
    assert state.iters.dtype == jnp.int32


@pytest.mark.slow
def test_experiment_checkpoint_resume_identical(tmp_path):
    """Interrupt at lap 2 of 4, resume, and get bit-identical laps 2-3
    (VERDICT round-1 item 7 / SURVEY §5.4)."""
    from racinglmpc_tpu.runtime import experiment as exp
    from racinglmpc_tpu.utils.config import LMPCConfig, SolverConfig

    cfg4 = exp.ExperimentConfig(
        stage_steps=450, n_lmpc_laps=4, lap_max_steps=400, lap_chunk=100,
        solver=SolverConfig.throughput(),
        lmpc=LMPCConfig(max_laps=8, max_pts=1024, model_pts=512),
    )
    cfg2 = dataclasses.replace(cfg4, n_lmpc_laps=2)
    key = jax.random.PRNGKey(3)

    full = exp.run_experiment(key, cfg4, batch=2, stages="pid,lmpc",
                              dtype=jnp.float32)

    # "interrupted" run: 2 laps with checkpointing ...
    ckpt = str(tmp_path / "ck")
    exp.run_experiment(key, cfg2, batch=2, stages="pid,lmpc",
                       dtype=jnp.float32, checkpoint_dir=ckpt)
    # ... resumed to the full 4 laps
    res = exp.run_experiment(key, cfg4, batch=2, stages="pid,lmpc",
                             dtype=jnp.float32, checkpoint_dir=ckpt,
                             resume=True)

    # the resumed run executes laps 2..3 but reports the WHOLE experiment
    # (laps 0..1 restored from the checkpoint's meta sidecar), bit-identical
    # to the uninterrupted run
    assert res.resume_lap == 2
    assert res.lap_steps.shape == (2, 4)
    np.testing.assert_array_equal(res.lap_steps, full.lap_steps)
    np.testing.assert_array_equal(res.lap_times, full.lap_times)
    # per-lap trajectories only exist for the laps this run executed
    assert len(res.lmpc_laps) == 2
    for sr_resumed, sr_full in zip(res.lmpc_laps, full.lmpc_laps[2:]):
        np.testing.assert_array_equal(np.asarray(sr_resumed.x),
                                      np.asarray(sr_full.x))
        np.testing.assert_array_equal(np.asarray(sr_resumed.u),
                                      np.asarray(sr_full.u))


def test_resume_of_completed_run_is_a_noop(tmp_path):
    """Re-invoking with resume=True after the final lap was checkpointed
    executes nothing but still reports the full restored lap record (the
    pattern a preemptible-job wrapper produces)."""
    from racinglmpc_tpu.runtime import experiment as exp
    from racinglmpc_tpu.utils.config import LMPCConfig, SolverConfig

    cfg = exp.ExperimentConfig(
        stage_steps=450, n_lmpc_laps=2, lap_max_steps=400, lap_chunk=100,
        solver=SolverConfig.throughput(),
        lmpc=LMPCConfig(max_laps=8, max_pts=1024, model_pts=512),
    )
    key = jax.random.PRNGKey(3)
    ckpt = str(tmp_path / "ck")
    first = exp.run_experiment(key, cfg, batch=2, stages="pid,lmpc",
                               dtype=jnp.float32, checkpoint_dir=ckpt)
    res = exp.run_experiment(key, cfg, batch=2, stages="pid,lmpc",
                             dtype=jnp.float32, checkpoint_dir=ckpt,
                             resume=True)
    assert res.resume_lap == 2 and len(res.lmpc_laps) == 0
    np.testing.assert_array_equal(res.lap_steps, first.lap_steps)
    np.testing.assert_array_equal(res.lap_times, first.lap_times)
    assert res.lmpc_state is not None


def test_resume_with_different_seed_is_rejected(tmp_path):
    """The checkpointed PRNG key is compared on resume: a different seed
    would silently break the bit-exact-resume guarantee."""
    import pytest

    from racinglmpc_tpu.runtime import experiment as exp
    from racinglmpc_tpu.utils.config import LMPCConfig, SolverConfig

    cfg = exp.ExperimentConfig(
        stage_steps=450, n_lmpc_laps=2, lap_max_steps=400, lap_chunk=100,
        solver=SolverConfig.throughput(),
        lmpc=LMPCConfig(max_laps=8, max_pts=1024, model_pts=512),
    )
    ckpt = str(tmp_path / "ck")
    exp.run_experiment(jax.random.PRNGKey(3), cfg, batch=2,
                       stages="pid,lmpc", dtype=jnp.float32,
                       checkpoint_dir=ckpt, checkpoint_every=2)
    with pytest.raises(ValueError, match="resume key mismatch"):
        exp.run_experiment(jax.random.PRNGKey(4), cfg, batch=2,
                           stages="pid,lmpc", dtype=jnp.float32,
                           checkpoint_dir=ckpt, resume=True)
