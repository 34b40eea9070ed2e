"""Pallas rollout kernel (interpret mode on CPU) vs the XLA plant path."""
import jax
import jax.numpy as jnp
import numpy as np

from racinglmpc_tpu.models import track as track_mod
from racinglmpc_tpu.models.dynamics import PlantState, plant_step
from racinglmpc_tpu.ops import pallas_rollout
from racinglmpc_tpu.utils.config import SimConfig, VehicleParams


def test_pallas_rollout_matches_xla_plant():
    rng = np.random.default_rng(3)
    B = 5
    trk = track_mod.make_track(dtype=jnp.float32)
    vp = VehicleParams()
    cfg = SimConfig(noise=False, substeps=100)

    x = rng.normal(scale=0.1, size=(B, 6)).astype(np.float32)
    x[:, 0] += 0.8
    x[:, 4] = rng.uniform(0, 19, B)
    xg = x.copy()
    u = rng.normal(scale=0.2, size=(B, 2)).astype(np.float32)

    ox, oxg = pallas_rollout.plant_step_batch(
        jnp.asarray(x), jnp.asarray(xg), jnp.asarray(u), vp, trk, cfg,
        interpret=True,
    )

    ref = jax.vmap(
        lambda xi, xgi, ui: plant_step(
            PlantState(x=xi, x_glob=xgi), ui, vp, trk, cfg, None
        )
    )(jnp.asarray(x), jnp.asarray(xg), jnp.asarray(u))

    np.testing.assert_allclose(np.asarray(ox), np.asarray(ref.x),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(oxg), np.asarray(ref.x_glob),
                               rtol=2e-5, atol=2e-5)


def test_run_lap_fused_matches_vmapped_runner():
    """The batch-level fused runner (product path for use_pallas_rollout)
    reproduces vmap(run_lap): same step counts, same noise stream, states
    within the kernel's float32 tolerance."""
    from racinglmpc_tpu.controllers.pid import make_pid_controller
    from racinglmpc_tpu.runtime.loop import run_lap_batch, run_lap_fused

    trk = track_mod.make_track(dtype=jnp.float32)
    vp = VehicleParams()
    cfg = SimConfig(noise=True, pallas_interpret=True)
    B, T = 4, 60
    step, _ = make_pid_controller(vt=0.8, noise=True)
    x0 = np.zeros((B, 6), np.float32)
    x0[:, 0] = [0.4, 0.5, 0.6, 0.8]
    plants = PlantState(x=jnp.asarray(x0), x_glob=jnp.asarray(x0))
    keys = jax.random.split(jax.random.PRNGKey(11), B)
    ctrl0 = jnp.zeros((B, 0))

    ref = run_lap_batch(step, ctrl0, plants, keys, trk=trk, vp=vp,
                        sim_cfg=cfg, max_steps=T)
    fused = run_lap_fused(step, ctrl0, plants, keys, trk=trk, vp=vp,
                          sim_cfg=cfg, max_steps=T)

    np.testing.assert_array_equal(np.asarray(fused.steps),
                                  np.asarray(ref.steps))
    np.testing.assert_array_equal(np.asarray(fused.mask), np.asarray(ref.mask))
    np.testing.assert_allclose(np.asarray(fused.x), np.asarray(ref.x),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(fused.u), np.asarray(ref.u),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(fused.x_final.x),
                               np.asarray(ref.x_final.x),
                               rtol=2e-4, atol=2e-4)


def test_pallas_rollout_wraps_s_past_track_length():
    trk = track_mod.make_track(dtype=jnp.float32)
    vp = VehicleParams()
    cfg = SimConfig(noise=False, substeps=50)
    L = float(trk.total_len)
    x = np.zeros((1, 6), np.float32)
    x[0, 0] = 0.8
    x[0, 4] = L + 0.5  # past the line: curvature lookup must wrap
    xg = x.copy()
    u = np.zeros((1, 2), np.float32)
    ox, _ = pallas_rollout.plant_step_batch(
        jnp.asarray(x), jnp.asarray(xg), jnp.asarray(u), vp, trk, cfg,
        interpret=True,
    )
    ref = jax.vmap(
        lambda xi, xgi, ui: plant_step(
            PlantState(x=xi, x_glob=xgi), ui, vp, trk, cfg, None
        )
    )(jnp.asarray(x), jnp.asarray(xg), jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(ox), np.asarray(ref.x),
                               rtol=2e-5, atol=2e-5)
