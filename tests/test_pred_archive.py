"""Per-step predicted-trajectory archive (SURVEY §5.5 debug mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from racinglmpc_tpu.controllers.pid import make_pid_controller
from racinglmpc_tpu.models import track as track_mod
from racinglmpc_tpu.models.dynamics import PlantState
from racinglmpc_tpu.runtime import loop as loop_mod
from racinglmpc_tpu.utils.config import SimConfig, VehicleParams
from racinglmpc_tpu.viz.plots import pred_to_global


def test_collect_fn_archives_controller_state():
    trk = track_mod.make_track()
    vp = VehicleParams()
    cfg = SimConfig(noise=False)
    step, ctrl0 = make_pid_controller(0.8, noise=False)

    # archive the applied input through a stateful wrapper: ctrl state = u
    def step_with_state(state, x, key):
        _, u = step((), x, key)
        return u, u

    x0 = jnp.asarray([0.5, 0, 0, 0, 0, 0.0])
    res = loop_mod.run_lap(
        step_with_state, jnp.zeros(2), PlantState(x0, x0),
        jax.random.PRNGKey(0), trk=trk, vp=vp, sim_cfg=cfg,
        max_steps=12, multi_lap=True,
        collect_fn=lambda st: st * 2.0,
    )
    assert res.collected.shape == (12, 2)
    np.testing.assert_allclose(
        np.asarray(res.collected), 2.0 * np.asarray(res.u), rtol=1e-6
    )


def test_pred_to_global_shapes():
    trk = track_mod.make_track()
    arch = np.zeros((5, 15, 6), np.float32)
    arch[..., 4] = np.linspace(0, 10, 15)[None, :]
    out = pred_to_global(trk, arch)
    assert out.shape == (5, 15, 2)
    assert np.all(np.isfinite(out))
