"""Viz smoke tests (headless Agg backend): figures build without error."""
import matplotlib

matplotlib.use("Agg")

import numpy as np

from racinglmpc_tpu.models import track as track_mod
from racinglmpc_tpu.viz import (
    animate_states,
    animate_xy,
    plot_closed_loop,
    plot_lap_times,
    plot_track,
    plot_trajectory,
)


def _fake_lap(T=50):
    rng = np.random.default_rng(0)
    x = rng.normal(scale=0.1, size=(T, 6))
    x[:, 0] += 0.8
    u = rng.normal(scale=0.1, size=(T, 2))
    xg = x.copy()
    xg[:, 4] = np.linspace(0, 2.0, T)
    xg[:, 5] = 0.1 * np.sin(np.linspace(0, 6, T))
    return x, u, xg


def test_track_and_trajectory_plots():
    trk = track_mod.make_track()
    _, _, xg = _fake_lap()
    ax = plot_trajectory(trk, xg, label="lap")
    assert len(ax.lines) >= 4  # 3 track lines + trajectory


def test_closed_loop_panels():
    x, u, _ = _fake_lap()
    fig = plot_closed_loop(x, u)
    assert len(fig.axes) == 7


def test_lap_times_plot():
    ax = plot_lap_times(np.asarray([[20.0, 16.0, 14.0], [21.0, 17.0, 15.0]]))
    assert len(ax.lines) == 2


def test_animation_gif(tmp_path):
    trk = track_mod.make_track()
    _, _, xg = _fake_lap(T=12)
    gif = str(tmp_path / "lap.gif")
    animate_xy(trk, xg, gif_path=gif, stride=4)
    import os
    assert os.path.getsize(gif) > 0


def test_animate_states_gif(tmp_path):
    """animation_states equivalent (the reference's is dead code): per-state
    panels + XY view with the predicted horizon overlaid."""
    trk = track_mod.make_track()
    x, u, xg = _fake_lap(T=12)
    # fake per-step predicted-horizon archives (T, N+1, 6) / (T, N, 2)
    x_pred = np.repeat(x[:, None, :], 5, axis=1)
    u_pred = np.repeat(u[:, None, :], 4, axis=1)
    gif = str(tmp_path / "states.gif")
    anim = animate_states(trk, x, u, xg, x_pred_archive=x_pred,
                          u_pred_archive=u_pred, gif_path=gif, stride=4)
    assert anim is not None
    import os
    assert os.path.getsize(gif) > 0
