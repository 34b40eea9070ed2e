from racinglmpc_tpu.viz.plots import (  # noqa: F401
    animate_states,
    animate_xy,
    plot_closed_loop,
    plot_lap_times,
    plot_track,
    plot_trajectory,
)
