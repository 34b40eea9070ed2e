"""Run a short experiment and save the full visualization set.

Usage: python examples/make_plots.py [--outdir /tmp/rlmpc_plots] [--laps N]

Produces (reference plot.py equivalents):
  track_trajectory.png   - track + final-lap XY path
  closed_loop.png        - 7-panel state/input time series of the last lap
  lap_times.png          - LMPC learning curve
  lap.gif                - animated lap playback
"""
import argparse
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import jax  # noqa: E402
import numpy as np  # noqa: E402

from racinglmpc_tpu.models import track as track_mod  # noqa: E402
from racinglmpc_tpu.runtime import experiment as exp  # noqa: E402
from racinglmpc_tpu.utils.config import LMPCConfig, SolverConfig  # noqa: E402
from racinglmpc_tpu.viz import (  # noqa: E402
    animate_xy,
    plot_closed_loop,
    plot_lap_times,
    plot_trajectory,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="/tmp/rlmpc_plots")
    p.add_argument("--laps", type=int, default=6)
    args = p.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    cfg = exp.ExperimentConfig(
        stage_steps=450, n_lmpc_laps=args.laps, lap_max_steps=500,
        lap_chunk=125, solver=SolverConfig.throughput(),
        lmpc=LMPCConfig(max_laps=args.laps + 6, max_pts=1024, model_pts=512),
    )
    res = exp.run_experiment(
        jax.random.PRNGKey(0), cfg, batch=1, stages="pid,lmpc", verbose=True
    )
    trk = track_mod.make_track()
    last = res.lmpc_laps[-1]
    xg = np.asarray(last.x_glob[0])
    mask = np.asarray(last.mask[0])

    ax = plot_trajectory(trk, xg, mask=mask, label=f"lap {args.laps}")
    ax.figure.savefig(os.path.join(args.outdir, "track_trajectory.png"),
                      dpi=120, bbox_inches="tight")
    plt.close(ax.figure)

    fig = plot_closed_loop(np.asarray(last.x[0]), np.asarray(last.u[0]),
                           mask=mask)
    fig.savefig(os.path.join(args.outdir, "closed_loop.png"),
                dpi=110, bbox_inches="tight")
    plt.close(fig)

    ax = plot_lap_times(res.lap_times)
    ax.figure.savefig(os.path.join(args.outdir, "lap_times.png"),
                      dpi=120, bbox_inches="tight")
    plt.close(ax.figure)

    animate_xy(trk, xg, mask=mask,
               gif_path=os.path.join(args.outdir, "lap.gif"), stride=3)
    print("wrote plots to", args.outdir)
    print("lap times:", np.round(res.lap_times[0], 2))


if __name__ == "__main__":
    main()
