"""Run the four-stage racing experiment (reference src/main.py equivalent).

Usage:
  python examples/run_experiment.py [--laps N] [--batch B] [--stages pid,lti,ltv,lmpc]

Runs scenario-batched PID -> LTI-MPC -> LTV-MPC -> LMPC on the default
platform (TPU if available) and prints per-lap times.
"""
import argparse
import sys
import time

import jax
import numpy as np

from racinglmpc_tpu.runtime import experiment as exp
from racinglmpc_tpu.utils.config import LMPCConfig, SolverConfig


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--laps", type=int, default=8, help="LMPC laps")
    p.add_argument("--batch", type=int, default=4, help="scenario batch")
    p.add_argument("--stages", default="pid,lmpc")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--throughput", action="store_true",
                   help="use the fast solver config")
    args = p.parse_args(argv)

    solver = SolverConfig.throughput() if args.throughput else SolverConfig(max_iter=200)
    cfg = exp.ExperimentConfig(
        stage_steps=450,
        n_lmpc_laps=args.laps,
        lap_max_steps=500,
        lap_chunk=125,
        solver=solver,
        lmpc=LMPCConfig(max_laps=args.laps + 6, max_pts=1024, model_pts=512),
    )
    t0 = time.time()
    res = exp.run_experiment(
        jax.random.PRNGKey(args.seed), cfg, batch=args.batch,
        stages=args.stages, verbose=True,
    )
    print(f"wall: {time.time() - t0:.1f}s")
    if res.lap_times is not None:
        print("lap times [s] (rows=scenarios):")
        print(np.round(res.lap_times, 2))
        mono = np.all(np.diff(res.lap_times, axis=1) <= 0.5)
        print("lap times (approximately) non-increasing:", bool(mono))
        # guard against silent no-learning regressions (a controller stuck on
        # the PID fallback also produces flat, "non-increasing" lap times)
        if res.lap_times.shape[1] >= 3:
            gain = 1.0 - res.lap_times[:, -1] / res.lap_times[:, 0]
            print(f"improvement first->last lap: {np.round(100 * gain, 1)} %")
            if np.any(gain < 0.05):
                print("WARNING: <5% improvement — LMPC is not learning "
                      "(solver rejecting every step?)")
                return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
