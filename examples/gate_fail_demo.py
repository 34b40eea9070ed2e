"""Prove the bench quality gate catches the round-3 regression class.

Round-4 verdict item 2 ("Done = ... the gate provably fails when fed the
round-3 preset"): the round-3 throughput preset — the current one with the
rho-escalation rescue stage disabled (`rescue_max_iter=0`) — passed every
transient-lap check while silently degrading CONVERGED laps via late-lap
rejection bursts. This script runs bench.quality_gate (both phases,
including the converged-regime phase seeded from the committed fixture)
once with the production preset and once with the round-3 preset, and
exits nonzero unless the production preset PASSES and the round-3 preset
FAILS.

Run ON TPU:  python examples/gate_fail_demo.py [--out F.json]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from racinglmpc_tpu.models import track as track_mod  # noqa: E402
from racinglmpc_tpu.runtime import experiment as exp  # noqa: E402
from racinglmpc_tpu.utils.config import (  # noqa: E402
    LMPCConfig,
    SimConfig,
    SolverConfig,
    VehicleParams,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    trk = track_mod.make_track()
    vp = VehicleParams()
    key = jax.random.PRNGKey(0)

    def make_cfg(solver):
        return exp.ExperimentConfig(
            stage_steps=450, solver=solver,
            sim=SimConfig(use_pallas_rollout=on_tpu),
            lmpc=LMPCConfig(max_laps=12, max_pts=1024, model_pts=512,
                            use_pallas_sysid=on_tpu))

    cfg0 = make_cfg(SolverConfig.throughput())
    pid = exp.run_experiment(key, cfg0, batch=1, stages="pid")
    seeds = (pid.pid.x[0], pid.pid.u[0], pid.pid.x_glob[0], pid.pid.steps[0])

    results = {}
    for name, solver in (
            ("production", SolverConfig.throughput()),
            ("round3_no_rescue", dataclasses.replace(
                SolverConfig.throughput(), rescue_max_iter=0)),
    ):
        print(f"[gate_demo] running gate on {name}...", file=sys.stderr,
              flush=True)
        q = bench.quality_gate(
            make_cfg(solver), trk, vp, *seeds,
            jax.random.fold_in(key, 99),
            log=lambda *a: print(*a, file=sys.stderr, flush=True))
        results[name] = q
        print(f"[gate_demo] {name}: pass={q['pass']}", file=sys.stderr)

    ok = results["production"]["pass"] and not results["round3_no_rescue"]["pass"]
    rec = {"metric": "quality_gate_discrimination_demo",
           "production_pass": results["production"]["pass"],
           "round3_no_rescue_pass": results["round3_no_rescue"]["pass"],
           "gate_discriminates": bool(ok),
           "details": results}
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
