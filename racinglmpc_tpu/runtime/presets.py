"""Runnable benchmark presets: the five BASELINE.json configurations.

Each preset is an :class:`ExperimentConfig` + (batch, stages) matching one
row of ``BASELINE.json``'s ``configs`` list; ``run_preset`` executes it and
returns summary metrics. Config 5 (multi-host) additionally shards the
scenario batch over the available device mesh.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict

import jax
import numpy as np

from racinglmpc_tpu.runtime import experiment as exp
from racinglmpc_tpu.utils.config import LMPCConfig, SimConfig, SolverConfig

PRESETS: Dict[str, dict] = {
    # "Lap-1 PID path following, single vehicle, oval track"
    "config1_pid": dict(
        stages="pid", batch=1,
        cfg=exp.ExperimentConfig(stage_steps=1000),
    ),
    # "LTI-MPC path following, horizon N=14, single track, batch 64"
    "config2_lti": dict(
        stages="pid,lti", batch=64,
        cfg=exp.ExperimentConfig(stage_steps=450,
                                 solver=SolverConfig.throughput()),
    ),
    # "LTV-MPC with on-device local regression sys-ID, batch 256"
    "config3_ltv": dict(
        stages="pid,ltv", batch=256,
        cfg=exp.ExperimentConfig(stage_steps=450,
                                 solver=SolverConfig.throughput()),
    ),
    # "LMPC with safe set from 10 laps, convex-hull terminal set, batch 1k"
    # lap_chunk sized so one dispatch stays ~10 s: the TPU runtime (axon
    # tunnel) kills executions past ~25-40 s wall ("TPU worker crashed /
    # kernel fault"), and a batch-1024 LMPC step is ~0.3-0.5 s.
    "config4_lmpc": dict(
        stages="pid,lmpc", batch=1024,
        cfg=exp.ExperimentConfig(
            stage_steps=450, n_lmpc_laps=10, lap_max_steps=500,
            lap_chunk=25, solver=SolverConfig.throughput(),
            lmpc=LMPCConfig(max_laps=16, max_pts=1024, model_pts=512,
                            use_pallas_sysid=True),
        ),
    ),
    # "Full multi-lap LMPC (30+ laps, growing SS) x 4k variants, >=2 hosts"
    # Sized to fit ONE v5e chip at the full 4k batch: lap_chunk 8 keeps a
    # ~1-2 s/step dispatch under the execution watchdog; max_pts 1024 >=
    # stage_steps (450, the PID seed lap) + lap_max_steps (500 addPoint
    # appends during the following lap), so no append is silently dropped
    # by add_point's capacity guard (the reference always appends);
    # store_glob off drops the viz-only SS_glob mirror (40% of the safe
    # set); offload_laps keeps the 30-lap trajectory archive (~3.5 GB) on
    # the host; the between-laps state updates donate their buffers
    # (experiment.py). Without these, the ~8 GB controller state OOMs
    # during seeding — or shard the scenario axis over the >=2-host mesh
    # BASELINE prescribes (run_experiment(mesh=...)).
    "config5_lmpc_4k": dict(
        stages="pid,lmpc", batch=4096,
        cfg=exp.ExperimentConfig(
            stage_steps=450, n_lmpc_laps=30, lap_max_steps=500,
            lap_chunk=10, solver=SolverConfig.throughput(),
            offload_laps=True,
            lmpc=LMPCConfig(max_laps=36, max_pts=1024, model_pts=512,
                            store_glob=False, use_pallas_sysid=True),
        ),
    ),
}


def run_preset(name: str, seed: int = 0, scale_batch: float = 1.0,
               n_laps: int | None = None, verbose: bool = False,
               checkpoint_dir: str | None = None,
               resume: bool = False) -> dict:
    """Run one preset; returns {wall_s, batch, lap_times?, steps/s...}.

    ``scale_batch``/``n_laps`` let smoke tests shrink a preset without
    changing its structure. ``checkpoint_dir``/``resume`` make the long
    presets restartable across TPU-runtime wedges (config5 is hours of
    wall; a hung tunnel mid-run should cost laps, not the whole run).
    """
    p = PRESETS[name]
    cfg = p["cfg"]
    if n_laps is not None and "lmpc" in p["stages"]:
        cfg = dataclasses.replace(cfg, n_lmpc_laps=n_laps)
    batch = max(int(p["batch"] * scale_batch), 1)
    t0 = time.time()
    res = exp.run_experiment(
        jax.random.PRNGKey(seed), cfg, batch=batch, stages=p["stages"],
        verbose=verbose, checkpoint_dir=checkpoint_dir,
        checkpoint_every=2, resume=resume,
    )
    wall = time.time() - t0
    out = {"preset": name, "batch": batch, "wall_s": round(wall, 2)}
    if res.resume_lap:
        # resumed run: lap_steps/lap_times below cover the WHOLE experiment
        # (restored from the checkpoint's meta sidecar), but wall_s and the
        # steps/s rate cover only the laps executed by THIS process run
        out["resumed_from_lap"] = int(res.resume_lap)
    if res.lap_times is not None:
        out["mean_lap_times_s"] = np.round(res.lap_times.mean(0), 2).tolist()
        out["laps_completed"] = int(
            (res.lap_steps < cfg.lap_max_steps).all(axis=1).sum()
        )
        # rate = steps executed by THIS run / this run's wall (on resume the
        # restored laps are excluded from both numerator and denominator)
        exec_steps = int(res.lap_steps[:, res.resume_lap:].sum())
        if exec_steps:
            out["lmpc_steps_per_s"] = round(exec_steps / wall, 1)
        if res.lap_wall_s is not None and len(res.lap_wall_s):
            # TRUE batched-step wall latency: one control step for the whole
            # batch (lap wall / steps that lap), percentiles across laps —
            # not the per-scenario amortized number
            from racinglmpc_tpu.runtime.metrics import latency_report

            # executed batched steps per lap = whole chunks until the last
            # scenario crossed (host early-exit granularity)
            ch = cfg.lap_chunk
            max_steps = res.lap_steps.max(axis=0)[-len(res.lap_wall_s):]
            executed = np.ceil(np.maximum(max_steps, 1) / ch) * ch
            per_step = res.lap_wall_s / executed
            # lap 0's wall includes the one-time jit trace+compile of the
            # lap runner; with 10-30 laps it would dominate p99/max
            if len(per_step) > 1:
                per_step = per_step[1:]
            out["batched_step_latency"] = latency_report(per_step)
    return out
