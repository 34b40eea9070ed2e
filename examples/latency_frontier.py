"""True batched-step latency vs batch size (VERDICT round-2 item 7).

One control step for the WHOLE scenario batch is the unit of latency that
the 10 Hz budget (BASELINE.json: p99 < 100 ms) applies to — not the
per-scenario amortized figure. This measures it directly: the bench.py step
(full LMPC control step incl. sys-ID + Pallas ADMM solve + fused rollout)
is dispatched in small steady-state chunks and each dispatch is timed;
per-step latency samples = dispatch wall / steps-in-dispatch.

Output: one JSON object with a row per batch size — p50/p99/max step
latency, solves/s, and the within-100ms flag — written to
``BENCH_latency_frontier.json`` at the repo root. This is the table that
replaces any blanket "p99 < 100 ms" claim: the budget holds only where the
flag says so; beyond that batch, scale out over the mesh.

Chunk sizes are capped so one dispatch stays well under the TPU runtime's
~25-40 s execution watchdog (BASELINE.md).

Usage: python examples/latency_frontier.py [--batches 64,256,512,1024,2048]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from racinglmpc_tpu.controllers import lmpc as lmpc_mod
from racinglmpc_tpu.models import track as track_mod
from racinglmpc_tpu.models.dynamics import PlantState, plant_step
from racinglmpc_tpu.runtime import experiment as exp
from racinglmpc_tpu.runtime.metrics import latency_report
from racinglmpc_tpu.utils.config import (
    LMPCConfig,
    SimConfig,
    SolverConfig,
    VehicleParams,
)


def measure_batch(batch: int, chunk_steps: int, n_chunks: int,
                  pid_seed, trk, vp, on_tpu: bool,
                  preset: str = "throughput") -> dict:
    cfg = exp.ExperimentConfig(
        stage_steps=450,
        solver=getattr(SolverConfig, preset)(),
        sim=SimConfig(use_pallas_rollout=on_tpu),
        lmpc=LMPCConfig(max_laps=12, max_pts=1024, model_pts=512,
                        use_pallas_sysid=on_tpu,
                        store_glob=batch < 2048),
    )
    L = trk.total_len
    x_seed, u_seed, xg_seed, steps_seed = pid_seed

    def seed_one(_):
        st = lmpc_mod.init_lmpc_state(cfg.lmpc, solver=cfg.solver)
        for _ in range(cfg.lmpc.num_ss_it):
            st = lmpc_mod.lmpc_add_trajectory(
                st, cfg.lmpc, x_seed, u_seed, xg_seed, steps_seed, L
            )
        return st

    state = jax.jit(jax.vmap(seed_one))(jnp.arange(batch))
    step = lmpc_mod.make_lmpc(cfg.lmpc, trk, cfg.solver, cfg.sim.dt)
    x0 = jnp.tile(jnp.asarray([0.5, 0, 0, 0, 0, 0], jnp.float32), (batch, 1))
    plant = PlantState(x=x0, x_glob=x0)

    @jax.jit
    def run_chunk(state, plant, key):
        def body(carry, t):
            state, plant = carry
            k = jax.random.fold_in(key, t)
            kc, kp = jax.random.split(k)
            kcs = jax.random.split(kc, state.time_step.shape[0])
            kps = jax.random.split(kp, state.time_step.shape[0])
            state, u = jax.vmap(step)(state, plant.x, kcs)
            if cfg.sim.use_pallas_rollout:
                from racinglmpc_tpu.ops.pallas_rollout import plant_step_batch

                nx, nxg = plant_step_batch(
                    plant.x, plant.x_glob, u, vp, trk, cfg.sim
                )
                sig = jnp.asarray(cfg.sim.noise_sigma, dtype=nx.dtype)
                raw = jax.vmap(
                    lambda kk: jax.random.normal(kk, (3,), dtype=nx.dtype)
                )(kps) * sig
                nx = nx.at[:, :3].add(cfg.sim.noise_gain * jnp.clip(
                    raw, -cfg.sim.noise_clip, cfg.sim.noise_clip))
                plant = PlantState(x=nx, x_glob=nxg)
            else:
                plant = jax.vmap(
                    lambda pl, uu, kk: plant_step(pl, uu, vp, trk, cfg.sim, kk)
                )(plant, u, kps)
            return (state, plant), None

        (state, plant), _ = jax.lax.scan(
            body, (state, plant), jnp.arange(chunk_steps)
        )
        return state, plant

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, plant = run_chunk(state, plant, jax.random.fold_in(key, 0))
    jax.block_until_ready(plant.x)
    print(f"  batch {batch}: warmup+compile {time.time()-t0:.1f}s",
          file=sys.stderr)

    samples = []
    for r in range(n_chunks):
        t0 = time.time()
        state, plant = run_chunk(state, plant, jax.random.fold_in(key, 1 + r))
        jax.block_until_ready(plant.x)
        samples.append((time.time() - t0) / chunk_steps)
        print(f"  batch {batch} chunk {r}: {samples[-1]*1e3:.1f} ms/step",
              file=sys.stderr)

    rep = latency_report(np.asarray(samples))
    rep.update(
        batch=batch,
        chunk_steps=chunk_steps,
        solves_per_s=round(batch / min(samples), 1),
    )
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,256,512,1024,2048")
    ap.add_argument("--preset", default="throughput",
                    choices=["throughput", "throughput_max"])
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    on_tpu = jax.default_backend() == "tpu"
    trk = track_mod.make_track()
    vp = VehicleParams()
    cfg0 = exp.ExperimentConfig(stage_steps=450)
    pid = exp.run_experiment(jax.random.PRNGKey(0), cfg0, batch=1, stages="pid")
    pid_seed = (pid.pid.x[0], pid.pid.u[0], pid.pid.x_glob[0],
                pid.pid.steps[0])

    # throwaway measurement: the FIRST timed dispatch sequence in a fresh
    # process can read ~0 through the axon tunnel regardless of true cost
    # (first-measurement artifact, BASELINE.md round-5 notes; one bogus
    # 24.8M-solves/s row shipped before this guard)
    measure_batch(batches[0], 25 if batches[0] <= 1024 else 10, 1,
                  pid_seed, trk, vp, on_tpu, preset=args.preset)

    rows = []
    for b in batches:
        # keep one dispatch well under the ~25-40 s execution watchdog
        chunk = 25 if b <= 1024 else 10
        rows.append(measure_batch(b, chunk, args.chunks, pid_seed, trk, vp,
                                  on_tpu, preset=args.preset))

    out = {
        "metric": "true_batched_step_latency_vs_batch",
        "preset": args.preset,
        "budget_ms": 100.0,
        "device": jax.devices()[0].platform,
        "rows": rows,
        "largest_batch_within_budget_p99": max(
            [r["batch"] for r in rows if r["within_budget_p99"]], default=0
        ),
    }
    path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_latency_frontier.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
