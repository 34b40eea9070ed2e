"""Solver-parameter sweep on the headline bench workload (VERDICT round-2
items 3/5: rank iteration-count vs per-iteration-cost levers with data).

Measures full-LMPC-step throughput (same workload as bench.py: batch-256
seeded safe set, 50-step chunks) for a list of SolverConfig overrides, in ONE
process so the seed stage is paid once. Each variant starts from an identical
deep-copied warm state so results are comparable.

Usage:
    python examples/sweep_solver.py --variants '[{"alpha": 1.7}, ...]'
    python examples/sweep_solver.py            # built-in default grid

Prints one JSON line per variant:
    {"variant": {...}, "solves_per_s": N, "iters_mean": N, "iters_p50": N,
     "iters_p99": N, "unconverged": N}
``unconverged`` (solves that missed tolerance — state.feasible False — but
may still have been accepted, summed over measured steps) is the cheap
in-sweep quality guard; real quality gating is examples/solver_quality.py
on the winner. (Round-5 note: this column was previously labelled
"rejects"; it always counted unconverged solves.)
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from racinglmpc_tpu.controllers import lmpc as lmpc_mod
from racinglmpc_tpu.models import track as track_mod
from racinglmpc_tpu.models.dynamics import PlantState
from racinglmpc_tpu.runtime import experiment as exp
from racinglmpc_tpu.utils.config import (
    LMPCConfig,
    SimConfig,
    SolverConfig,
    VehicleParams,
)

DEFAULT_GRID = [
    {},                              # throughput() baseline
    {"alpha": 1.7},
    {"alpha": 1.8},
    {"rho": 0.2},
    {"rho": 0.05},
    {"rho_eq_scale": 1e2},
    {"rho_eq_scale": 1e4},
    {"check_every": 15},
    {"pallas_iter_precision": "high"},
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--warm-chunks", type=int, default=1)
    ap.add_argument("--variants", default=None,
                    help="JSON list of SolverConfig field overrides")
    args = ap.parse_args()
    variants = json.loads(args.variants) if args.variants else DEFAULT_GRID
    B, steps = args.batch, args.steps

    on_tpu = jax.default_backend() == "tpu"
    base_cfg = exp.ExperimentConfig(
        stage_steps=450,
        solver=SolverConfig.throughput(),
        sim=SimConfig(use_pallas_rollout=on_tpu),
        lmpc=LMPCConfig(max_laps=12, max_pts=1024, model_pts=512,
                        use_pallas_sysid=on_tpu),
    )
    trk = track_mod.make_track()
    vp = VehicleParams()
    L = trk.total_len
    key = jax.random.PRNGKey(0)

    print("[sweep] PID seed stage...", file=sys.stderr, flush=True)
    pid = exp.run_experiment(key, base_cfg, batch=1, stages="pid")
    xs, us, xgs, st_n = (pid.pid.x[0], pid.pid.u[0], pid.pid.x_glob[0],
                         pid.pid.steps[0])

    def seed_one(_):
        s = lmpc_mod.init_lmpc_state(base_cfg.lmpc)
        for _ in range(base_cfg.lmpc.num_ss_it):
            s = lmpc_mod.lmpc_add_trajectory(s, base_cfg.lmpc, xs, us, xgs,
                                             st_n, L)
        return s

    state0 = jax.jit(jax.vmap(seed_one))(jnp.arange(B))
    x0 = jnp.tile(jnp.asarray([0.5, 0, 0, 0, 0, 0], jnp.float32), (B, 1))
    plant0 = PlantState(x=x0, x_glob=x0)
    # materialize on host once so every variant starts from identical state
    state0 = jax.device_get(state0)
    plant0 = jax.device_get(plant0)

    from racinglmpc_tpu.ops.pallas_rollout import plant_step_batch
    from racinglmpc_tpu.models.dynamics import plant_step

    for var in variants:
        scfg = dataclasses.replace(SolverConfig.throughput(), **var)
        step = lmpc_mod.make_lmpc(base_cfg.lmpc, trk, scfg, base_cfg.sim.dt)

        @jax.jit
        def run_chunk(state, plant, key, _step=step):
            def body(carry, t):
                state, plant = carry
                k = jax.random.fold_in(key, t)
                kc, kp = jax.random.split(k)
                kcs = jax.random.split(kc, B)
                kps = jax.random.split(kp, B)
                state, u = jax.vmap(_step)(state, plant.x, kcs)
                if base_cfg.sim.use_pallas_rollout:
                    nx, nxg = plant_step_batch(
                        plant.x, plant.x_glob, u, vp, trk, base_cfg.sim)
                    sig = jnp.asarray(base_cfg.sim.noise_sigma, nx.dtype)
                    raw = jax.vmap(
                        lambda kk: jax.random.normal(kk, (3,), dtype=nx.dtype)
                    )(kps) * sig
                    nx = nx.at[:, :3].add(base_cfg.sim.noise_gain * jnp.clip(
                        raw, -base_cfg.sim.noise_clip,
                        base_cfg.sim.noise_clip))
                    plant = PlantState(x=nx, x_glob=nxg)
                else:
                    plant = jax.vmap(
                        lambda pl, uu, kk: plant_step(pl, uu, vp, trk,
                                                      base_cfg.sim, kk)
                    )(plant, u, kps)
                return (state, plant), (state.iters, state.feasible)

            (state, plant), (iters, feas) = jax.lax.scan(
                body, (state, plant), jnp.arange(steps))
            return state, plant, iters, feas

        state = jax.tree_util.tree_map(jnp.asarray, state0)
        plant = jax.tree_util.tree_map(jnp.asarray, plant0)
        t0 = time.time()
        for w in range(args.warm_chunks):
            state, plant, _, _ = run_chunk(state, plant,
                                           jax.random.fold_in(key, 1 + w))
        jax.block_until_ready(plant.x)
        print(f"[sweep] {var}: warmup(+compile) {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)

        times, iters_all, rej = [], [], 0
        for r in range(args.reps):
            t0 = time.time()
            state, plant, iters, feas = run_chunk(
                state, plant, jax.random.fold_in(key, 100 + r))
            jax.block_until_ready(plant.x)
            times.append(time.time() - t0)
            iters_all.append(np.asarray(iters).ravel())
            rej += int((~np.asarray(feas)).sum())

        best = min(times)
        it = np.concatenate(iters_all)
        rec = {
            "variant": var,
            "solves_per_s": round(B * steps / best, 1),
            "iters_mean": round(float(it.mean()), 1),
            "iters_p50": int(np.percentile(it, 50)),
            "iters_p99": int(np.percentile(it, 99)),
            "unconverged": rej,
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
