"""Headline benchmark: batched LMPC control-step throughput on one chip.

Measures FULL LMPC control steps — safe-set terminal selection, local
weighted-LS system-ID at all N=14 horizon points, FTOCP assembly, the
batched ADMM+polish QP solve (one 200-var QP per step per scenario), and the
safe-set addPoint update — for a scenario batch, as steps (= QP solves) per
second per chip.

Baseline: the reference solves ONE such problem per step on CPU in
~20-25 ms => ~40-50 solves/s (SURVEY §6, measured); the BASELINE.json north
star is >= 1000 batched solves/s/chip at N=14. ``vs_baseline`` is reported
against the 45 solves/s reference midpoint.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from racinglmpc_tpu.controllers import lmpc as lmpc_mod
from racinglmpc_tpu.models import track as track_mod
from racinglmpc_tpu.models.dynamics import PlantState, plant_step
from racinglmpc_tpu.runtime import experiment as exp
from racinglmpc_tpu.utils.config import (
    LMPCConfig,
    SimConfig,
    SolverConfig,
    VehicleParams,
)

BASELINE_SOLVES_PER_S = 45.0  # reference single-problem CPU (SURVEY §6)


def main(batch: int = 256, steps: int = 50, reps: int = 3,
         verbose: bool = False, pallas_rollout: bool = True) -> dict:
    log = (lambda *a: print(*a, file=sys.stderr)) if verbose else (lambda *a: None)
    cfg = exp.ExperimentConfig(
        stage_steps=450,
        solver=SolverConfig.throughput(),
        sim=SimConfig(use_pallas_rollout=pallas_rollout),
        lmpc=LMPCConfig(max_laps=12, max_pts=1024, model_pts=512),
    )
    trk = track_mod.make_track()
    vp = VehicleParams()
    L = trk.total_len
    key = jax.random.PRNGKey(0)

    # seed data: one real noisy PID stage, shared across the batch
    log("running PID seed stage...")
    pid = exp.run_experiment(key, cfg, batch=1, stages="pid")
    x_seed = pid.pid.x[0]
    u_seed = pid.pid.u[0]
    xg_seed = pid.pid.x_glob[0]
    steps_seed = pid.pid.steps[0]

    def seed_one(_):
        st = lmpc_mod.init_lmpc_state(cfg.lmpc)
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
                # fused VMEM-resident rollout for the whole batch
                from racinglmpc_tpu.ops.pallas_rollout import plant_step_batch

                nx, nxg = plant_step_batch(
                    plant.x, plant.x_glob, u, vp, trk, cfg.sim
                )
                if cfg.sim.noise:
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
            body, (state, plant), jnp.arange(steps)
        )
        return state, plant

    log("compiling + warmup chunk...")
    t0 = time.time()
    state, plant = run_chunk(state, plant, jax.random.fold_in(key, 1))
    jax.block_until_ready(plant.x)
    log(f"warmup (incl. compile): {time.time() - t0:.1f}s")

    times = []
    for r in range(reps):
        t0 = time.time()
        state, plant = run_chunk(state, plant, jax.random.fold_in(key, 2 + r))
        jax.block_until_ready(plant.x)
        times.append(time.time() - t0)
        log(f"rep {r}: {times[-1]:.3f}s -> "
            f"{batch * steps / times[-1]:.0f} solves/s")

    best = min(times)
    solves_per_s = batch * steps / best
    result = {
        "metric": "lmpc_full_step_qp_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s (N=14, full control step incl. sys-ID)",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    verbose = "-v" in sys.argv
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 256
    main(batch=batch, verbose=verbose,
         pallas_rollout="--no-pallas-rollout" not in sys.argv)
