"""config5 memory probe (round-4 verdict item 5).

Round 4 recorded an unexplained OOM regression: batch 2048 fit in round 3
but OOMed in round 4 ("suspected remote HBM residue" — a guess, not a
diagnosis). The axon tunnel exposes no ``memory_stats()`` (returns None),
so this probe does two things it CAN do:

1. ANALYTIC: exact per-scenario controller-state bytes by field (the safe
   set dominates; the kinv cache is dropped when the structured KKT path is
   on), plus the per-step transient estimate (assembly + scaled problem +
   K/Kinv + kernel buffers).
2. EMPIRICAL: a descending batch ladder; for each batch, seed the config5
   LMPC state and run a 10-step chunk. Reports the largest batch that
   completes and the full RESOURCE_EXHAUSTED message (requested/available
   bytes) of the first failure — committed evidence instead of a guess.

Writes one JSON artifact. Usage:
    python examples/probe_memory.py [--ladder 4096,3072,2560,2048,1792]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from racinglmpc_tpu.controllers import lmpc as lmpc_mod  # noqa: E402
from racinglmpc_tpu.models.dynamics import PlantState  # noqa: E402
from racinglmpc_tpu.models import track as track_mod  # noqa: E402
from racinglmpc_tpu.runtime import experiment as exp  # noqa: E402
from racinglmpc_tpu.runtime.presets import PRESETS  # noqa: E402
from racinglmpc_tpu.utils.config import VehicleParams  # noqa: E402


def state_bytes(cfg, solver):
    st = jax.eval_shape(
        lambda: lmpc_mod.init_lmpc_state(cfg.lmpc, solver=solver))
    per_field = {}
    for name, leafish in st._asdict().items():
        n = sum(int(np.prod(l.shape)) * l.dtype.itemsize
                for l in jax.tree_util.tree_leaves(leafish))
        per_field[name] = n
    return per_field


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ladder", default="4096,3072,2560,2048,1792")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--single", type=int, default=None,
                    help="internal: probe ONE batch size in this process "
                         "and print a row (the ladder spawns one subprocess "
                         "per rung — a failed rung leaks device buffers and "
                         "compiled executables into the same process, which "
                         "was measured to OOM every later rung)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    p = PRESETS["config5_lmpc_4k"]
    cfg = p["cfg"]
    trk = track_mod.make_track()
    vp = VehicleParams()
    L = trk.total_len
    key = jax.random.PRNGKey(0)

    per_field = state_bytes(cfg, cfg.solver)
    per_scen = sum(per_field.values())
    rec = {
        "metric": "config5_memory_probe",
        "state_bytes_per_scenario": per_scen,
        "state_mb_per_scenario": round(per_scen / 2**20, 3),
        "state_fields_kb": {k: round(v / 1024, 1)
                            for k, v in sorted(per_field.items(),
                                               key=lambda kv: -kv[1])},
        "with_kinv_dropped": not any(
            k == "fac" and v > 100_000 for k, v in per_field.items()),
        "ladder": [],
    }
    for b in (1792, 2048, 4096):
        rec[f"state_gb_at_{b}"] = round(per_scen * b / 2**30, 2)
    print(json.dumps({k: v for k, v in rec.items() if k != "ladder"},
                     indent=1), file=sys.stderr)

    if args.single is None:
        # ladder mode: one SUBPROCESS per rung (fresh TPU client each time)
        import subprocess
        for b in [int(x) for x in args.ladder.split(",")]:
            child = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--single", str(b), "--steps", str(args.steps)],
                capture_output=True, text=True, timeout=1800)
            row = None
            for line in child.stdout.splitlines():
                line = line.strip()
                if line.startswith("{") and '"batch"' in line:
                    row = json.loads(line)
            if row is None:
                row = {"batch": b, "ok": False,
                       "error": (child.stderr or "no output")[-600:]}
            print(json.dumps(row), file=sys.stderr, flush=True)
            rec["ladder"].append(row)
            if row.get("ok"):
                break  # largest fitting batch found
        print(json.dumps(rec))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(rec, f, indent=1)
        return

    print("[probe] PID seed stage...", file=sys.stderr, flush=True)
    pid = exp.run_experiment(key, cfg, batch=1, stages="pid")
    xs, us, xgs, st_n = (pid.pid.x[0], pid.pid.u[0], pid.pid.x_glob[0],
                        pid.pid.steps[0])
    step = lmpc_mod.make_lmpc(cfg.lmpc, trk, cfg.solver, cfg.sim.dt)

    for b in [args.single]:
        row = {"batch": b}
        t0 = time.time()
        try:
            def seed_one(_):
                s = lmpc_mod.init_lmpc_state(cfg.lmpc, solver=cfg.solver)
                for _ in range(cfg.lmpc.num_ss_it):
                    s = lmpc_mod.lmpc_add_trajectory(
                        s, cfg.lmpc, xs, us, xgs, st_n, L)
                return s

            state = jax.jit(jax.vmap(seed_one))(jnp.arange(b))
            jax.block_until_ready(state.time_step)
            row["seeded_s"] = round(time.time() - t0, 1)

            x0 = jnp.tile(jnp.asarray([0.5, 0, 0, 0, 0, 0], jnp.float32),
                          (b, 1))
            plant = PlantState(x=x0, x_glob=x0)

            from racinglmpc_tpu.ops.pallas_rollout import plant_step_batch

            @jax.jit
            def chunk(state, plant, k):
                def body(carry, t):
                    state, plant = carry
                    kk = jax.random.fold_in(k, t)
                    kc, kp = jax.random.split(kk)
                    kcs = jax.random.split(kc, b)
                    kps = jax.random.split(kp, b)
                    state, u = jax.vmap(step)(state, plant.x, kcs)
                    nx, nxg = plant_step_batch(
                        plant.x, plant.x_glob, u, vp, trk, cfg.sim)
                    sig = jnp.asarray(cfg.sim.noise_sigma, nx.dtype)
                    raw = jax.vmap(
                        lambda q: jax.random.normal(q, (3,), dtype=nx.dtype)
                    )(kps) * sig
                    nx = nx.at[:, :3].add(cfg.sim.noise_gain * jnp.clip(
                        raw, -cfg.sim.noise_clip, cfg.sim.noise_clip))
                    return (state, PlantState(x=nx, x_glob=nxg)), None

                (state, plant), _ = jax.lax.scan(
                    body, (state, plant), jnp.arange(args.steps))
                return state, plant

            state, plant = chunk(state, plant, jax.random.fold_in(key, 5))
            jax.block_until_ready(plant.x)
            row["ok"] = True
            row["wall_s"] = round(time.time() - t0, 1)
            # free before the next rung
            del state, plant
        except Exception as e:  # noqa: BLE001 — OOM text is the datum
            row["ok"] = False
            row["error"] = str(e)[:600]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
