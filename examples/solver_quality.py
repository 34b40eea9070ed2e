"""Quantify solver-preset quality against the reference oracle (VERDICT
round-1 item 10): per-lap LMPC step counts for the float64 reference-
semantics oracle vs the JAX controller under each solver preset, all driven
through the SAME plant with the SAME noise (the tests/test_ref_parity.py
methodology, extended to the float32 production presets).

This measures QUALITY (lap times), not speed — it runs fine on CPU; speed is
bench.py's job. Presets: parity (f64, the 1%-criterion configuration),
throughput (f32, Pallas ADMM in interpret mode off-TPU), balanced (f32,
tighter tolerance).

Usage: python examples/solver_quality.py [--laps 6]
"""
from __future__ import annotations

import argparse
import json
import sys

import jax

# quality-only workload: force CPU (a JAX_PLATFORMS env var is overridden by
# the axon sitecustomize here; only the config update reliably wins), unless
# the caller explicitly asks for the accelerator
import os  # noqa: E402

if os.environ.get("SOLVER_QUALITY_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from racinglmpc_tpu.controllers import lmpc as lmpc_mod  # noqa: E402
from racinglmpc_tpu.models import track as track_mod  # noqa: E402
from racinglmpc_tpu.utils.config import LMPCConfig, SolverConfig  # noqa: E402

from tests.oracles import ref_controller as rc  # noqa: E402
from tests.oracles import ref_plant  # noqa: E402

X0 = np.array([0.5, 0, 0, 0, 0, 0.0])


def shared_seed_data(curv, L, rng):
    x, g = X0.copy(), X0.copy()
    xs, us = [], []
    for _ in range(420):
        n_st = np.clip(rng.standard_normal() * 0.25, -0.9, 0.9)
        n_a = np.clip(rng.standard_normal() * 0.10, -0.2, 0.2)
        u = np.array([-0.6 * x[5] - 0.9 * x[3] + n_st,
                      1.5 * (0.8 - x[0]) + n_a])
        xs.append(x.copy())
        us.append(u.copy())
        pn = np.clip(rng.standard_normal(3) * np.array([0.01, 0.01, 0.005]),
                     -0.05, 0.05)
        x, g = ref_plant.plant_step(x, g, u, curv, noise=pn)
        if x[4] > L:
            break
    return np.array(xs), np.array(us)


def run_oracle(curv, L, xs_pid, us_pid, noise, n_laps):
    pm = rc.RefPredictiveModel(curv, 4)
    lm = rc.RefLMPC(14, np.array([5.0, 50.0]), (5.0, 25.0), 500.0, 48, 4,
                    pm, L)
    for _ in range(4):
        pm.add_trajectory(xs_pid, us_pid)
        lm.add_trajectory(xs_pid, us_pid)
    steps = []
    x, g = X0.copy(), X0.copy()
    for lap in range(n_laps):
        xs, us = [], []
        for t in range(1000):
            u = lm.solve(x)
            xs.append(x.copy())
            us.append(u.copy())
            lm.add_point(x, u)
            x, g = ref_plant.plant_step(x, g, u, curv, noise=noise[lap, t])
            if x[4] > L:
                break
        x = x.copy()
        x[4] -= L
        lm.add_trajectory(np.array(xs), np.array(us))
        pm.add_trajectory(np.array(xs), np.array(us))
        steps.append(len(xs))
        print(f"  oracle lap {lap}: {len(xs)}", file=sys.stderr)
    return steps


def run_jax(trk, curv, L, xs_pid, us_pid, noise, n_laps, solver, dtype):
    lcfg = LMPCConfig()
    state = lmpc_mod.init_lmpc_state(lcfg, dtype=dtype)
    add_tr = jax.jit(
        lambda st, x, u, xg, s: lmpc_mod.lmpc_add_trajectory(
            st, lcfg, x, u, xg, s, L)
    )

    def pad(a, T=2048):
        out = np.zeros((T, a.shape[1]))
        out[: len(a)] = a[:T]
        return jnp.asarray(out, dtype=dtype)

    for _ in range(4):
        state = add_tr(state, pad(xs_pid), pad(us_pid), pad(xs_pid),
                       jnp.int32(len(xs_pid)))
    jstep = jax.jit(lmpc_mod.make_lmpc(lcfg, trk, solver, 0.1, dtype=dtype))
    steps, diag = [], []
    x, g = X0.copy(), X0.copy()
    for lap in range(n_laps):
        xs, us = [], []
        rejects, unconv, iters = 0, 0, []
        for t in range(1000):
            state, u = jstep(state, jnp.asarray(x, dtype=dtype), None)
            u = np.asarray(u, dtype=np.float64)
            # controller-level rejection (solution NOT applied: pri_res
            # above accept_pri_res or non-finite -> input held / fallback)
            rejects += int(bool(state.rejects > 0))
            # converged-to-tolerance miss (solution still applied): in f32
            # the dual residual stalls at its precision floor, so this is
            # expected off-TPU; it is NOT a quality event by itself
            unconv += int(not bool(state.feasible))
            iters.append(int(state.iters))
            xs.append(x.copy())
            us.append(u.copy())
            x, g = ref_plant.plant_step(x, g, u, curv, noise=noise[lap, t])
            if x[4] > L:
                break
        x = x.copy()
        x[4] -= L
        state = add_tr(state, pad(np.array(xs)), pad(np.array(us)),
                       pad(np.array(xs)), jnp.int32(len(xs)))
        steps.append(len(xs))
        diag.append({"rejects": rejects, "unconverged": unconv,
                     "iters_p99": int(np.percentile(iters, 99))})
        print(f"  lap {lap}: {len(xs)} (rejected {rejects}, "
              f"unconverged {unconv}, "
              f"iters_p99 {diag[-1]['iters_p99']})", file=sys.stderr)
    return steps, diag


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--laps", type=int, default=6)
    ap.add_argument("--presets", default=None,
                    help="comma list to run (default: all). 'oracle_f64' is "
                         "always run (it is the comparison base); "
                         "'parity_f64' is skipped automatically on TPU "
                         "(no f64 there).")
    ap.add_argument("--extra", default=None,
                    help="JSON {name: SolverConfig-overrides-on-throughput} "
                         "of additional f32 presets to evaluate")
    ap.add_argument("--out", default=None,
                    help="also write the table to this JSON file")
    args = ap.parse_args()

    trk64 = track_mod.make_track(dtype=jnp.float64)
    trk32 = track_mod.make_track(dtype=jnp.float32)
    L = float(trk64.total_len)
    curv = ref_plant.np_curvature_fn(trk64)
    rng = np.random.default_rng(0)
    xs_pid, us_pid = shared_seed_data(curv, L, rng)
    noise = np.clip(
        rng.standard_normal((args.laps + 1, 1000, 3))
        * np.array([0.01, 0.01, 0.005]),
        -0.05, 0.05,
    )

    on_tpu = jax.devices()[0].platform == "tpu"
    f32_presets = {
        "throughput_f32": SolverConfig.throughput(),
        "balanced_f32": SolverConfig.balanced(),
    }
    if args.extra:
        import dataclasses
        for name, over in json.loads(args.extra).items():
            f32_presets[name] = dataclasses.replace(
                SolverConfig.throughput(), **over)
    if not on_tpu:
        # off-TPU, run the XLA f32 path instead of the (interpreter-slow)
        # Pallas kernel — tests/test_pallas_qp.py pins the two equal
        import dataclasses
        f32_presets = {
            k: dataclasses.replace(v, use_pallas=False)
            for k, v in f32_presets.items()
        }

    wanted = set(args.presets.split(",")) if args.presets else None

    def want(name):
        return wanted is None or name in wanted

    out, diags = {}, {}
    print("oracle (reference semantics, f64):", file=sys.stderr)
    out["oracle_f64"] = run_oracle(curv, L, xs_pid, us_pid, noise, args.laps)
    if want("parity_f64") and not on_tpu:
        print("parity preset (f64):", file=sys.stderr)
        out["parity_f64"], diags["parity_f64"] = run_jax(
            trk64, curv, L, xs_pid, us_pid, noise, args.laps,
            SolverConfig.parity(), jnp.float64)
    for name, sc in f32_presets.items():
        if not want(name):
            continue
        print(f"{name}:", file=sys.stderr)
        out[name], diags[name] = run_jax(trk32, curv, L, xs_pid, us_pid,
                                         noise, args.laps, sc, jnp.float32)

    ref = np.array(out["oracle_f64"], dtype=float)
    table = {
        k: {
            "lap_steps": v,
            "total_rel_diff_pct": round(
                abs(sum(v) - ref.sum()) / ref.sum() * 100, 2),
            "final_lap_rel_diff_pct": round(
                (v[-1] - ref[-1]) / ref[-1] * 100, 2),
            **({"rejected_per_lap": [d["rejects"] for d in diags[k]],
                "unconverged_per_lap": [d["unconverged"] for d in diags[k]],
                # criterion-level summary (round-4 verdict item 6): fraction
                # of executed steps whose solve missed tolerance but was
                # still applied (pri_res under accept_pri_res). Not a
                # quality event by itself — the lap-time criteria above are
                # — but a preset marketed as "tighter" must not hide a high
                # rate here.
                "unconverged_rate": round(
                    sum(d["unconverged"] for d in diags[k]) / max(sum(v), 1),
                    4),
                "rejected_rate": round(
                    sum(d["rejects"] for d in diags[k]) / max(sum(v), 1), 4)}
               if k in diags else {}),
        }
        for k, v in out.items()
    }
    print(json.dumps(table, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"laps": args.laps, "presets": table}, f, indent=1)
    return table


if __name__ == "__main__":
    main()
