"""Capture the FTOCP QPs that the production preset REJECTS (round-4 item 1).

The round-3 16-lap TPU artifact (BENCH_solver_quality_16lap_tpu.json) shows
late-lap rejection bursts (lap 15: 21-41 rejected solves, lap time 79 -> 123+
steps) under both f32 throughput presets. This probe reproduces that workload
(same seeding/noise methodology as examples/solver_quality.py, single
scenario, throughput preset) and snapshots every rejected solve's *inputs*:

  - the assembled QP (P, q, A, l, u), re-derived from the pre-step state via
    the same module functions the controller uses,
  - the warm start (warm_x, warm_y) and the FactorCache (kinv, D, E, c,
    valid, age) the solve actually consumed,
  - the step context (lap, t, zt, x0) and outcome (pri, dua, iters).

plus a few ACCEPTED-step controls. examples/replay_rejects.py then re-solves
the captured QPs on the real TPU kernel under candidate configurations
(rho sweep, adaptive variants) to find what makes the hard ones converge.

Usage: SOLVER_QUALITY_BACKEND=tpu python examples/probe_rejects.py \
           [--laps 16] [--out /tmp/reject_probe]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import jax

if os.environ.get("SOLVER_QUALITY_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from racinglmpc_tpu.controllers import lmpc as lmpc_mod  # noqa: E402
from racinglmpc_tpu.controllers import ocp  # noqa: E402
from racinglmpc_tpu.models import sysid, track as track_mod  # noqa: E402
from racinglmpc_tpu.utils.config import LMPCConfig, SolverConfig  # noqa: E402

from examples.solver_quality import X0, shared_seed_data  # noqa: E402
from tests.oracles import ref_plant  # noqa: E402


def make_qp_snapshot_fn(lcfg: LMPCConfig, trk, dt_ctrl=0.1,
                        dtype=jnp.float32):
    """Re-derive the exact QP the controller assembles for (state, x0).

    Mirrors the prologue of lmpc.make_lmpc's step (s-wrap, terminal set,
    sys-ID, assemble) without solving."""
    dims, tmpl = ocp.make_templates(
        N=lcfg.N, Q=lcfg.Q, R=lcfg.R, dR=lcfg.dR, Qf=(0.0,) * 6,
        q_slack=lcfg.q_slack, x_ref=(0.0,) * 6,
        ey_max=lcfg.ey_max, delta_max=lcfg.delta_max, a_max=lcfg.a_max,
        K=lcfg.num_ss_points, q_terminal_slack=lcfg.q_terminal_slack,
        dtype=dtype,
    )
    N = lcfg.N
    L = trk.total_len

    @jax.jit
    def snap(state: lmpc_mod.LMPCState, x0):
        x0 = x0.astype(dtype)
        wrap = state.zt[4] - x0[4] > L / 2
        zt = state.zt.at[4].set(
            jnp.where(wrap, jnp.maximum(state.zt[4] - L, 0.0), state.zt[4])
        )
        x_lin = state.x_lin.at[N, 4].add(jnp.where(wrap, -L, 0.0))
        ss_pts, succ_x, succ_u, qfun_sel = lmpc_mod.select_terminal_set(
            state.ss, state.ext, zt, state.x_pred, state.time_step, lcfg, L
        )
        A, B, C = sysid.local_linearization_horizon(
            state.store, trk, x_lin[:N], state.u_lin, lcfg, dt_ctrl
        )
        qp = ocp.assemble_qp(
            dims, tmpl, ocp.StageDynamics(A, B, C), x0, state.u_old,
            lcfg.dR, ss_points=ss_pts, qfun_sel=qfun_sel,
        )
        return qp, ss_pts, qfun_sel, zt

    return snap


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--laps", type=int, default=16)
    ap.add_argument("--out", default="/tmp/reject_probe")
    ap.add_argument("--max-snaps", type=int, default=48)
    ap.add_argument("--controls", type=int, default=4,
                    help="accepted-step control snapshots per lap >= 10")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

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

    solver = SolverConfig.throughput()
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        import dataclasses
        solver = dataclasses.replace(solver, use_pallas=False)

    lcfg = LMPCConfig()
    dtype = jnp.float32
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
    jstep = jax.jit(lmpc_mod.make_lmpc(lcfg, trk32, solver, 0.1, dtype=dtype))
    snap_fn = make_qp_snapshot_fn(lcfg, trk32, 0.1, dtype)

    snaps = []           # list of dicts of np arrays
    trace = []           # per-step diagnostics
    steps = []
    x, g = X0.copy(), X0.copy()
    for lap in range(args.laps):
        xs, us = [], []
        rejects = 0
        ctrl_left = args.controls if lap >= 10 else 0
        for t in range(1000):
            pre_state = state
            x0j = jnp.asarray(x, dtype=dtype)
            state, u = jstep(state, x0j, None)
            u = np.asarray(u, dtype=np.float64)
            rejected = bool(state.rejects > 0)
            rejects += int(rejected)
            trace.append({
                "lap": lap, "t": t, "rejected": int(rejected),
                "feasible": int(bool(state.feasible)),
                "pri": float(state.pri_res), "dua": float(state.dua_res),
                "iters": int(state.iters),
            })
            take_ctrl = (not rejected) and ctrl_left > 0 and t % 25 == 10
            if (rejected and len(snaps) < args.max_snaps) or take_ctrl:
                qp, ss_pts, qfun_sel, zt = snap_fn(pre_state, x0j)
                snaps.append({
                    "lap": lap, "t": t, "rejected": int(rejected),
                    "pri": float(state.pri_res),
                    "dua": float(state.dua_res),
                    "iters": int(state.iters),
                    "P": np.asarray(qp.P), "q": np.asarray(qp.q),
                    "A": np.asarray(qp.A), "l": np.asarray(qp.l),
                    "u": np.asarray(qp.u),
                    "warm_x": np.asarray(pre_state.warm_x),
                    "warm_y": np.asarray(pre_state.warm_y),
                    "kinv": np.asarray(pre_state.fac.kinv),
                    "fD": np.asarray(pre_state.fac.D),
                    "fE": np.asarray(pre_state.fac.E),
                    "fc": np.asarray(pre_state.fac.c),
                    "fvalid": np.asarray(pre_state.fac.valid),
                    "fage": np.asarray(pre_state.fac.age),
                    "ss_pts": np.asarray(ss_pts),
                    "qfun_sel": np.asarray(qfun_sel),
                    "zt": np.asarray(zt), "x0": x.copy(),
                    "rejects_cnt": int(pre_state.rejects),
                })
                ctrl_left -= int(take_ctrl)
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
        print(f"lap {lap}: {len(xs)} steps, {rejects} rejected, "
              f"{len(snaps)} snaps so far", file=sys.stderr, flush=True)

    with open(os.path.join(args.out, "trace.json"), "w") as f:
        json.dump({"lap_steps": steps, "trace": trace}, f)
    # stack snapshots into one npz
    if snaps:
        keys = snaps[0].keys()
        np.savez_compressed(
            os.path.join(args.out, "snaps.npz"),
            **{k: np.stack([np.asarray(s[k]) for s in snaps]) for k in keys},
        )
    print(json.dumps({"lap_steps": steps, "n_snaps": len(snaps),
                      "n_rejected": sum(s["rejected"] for s in snaps)}))


if __name__ == "__main__":
    main()
