"""Where does one batched LMPC control step spend its time?

Publishes the per-component time split of the benchmark step (VERDICT.md
round-1 item 2). The axon tunnel adds ~26 ms dispatch latency per independent
call, so instead of tracing single ops this measures *ablation deltas* on the
fused closed-loop scan used by ``bench.py``: the full step is re-built with
one component stubbed out (same shapes, constant data) and the chunk re-timed;
``full - ablated`` estimates that component's share.

The QP's per-scenario early exit makes the solve cost data-dependent, so a
naive single-ablation design is confounded (stub dynamics make the QP easier,
a stub terminal set makes it harder — measured: no_select alone is *slower*
than the full step). Instead: ``solve = full - no_solve`` (every non-solve
component is static-shape with data-independent cost, so no_solve measures
the non-solve remainder exactly), and the remainder is decomposed by ablating
each component *with the QP stubbed on both sides of the delta*.

Components of one step (controllers/lmpc.py::make_lmpc):
  select    safe-set terminal selection  (select_terminal_set)
  sysid     local WLS system-ID at N=14 horizon points
  assemble+ FTOCP assembly + epilogue (zt/roll/recovery; residual bucket)
  solve     batched ADMM QP (Pallas kernel)
  addpoint  safe-set addPoint update
  plant     100-substep Euler rollout

Usage:  python examples/profile_step.py [--batch 256] [--steps 50] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

from racinglmpc_tpu.controllers import lmpc as lmpc_mod
from racinglmpc_tpu.models import track as track_mod
from racinglmpc_tpu.models import sysid as sysid_mod
from racinglmpc_tpu.models.dynamics import PlantState, plant_step
from racinglmpc_tpu.ops import qp as qp_mod
from racinglmpc_tpu.runtime import experiment as exp
from racinglmpc_tpu.utils.config import LMPCConfig, SolverConfig, VehicleParams


def _seed_state(cfg, batch, trk):
    L = trk.total_len
    pid = exp.run_experiment(jax.random.PRNGKey(0), cfg, batch=1, stages="pid")
    x, u, xg, steps = (pid.pid.x[0], pid.pid.u[0], pid.pid.x_glob[0],
                       pid.pid.steps[0])

    def seed_one(_):
        st = lmpc_mod.init_lmpc_state(cfg.lmpc)
        for _ in range(cfg.lmpc.num_ss_it):
            st = lmpc_mod.lmpc_add_trajectory(st, cfg.lmpc, x, u, xg, steps, L)
        return st

    return jax.jit(jax.vmap(seed_one))(jnp.arange(batch))


def _time_chunk(step, state, plant, vp, trk, sim, steps, reps, skip_plant):
    @jax.jit
    def run_chunk(state, plant, key):
        def body(carry, t):
            state, plant = carry
            k = jax.random.fold_in(key, t)
            kc, kp = jax.random.split(k)

            def one(st, pl, kc, kp):
                st2, u = step(st, pl.x, kc)
                pl2 = pl if skip_plant else plant_step(pl, u, vp, trk, sim, kp)
                return st2, pl2

            kcs = jax.random.split(kc, state.time_step.shape[0])
            kps = jax.random.split(kp, state.time_step.shape[0])
            return jax.vmap(one)(state, plant, kcs, kps), None

        (state, plant), _ = jax.lax.scan(body, (state, plant),
                                         jnp.arange(steps))
        return state, plant

    key = jax.random.PRNGKey(7)
    s, p = run_chunk(state, plant, key)           # compile + warmup
    jax.block_until_ready(p.x)
    times = []
    for r in range(reps):
        t0 = time.time()
        s, p = run_chunk(s, p, jax.random.fold_in(key, r + 1))
        jax.block_until_ready(p.x)
        times.append(time.time() - t0)
    return min(times) / steps * 1e3               # ms per batched step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    cfg = exp.ExperimentConfig(
        stage_steps=450,
        solver=SolverConfig.throughput(),
        # pallas sysid is opt-in (config.py); profile the bench configuration
        lmpc=LMPCConfig(max_laps=12, max_pts=1024, model_pts=512,
                        use_pallas_sysid=jax.default_backend() == "tpu"),
    )
    trk = track_mod.make_track()
    vp = VehicleParams()
    state = _seed_state(cfg, args.batch, trk)
    x0 = jnp.tile(jnp.asarray([0.5, 0, 0, 0, 0, 0], jnp.float32),
                  (args.batch, 1))
    plant = PlantState(x=x0, x_glob=x0)

    # stub implementations (same output shapes, constant data)
    from racinglmpc_tpu.ops import pallas_sysid as psysid_mod

    real_select = lmpc_mod.select_terminal_set
    real_sysid = sysid_mod.local_linearization_horizon
    real_psysid = psysid_mod.local_linearization_horizon
    real_solve = qp_mod.solve
    real_addpoint = lmpc_mod.add_point

    def stub_select(ss, ext, zt, x_pred, time_step, cfg_l, L):
        K = cfg_l.num_ss_points
        dt = zt.dtype
        pts = jnp.broadcast_to(zt[:, None], (6, K)).astype(dt)
        return pts, pts, jnp.zeros((2, K), dt), jnp.arange(K, 0, -1.0, dtype=dt)

    def stub_sysid(store, trk_, x_lin, u_lin, cfg_l, dt_ctrl, **_):
        # patched over BOTH the XLA path and the Pallas kernel path (make_lmpc
        # binds pallas_sysid on TPU — stubbing only models/sysid would be a
        # no-op and re-time the unablated step)
        N = x_lin.shape[0]
        dt = x_lin.dtype
        A = jnp.broadcast_to(jnp.eye(6, dtype=dt), (N, 6, 6))
        B = jnp.zeros((N, 6, 2), dt).at[:, 0, 1].set(dt_ctrl)
        return A, B, jnp.zeros((N, 6), dt)

    def stub_solve(qp, cfg_s, warm=None, fac=None, structure=None):
        x, y = warm
        z = jnp.zeros((), x.dtype)
        return qp_mod.QPSolution(
            x=x, y=y, pri_res=z, dua_res=z, solved=jnp.asarray(True),
            iters=jnp.zeros((), jnp.int32), polished=jnp.asarray(False),
            fac=fac,
        )

    def stub_addpoint(ss, ext, x, u, L):
        return ext

    ns = {"solve": stub_solve}
    variants = {
        "full": {},
        "no_solve": dict(ns),
        "ns_no_select": dict(ns, select_terminal_set=stub_select),
        "ns_no_sysid": dict(ns, sysid=stub_sysid),
        "ns_no_addpoint": dict(ns, add_point=stub_addpoint),
        "ns_no_plant": dict(ns, plant=True),
    }

    ms = {}
    for name, patch in variants.items():
        lmpc_mod.select_terminal_set = patch.get("select_terminal_set",
                                                 real_select)
        sysid_mod.local_linearization_horizon = patch.get("sysid", real_sysid)
        psysid_mod.local_linearization_horizon = patch.get("sysid",
                                                           real_psysid)
        qp_mod.solve = patch.get("solve", real_solve)
        lmpc_mod.add_point = patch.get("add_point", real_addpoint)
        try:
            step = lmpc_mod.make_lmpc(cfg.lmpc, trk, cfg.solver, cfg.sim.dt)
            ms[name] = _time_chunk(step, state, plant, vp, trk, cfg.sim,
                                   args.steps, args.reps,
                                   skip_plant=patch.get("plant", False))
        finally:
            lmpc_mod.select_terminal_set = real_select
            sysid_mod.local_linearization_horizon = real_sysid
            psysid_mod.local_linearization_horizon = real_psysid
            qp_mod.solve = real_solve
            lmpc_mod.add_point = real_addpoint
        print(f"{name:12s} {ms[name]:8.2f} ms/step", file=sys.stderr)

    full = ms["full"]
    rem = ms["no_solve"]
    split = {
        "solve": full - rem,
        "select": rem - ms["ns_no_select"],
        "sysid": rem - ms["ns_no_sysid"],
        "addpoint": rem - ms["ns_no_addpoint"],
        "plant": rem - ms["ns_no_plant"],
    }
    split["assembly+epilogue"] = full - sum(split.values())
    out = {
        "batch": args.batch,
        "full_ms_per_step": round(full, 2),
        "throughput_solves_per_s": round(args.batch / full * 1e3, 1),
        "split_ms": {k: round(v, 2) for k, v in split.items()},
        "split_pct": {k: round(100 * v / full, 1) for k, v in split.items()},
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
