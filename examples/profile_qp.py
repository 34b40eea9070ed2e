"""Decompose the batched QP solve into its prologue/kernel/epilogue stages.

VERDICT round-2 item 3 (attack the 86%-of-step QP solve) redirect: the round-3
headline bench records ADMM iterations mean 38.9 / p50 25 / p99 125 at batch
256 — at the measured ~0.68 us per scenario-iteration the Pallas kernel LOOP
is only ~7 ms of the ~37 ms solve. The rest is prologue (warm Ruiz sweeps,
K assembly, Newton-Schulz refactorization) and epilogue (unscaled residuals)
running XLA-side every control step. This harness times each stage in
isolation on REALISTIC steady-state data (the same batch-256 bench workload,
captured mid-run after warm chunks), so optimization effort follows
measurement rather than guesswork.

Method: each stage is jitted and re-executed ``--reps`` times inside one
lax.scan dispatch (the TPU tunnel costs ~26 ms per dispatch — timing loops of
dispatches would swamp a 2 ms stage). A loop-carried perturbation (c * 1e-30
added to one input) defeats XLA's loop-invariant hoisting/CSE of the repeated
computation; the carry is a scalar reduction of the stage output so nothing
is dead code.

Replaces: the reference's per-step OSQP.setup+solve
(/root/reference/src/fnc/controller/PredictiveControllers.py:259-283), whose
setup (scaling + KKT factorization) is likewise paid every step.

Usage: python examples/profile_qp.py [--batch 256] [--reps 20] [--out F.json]
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from racinglmpc_tpu.controllers import lmpc as lmpc_mod
from racinglmpc_tpu.controllers import ocp
from racinglmpc_tpu.models import track as track_mod
from racinglmpc_tpu.models.dynamics import PlantState
from racinglmpc_tpu.ops import qp as qp_mod
from racinglmpc_tpu.runtime import experiment as exp
from racinglmpc_tpu.utils.config import (
    LMPCConfig,
    SimConfig,
    SolverConfig,
    VehicleParams,
)


def time_stage(name, fn, n_reps, *args):
    """Mean ms/execution of ``fn(*args)`` via a scanned, perturbed repeat."""

    def scanned(*a):
        def body(c, _):
            out = fn(c * 1e-30, *a)
            red = jax.tree_util.tree_reduce(
                lambda acc, leaf: acc + jnp.sum(jnp.abs(leaf.astype(jnp.float32))),
                out,
                jnp.float32(0.0),
            )
            return c + red * 1e-30 + 1.0, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_reps)
        return c

    f = jax.jit(scanned)
    jax.block_until_ready(f(*args))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    ms = (time.perf_counter() - t0) / n_reps * 1e3
    print(f"[profile_qp] {name}: {ms:.3f} ms", file=sys.stderr, flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--warm-steps", type=int, default=100)
    ap.add_argument("--scaling", action="store_true",
                    help="also fit the kernel's per-program fixed cost: "
                         "time forced-iteration-count runs (eps=0 disables "
                         "early exit) at several max_iter values")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    B = args.batch

    on_tpu = jax.default_backend() == "tpu"
    scfg = SolverConfig.throughput()
    base_cfg = exp.ExperimentConfig(
        stage_steps=450,
        solver=scfg,
        sim=SimConfig(use_pallas_rollout=on_tpu),
        lmpc=LMPCConfig(max_laps=12, max_pts=1024, model_pts=512,
                        use_pallas_sysid=on_tpu),
    )
    cfg = base_cfg.lmpc
    trk = track_mod.make_track()
    vp = VehicleParams()
    L = trk.total_len
    key = jax.random.PRNGKey(0)

    # --- reach LMPC steady state on the bench workload ----------------------
    print("[profile_qp] PID seed stage...", file=sys.stderr, flush=True)
    pid = exp.run_experiment(key, base_cfg, batch=1, stages="pid")
    xs, us, xgs, st_n = (pid.pid.x[0], pid.pid.u[0], pid.pid.x_glob[0],
                         pid.pid.steps[0])

    def seed_one(_):
        s = lmpc_mod.init_lmpc_state(cfg)
        for _ in range(cfg.num_ss_it):
            s = lmpc_mod.lmpc_add_trajectory(s, cfg, xs, us, xgs, st_n, L)
        return s

    state = jax.jit(jax.vmap(seed_one))(jnp.arange(B))
    x0 = jnp.tile(jnp.asarray([0.5, 0, 0, 0, 0, 0], jnp.float32), (B, 1))
    plant = PlantState(x=x0, x_glob=x0)
    step = lmpc_mod.make_lmpc(cfg, trk, scfg, base_cfg.sim.dt)

    from racinglmpc_tpu.models.dynamics import plant_step
    from racinglmpc_tpu.ops.pallas_rollout import plant_step_batch

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_chunk(state, plant, key, n):
        def body(carry, t):
            state, plant = carry
            k = jax.random.fold_in(key, t)
            kc, kp = jax.random.split(k)
            kcs = jax.random.split(kc, B)
            kps = jax.random.split(kp, B)
            state, u = jax.vmap(step)(state, plant.x, kcs)
            if base_cfg.sim.use_pallas_rollout:
                nx, nxg = plant_step_batch(
                    plant.x, plant.x_glob, u, vp, trk, base_cfg.sim)
                sig = jnp.asarray(base_cfg.sim.noise_sigma, nx.dtype)
                raw = jax.vmap(
                    lambda kk: jax.random.normal(kk, (3,), dtype=nx.dtype)
                )(kps) * sig
                nx = nx.at[:, :3].add(base_cfg.sim.noise_gain * jnp.clip(
                    raw, -base_cfg.sim.noise_clip, base_cfg.sim.noise_clip))
                plant = PlantState(x=nx, x_glob=nxg)
            else:
                plant = jax.vmap(
                    lambda pl, uu, kk: plant_step(pl, uu, vp, trk,
                                                  base_cfg.sim, kk)
                )(plant, u, kps)
            return (state, plant), None

        (state, plant), _ = jax.lax.scan(body, (state, plant),
                                         jnp.arange(n))
        return state, plant

    print(f"[profile_qp] warm {args.warm_steps} steps...", file=sys.stderr,
          flush=True)
    state, plant = run_chunk(state, plant, jax.random.fold_in(key, 7),
                             args.warm_steps)
    jax.block_until_ready(plant.x)

    # --- capture one step's REAL solver inputs (mirrors make_lmpc.step) -----
    dims, tmpl = ocp.make_templates(
        N=cfg.N, Q=cfg.Q, R=cfg.R, dR=cfg.dR, Qf=(0.0,) * 6,
        q_slack=cfg.q_slack, x_ref=(0.0,) * 6,
        ey_max=cfg.ey_max, delta_max=cfg.delta_max, a_max=cfg.a_max,
        K=cfg.num_ss_points, q_terminal_slack=cfg.q_terminal_slack,
        dtype=jnp.float32,
    )
    N = cfg.N

    @jax.jit
    @jax.vmap
    def capture_qp(state, x0):
        wrap = state.zt[4] - x0[4] > L / 2
        zt = state.zt.at[4].set(
            jnp.where(wrap, jnp.maximum(state.zt[4] - L, 0.0), state.zt[4]))
        x_lin = state.x_lin.at[N, 4].add(jnp.where(wrap, -L, 0.0))
        ss_pts, succ_x, succ_u, qfun_sel = lmpc_mod.select_terminal_set(
            state.ss, state.ext, zt, state.x_pred, state.time_step, cfg, L)
        from racinglmpc_tpu.models import sysid
        A, Bm, C = sysid.local_linearization_horizon(
            state.store, trk, x_lin[:N], state.u_lin, cfg, base_cfg.sim.dt)
        qp = ocp.assemble_qp(
            dims, tmpl, ocp.StageDynamics(A, Bm, C), x0, state.u_old, cfg.dR,
            ss_points=ss_pts, qfun_sel=qfun_sel)
        return qp

    qp = capture_qp(state, plant.x)
    warm = (state.warm_x, state.warm_y)
    fac = state.fac
    jax.block_until_ready(qp.P)
    n, m = qp.P.shape[1], qp.A.shape[1]
    R = args.reps
    results = {}

    # --- full solve (the number every stage must sum toward) ----------------
    def s_full(eps, qp, warm, fac):
        qp2 = qp._replace(q=qp.q + eps)
        sol = jax.vmap(
            lambda p, wx, wy, f: qp_mod.solve(p, scfg, warm=(wx, wy), fac=f)
        )(qp2, warm[0], warm[1], fac)
        return (sol.x, sol.iters)

    results["solve_full"] = time_stage("solve_full", s_full, R, qp, warm, fac)

    # --- stage: warm Ruiz at the preset's sweep counts -----------------------
    with jax.default_matmul_precision("highest"):
        for n_sw, tag in [(scfg.scaling_warm_iters, "ruiz_warm"),
                          (2, "ruiz_2sweeps")]:
            def s_ruiz(eps, qp, fac, _n=n_sw):
                def one(p, f):
                    init = (f.D, f.E, f.c)
                    return qp_mod._ruiz_equilibrate(
                        p._replace(q=p.q + eps), _n, init=init)
                return jax.vmap(one)(qp, fac)

            results[tag] = time_stage(tag, s_ruiz, R, qp, fac)

        # one materialized scaled problem for the downstream stages
        qp_s, D, E, c = jax.jit(jax.vmap(
            lambda p, f: qp_mod._ruiz_equilibrate(
                p, scfg.scaling_warm_iters, init=(f.D, f.E, f.c))
        ))(qp, fac)
        is_eq = jnp.isfinite(qp.l) & jnp.isfinite(qp.u) & (qp.u - qp.l < 1e-12)
        rho = jnp.where(is_eq, scfg.rho * scfg.rho_eq_scale,
                        scfg.rho).astype(jnp.float32)

        def s_buildk(eps, qp_s, rho):
            return jax.vmap(
                lambda p, r: qp_mod._build_K(
                    p._replace(P=p.P + eps), r, scfg.sigma)
            )(qp_s, rho)

        results["build_k"] = time_stage("build_k", s_buildk, R, qp_s, rho)

        K = jax.jit(jax.vmap(
            lambda p, r: qp_mod._build_K(p, r, scfg.sigma)))(qp_s, rho)
        ns_tol = scfg.ns_tol if scfg.ns_tol is not None else 1e-3

        def _warm_kinv(f, d_new):
            # mirror _solve_impl's scaling-delta transform of the warm start
            ratio = f.D / jnp.where(d_new > 0, d_new, 1.0)
            return f.kinv * ratio[:, None] * ratio[None, :]

        def s_ns(eps, K, fac, D):
            return jax.vmap(
                lambda k, f, d: qp_mod._ns_inverse(
                    k + eps, _warm_kinv(f, d), f.valid, ns_tol,
                    scfg.ns_max_iters)
            )(K, fac, D)

        results["ns_warm"] = time_stage("ns_warm", s_ns, R, K, fac, D)

        Kinv, _ = jax.jit(jax.vmap(
            lambda k, f, d: qp_mod._ns_inverse(
                k, _warm_kinv(f, d), f.valid, ns_tol,
                scfg.ns_max_iters)))(K, fac, D)

        # --- stage: the Pallas kernel with the step's true warm start -------
        from racinglmpc_tpu.ops import pallas_qp

        def s_kernel(eps, qp_s, Kinv, rho, D, E, c, warm):
            def one(p, ki, r, d, e, cc, wx, wy):
                x = wx / d
                y = cc * wy / e
                z = jnp.clip(p.A @ x, p.l, p.u)
                return pallas_qp.admm_iterate(
                    p.P, ki, p.A, p.q + eps, p.l, p.u, r, d, e, cc,
                    x, z, y,
                    sigma=scfg.sigma, alpha=scfg.alpha,
                    eps_abs=scfg.eps_abs, eps_rel=scfg.eps_rel,
                    max_iter=scfg.max_iter, check_every=scfg.check_every,
                    refine_steps=scfg.kkt_refine_steps,
                    iter_precision=scfg.pallas_iter_precision,
                )
            return jax.vmap(one)(qp_s, Kinv, rho, D, E, c, warm[0], warm[1])

        results["pallas_kernel"] = time_stage(
            "pallas_kernel", s_kernel, R, qp_s, Kinv, rho, D, E, c, warm)

        # head-to-head: the fused-prologue kernel on identical inputs
        def s_kernel_fused(eps, qp_s, fac, rho, D, E, c, warm):
            def one(p, f, r, d, e, cc, wx, wy):
                x = wx / d
                y = cc * wy / e
                z = jnp.clip(p.A @ x, p.l, p.u)
                return pallas_qp.admm_iterate_fused(
                    p.P, p.A, f.kinv, f.valid,
                    p.q + eps, p.l, p.u, r, d, e, cc,
                    x, z, y,
                    sigma=scfg.sigma, alpha=scfg.alpha,
                    eps_abs=scfg.eps_abs, eps_rel=scfg.eps_rel,
                    max_iter=scfg.max_iter, check_every=scfg.check_every,
                    refine_steps=scfg.kkt_refine_steps,
                    ns_tol=float(ns_tol), ns_max_iters=scfg.ns_max_iters,
                    iter_precision=scfg.pallas_iter_precision,
                )
            return jax.vmap(one)(qp_s, fac, rho, D, E, c, warm[0], warm[1])

        results["pallas_kernel_fused"] = time_stage(
            "pallas_kernel_fused", s_kernel_fused, R,
            qp_s, fac, rho, D, E, c, warm)

        # forced-iteration scaling: wall(B, max_iter) = B*(c0 + iters*c1).
        # eps=0 defeats the early exit so every program runs EXACTLY
        # max_iter iterations; the fit separates per-program fixed cost
        # (c0: DMA, entry check, launch) from per-iteration cost (c1).
        if args.scaling:
            scale_pts = []
            for mi in (4, 16, 64, 256):
                def s_forced(eps, qp_s, Kinv, rho, D, E, c, warm, _mi=mi):
                    def one(p, ki, r, d, e, cc, wx, wy):
                        x = wx / d
                        y = cc * wy / e
                        z = jnp.clip(p.A @ x, p.l, p.u)
                        return pallas_qp.admm_iterate(
                            p.P, ki, p.A, p.q + eps, p.l, p.u, r, d, e, cc,
                            x, z, y,
                            sigma=scfg.sigma, alpha=scfg.alpha,
                            eps_abs=0.0, eps_rel=0.0,
                            max_iter=_mi, check_every=scfg.check_every,
                            refine_steps=scfg.kkt_refine_steps,
                            iter_precision=scfg.pallas_iter_precision,
                        )
                    return jax.vmap(one)(qp_s, Kinv, rho, D, E, c,
                                         warm[0], warm[1])

                ms = time_stage(f"kernel_forced_{mi}", s_forced, max(R, 6),
                                qp_s, Kinv, rho, D, E, c, warm)
                scale_pts.append((mi, ms))
            xs_f = np.array([p[0] for p in scale_pts], dtype=float)
            ys_f = np.array([p[1] for p in scale_pts], dtype=float)
            c1, c0 = np.polyfit(xs_f, ys_f, 1)
            scaling_fit = {
                "kernel_fixed_us_per_program": round(c0 / B * 1e3, 2),
                "kernel_us_per_program_iter": round(c1 / B * 1e3, 3),
                "kernel_forced_ms": {int(m): round(v, 3)
                                     for m, v in scale_pts},
            }
            print(f"[profile_qp] kernel fixed cost "
                  f"{scaling_fit['kernel_fixed_us_per_program']} us/program, "
                  f"{scaling_fit['kernel_us_per_program_iter']} us/iter",
                  file=sys.stderr, flush=True)
        else:
            scaling_fit = None

        # per-lane NS warm-refresh iteration counts (the XLA path pays the
        # MAX over the batch in lockstep; the fused kernel pays per lane)
        def ns_iters_one(k, f, d_new):
            I = jnp.eye(n, dtype=jnp.float32)
            kinv_w = _warm_kinv(f, d_new)
            R0 = I - k @ kinv_w
            # mirror _ns_inverse's power-iteration spectral gate
            def _pow(c, _):
                v, _ = c
                w = R0 @ v
                nrm = jnp.sqrt(jnp.sum(w * w))
                return (w / jnp.maximum(nrm, 1e-30), nrm), None

            v0 = jnp.full((n,), 1.0 / jnp.sqrt(jnp.float32(n)), jnp.float32)
            (_, rho_est), _ = jax.lax.scan(
                _pow, (v0, jnp.float32(0.0)), None, length=12)
            warm = f.valid & jnp.isfinite(rho_est) & (rho_est < 0.9)

            def cond(st):
                _, r, it = st
                return (r > ns_tol) & (it < scfg.ns_max_iters)

            def body(st):
                X, _, it = st
                Rm = I - k @ X
                return X + X @ Rm, jnp.max(jnp.abs(Rm)), it + 1

            d0 = 1.0 / jnp.clip(jnp.diagonal(k), 1e-12, None)
            cj = jnp.sqrt(jnp.sum((I - k * d0[None, :]) ** 2))
            Xj = (I * d0[None, :]) / jnp.maximum(cj, 1.0)
            X0 = jnp.where(warm, kinv_w, Xj)
            _, _, it = jax.lax.while_loop(
                cond, body, (X0, jnp.asarray(jnp.inf, jnp.float32),
                             jnp.int32(0)))
            return it, warm

        ns_it, ns_warm_used = jax.jit(jax.vmap(ns_iters_one))(K, fac, D)
        ns_it = np.asarray(ns_it)

        # kernel iteration stats on this exact workload
        _, _, _, _, it_k, ok_k, _resc = jax.jit(
            lambda *a: s_kernel(jnp.float32(0.0), *a)
        )(qp_s, Kinv, rho, D, E, c, warm)
        it_np = np.asarray(it_k)

        # --- stage: epilogue residuals on the ORIGINAL problem --------------
        def s_finish(eps, qp, Kinv, warm):
            ones_n = jnp.ones(n, jnp.float32)
            ones_m = jnp.ones(m, jnp.float32)
            one = jnp.asarray(1.0, jnp.float32)

            def one_fn(p, wx, wy):
                return qp_mod._residuals(
                    p._replace(q=p.q + eps), wx, wy, ones_n, ones_m, one)

            return jax.vmap(one_fn)(qp, warm[0], warm[1])

        results["finish_residuals"] = time_stage(
            "finish_residuals", s_finish, R, qp, Kinv, warm)

    known = (results["ruiz_warm"] + results["build_k"] + results["ns_warm"]
             + results["pallas_kernel"] + results["finish_residuals"])
    rec = {
        "metric": "qp_solve_stage_profile",
        "batch": B,
        "device": jax.default_backend(),
        "stages_ms": {k: round(v, 3) for k, v in results.items()},
        "stage_sum_ms": round(known, 3),
        "unattributed_ms": round(results["solve_full"] - known, 3),
        "kernel_iters_mean": round(float(it_np.mean()), 1),
        "kernel_iters_p99": int(np.percentile(it_np, 99)),
        "kernel_ok_frac": round(float(np.asarray(ok_k).mean()), 3),
        "ns_iters_mean": round(float(ns_it.mean()), 2),
        "ns_iters_max": int(ns_it.max()),
        "ns_warm_frac": round(float(np.asarray(ns_warm_used).mean()), 3),
        "config": {"scaling_warm_iters": scfg.scaling_warm_iters,
                   "scaling_refresh_every": scfg.scaling_refresh_every,
                   "kkt_refine_steps": scfg.kkt_refine_steps,
                   "check_every": scfg.check_every},
        **({"kernel_scaling": scaling_fit} if scaling_fit else {}),
    }
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
