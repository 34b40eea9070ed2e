"""MFU / roofline accounting for the three Pallas kernels (VERDICT round-2
item 4): FLOPs and HBM bytes per invocation from the kernel structure,
achieved TFLOP/s and GB/s from steady-state timing, and the fraction of the
relevant hardware ceilings — substantiating (or retiring) the
"speed-of-light per chip" claim and ranking the next optimization.

Methodology
- Timing: the axon tunnel adds ~26 ms dispatch+readback latency per call, so
  each kernel is timed as ONE dispatch of a ``lax.scan`` of R chained
  invocations, at two values of R; per-call time = slope. Inputs are
  realistic: a seeded batch-256 LMPC state advanced a few closed-loop steps,
  then the exact pre-solve pipeline of ``controllers/lmpc.make_lmpc``
  re-run to extract the assembled FTOCP batch.
- FLOPs: counted from the kernel source (matvec/matmul MACs x 2; elementwise
  VPU work reported separately where it dominates). The QP kernel's
  data-dependent trip count uses the measured per-scenario iteration counts
  of the same inputs.
- Ceilings (TPU v5e, per chip): 197 TFLOP/s bf16 MXU peak; f32 "highest"
  matmul (the precision every conditioning-critical path here requires, see
  ops/qp.py) decomposes each product into multiple bf16 passes — ~1/6 of
  bf16 peak ~ 33 TFLOP/s; HBM ~819 GB/s. A (1,n)x(n,n) matvec additionally
  occupies only 1 of 8 sublanes per MXU pass -> ~4.1 TFLOP/s structural
  ceiling for M=1 chains. Which ceiling binds each kernel is part of the
  output.

Usage: python examples/mfu_roofline.py [--batch 256] [--out PATH]
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

# v5e per-chip ceilings (public spec; see module docstring)
PEAK_BF16 = 197e12
PEAK_F32_HIGHEST = PEAK_BF16 / 6.0
PEAK_F32_M1 = PEAK_F32_HIGHEST / 8.0     # M=1 matvec: 1 of 8 sublanes
HBM_GBPS = 819e9


def _slope_time(make_scan, r_lo=2, r_hi=12, reps=3):
    """Per-invocation seconds via the scan-length slope (tunnel-floor-proof)."""
    f_lo, f_hi = make_scan(r_lo), make_scan(r_hi)
    ts = {}
    for name, f in (("lo", f_lo), ("hi", f_hi)):
        out = f()
        jax.block_until_ready(out)          # compile + warmup
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f()
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        ts[name] = best
    return max(ts["hi"] - ts["lo"], 1e-9) / (r_hi - r_lo)


def build_inputs(batch: int, warm_steps: int = 12):
    """Seeded batch LMPC state advanced ``warm_steps`` real control steps,
    plus the step's pre-solve products (assembled QP batch, scaled QP,
    Kinv) extracted by re-running make_lmpc's pre-solve pipeline."""
    on_tpu = jax.default_backend() == "tpu"
    cfg = exp.ExperimentConfig(
        stage_steps=450,
        solver=SolverConfig.throughput(),
        sim=SimConfig(use_pallas_rollout=on_tpu),
        lmpc=LMPCConfig(max_laps=12, max_pts=1024, model_pts=512,
                        use_pallas_sysid=on_tpu),
    )
    trk = track_mod.make_track()
    vp = VehicleParams()
    L = trk.total_len
    pid = exp.run_experiment(jax.random.PRNGKey(0), cfg, batch=1, stages="pid")
    xs, us, xgs, st = (pid.pid.x[0], pid.pid.u[0], pid.pid.x_glob[0],
                       pid.pid.steps[0])

    def seed_one(_):
        s = lmpc_mod.init_lmpc_state(cfg.lmpc)
        for _ in range(cfg.lmpc.num_ss_it):
            s = lmpc_mod.lmpc_add_trajectory(s, cfg.lmpc, xs, us, xgs, st, L)
        return s

    state = jax.jit(jax.vmap(seed_one))(jnp.arange(batch))
    step = lmpc_mod.make_lmpc(cfg.lmpc, trk, cfg.solver, cfg.sim.dt)
    x0 = jnp.tile(jnp.asarray([0.5, 0, 0, 0, 0, 0], jnp.float32), (batch, 1))
    plant = PlantState(x=x0, x_glob=x0)

    from racinglmpc_tpu.models.dynamics import plant_step

    @jax.jit
    def advance(state, plant, key):
        def body(carry, t):
            state, plant = carry
            k = jax.random.fold_in(key, t)
            kc, kp = jax.random.split(k)
            kcs = jax.random.split(kc, batch)
            kps = jax.random.split(kp, batch)
            state, u = jax.vmap(step)(state, plant.x, kcs)
            plant = jax.vmap(
                lambda pl, uu, kk: plant_step(pl, uu, vp, trk, cfg.sim, kk)
            )(plant, u, kps)
            return (state, plant), None

        (state, plant), _ = jax.lax.scan(body, (state, plant),
                                         jnp.arange(warm_steps))
        return state, plant

    state, plant = advance(state, plant, jax.random.PRNGKey(1))
    jax.block_until_ready(plant.x)
    return cfg, trk, vp, state, plant


def presolve_qp(cfg, trk, state, x0):
    """Re-run make_lmpc's pre-solve pipeline for one scenario (vmap outside):
    returns the assembled FTOCP (ocp.assemble_qp output)."""
    lcfg = cfg.lmpc
    N = lcfg.N
    L = trk.total_len
    dims, tmpl = ocp.make_templates(
        N=N, Q=lcfg.Q, R=lcfg.R, dR=lcfg.dR, Qf=(0.0,) * 6,
        q_slack=lcfg.q_slack, x_ref=(0.0,) * 6,
        ey_max=lcfg.ey_max, delta_max=lcfg.delta_max, a_max=lcfg.a_max,
        K=lcfg.num_ss_points, q_terminal_slack=lcfg.q_terminal_slack,
        dtype=jnp.float32,
    )
    wrap = state.zt[4] - x0[4] > L / 2
    zt = state.zt.at[4].set(
        jnp.where(wrap, jnp.maximum(state.zt[4] - L, 0.0), state.zt[4]))
    x_lin = state.x_lin.at[N, 4].add(jnp.where(wrap, -L, 0.0))
    ss_pts, succ_x, succ_u, qfun_sel = lmpc_mod.select_terminal_set(
        state.ss, state.ext, zt, state.x_pred, state.time_step, lcfg, L)
    from racinglmpc_tpu.models import sysid as sysid_mod

    A, B, C = sysid_mod.local_linearization_horizon(
        state.store, trk, x_lin[:N], state.u_lin, lcfg, 0.1)
    return dims, ocp.assemble_qp(
        dims, tmpl, ocp.StageDynamics(A, B, C), x0, state.u_old, lcfg.dR,
        ss_points=ss_pts, qfun_sel=qfun_sel,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    B = args.batch
    scfg = SolverConfig.throughput()

    print("building realistic inputs (seed + 12 warm steps)...",
          file=sys.stderr)
    cfg, trk, vp, state, plant = build_inputs(B)
    qp = jax.jit(
        jax.vmap(lambda st, x: presolve_qp(cfg, trk, st, x)[1])
    )(state, plant.x)
    jax.block_until_ready(qp.P)
    n, m = qp.P.shape[1], qp.A.shape[1]
    np_, mp_ = 256, -(-m // 128) * 128

    # ---- scaled problem + Kinv (the admm_iterate inputs), batched --------
    def prologue(qp1, fac, warm):
        with jax.default_matmul_precision("highest"):
            dt = qp1.P.dtype
            is_eq = (jnp.isfinite(qp1.l) & jnp.isfinite(qp1.u)
                     & (qp1.u - qp1.l < 1e-12))
            one_n, one_m = jnp.ones(n, dt), jnp.ones(m, dt)
            init = (jnp.where(fac.valid, fac.D, one_n),
                    jnp.where(fac.valid, fac.E, one_m),
                    jnp.where(fac.valid, fac.c, jnp.asarray(1.0, dt)))
            qp_s, D, E, c = qp_mod._ruiz_equilibrate(
                qp1, scfg.scaling_warm_iters, init=init)
            rho = jnp.where(is_eq, scfg.rho * scfg.rho_eq_scale, scfg.rho)
            K1 = qp_mod._build_K(qp_s, rho, jnp.asarray(scfg.sigma, dt))
            Kinv, _ = qp_mod._ns_inverse(
                K1, fac.kinv, fac.valid, 1e-3, scfg.ns_max_iters)
            x_w, y_w = warm
            x = x_w / D
            y = c * y_w / E
            z = jnp.clip(qp_s.A @ x, qp_s.l, qp_s.u)
            return qp_s, D, E, c, rho, Kinv, x, z, y

    pro = jax.jit(jax.vmap(prologue))(qp, state.fac,
                                      (state.warm_x, state.warm_y))
    jax.block_until_ready(pro[0].P)
    qp_s, D, E, c, rho, Kinv, x0s, z0s, y0s = pro

    from racinglmpc_tpu.ops import pallas_qp

    def admm_only(qp_s, Kinv, rho, D, E, c, x, z, y):
        return pallas_qp.admm_iterate(
            qp_s.P, Kinv, qp_s.A, qp_s.q, qp_s.l, qp_s.u, rho, D, E, c,
            x, z, y, sigma=scfg.sigma, alpha=scfg.alpha,
            eps_abs=scfg.eps_abs, eps_rel=scfg.eps_rel,
            max_iter=scfg.max_iter, check_every=scfg.check_every,
            refine_steps=scfg.kkt_refine_steps, interpret=False)

    # measured iteration counts on these exact inputs
    out = jax.jit(jax.vmap(admm_only))(qp_s, Kinv, rho, D, E, c,
                                       x0s, z0s, y0s)
    iters = np.asarray(out[4])
    it_mean, it_p99 = float(iters.mean()), float(np.percentile(iters, 99))

    def scan_of(f, *inputs):
        """One dispatch running f R times with a chained dummy dependency."""
        def make(R):
            @jax.jit
            def run():
                def body(carry, _):
                    eps = carry * 0.0
                    outs = f(*jax.tree_util.tree_map(
                        lambda a: a + eps.astype(a.dtype) if a.dtype.kind == "f"
                        else a, inputs))
                    first = jax.tree_util.tree_leaves(outs)[0]
                    return jnp.sum(first.astype(jnp.float32)), None

                s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=R)
                return s
            return run
        return make

    rows = {}

    # ---- 1. pallas_qp.admm_iterate ---------------------------------------
    t_admm = _slope_time(scan_of(
        lambda qp_sP, Kinv, A, q, l, u, rho, D, E, c, x, z, y:
        jax.vmap(lambda *a: pallas_qp.admm_iterate(
            *a, sigma=scfg.sigma, alpha=scfg.alpha, eps_abs=scfg.eps_abs,
            eps_rel=scfg.eps_rel, max_iter=scfg.max_iter,
            check_every=scfg.check_every,
            refine_steps=scfg.kkt_refine_steps, interpret=False,
            rescue_max_iter=scfg.rescue_max_iter,
            rescue_rho_scale=scfg.rescue_rho_scale,
            rescue_trigger=scfg.rescue_trigger,
            rescue_exit=scfg.rescue_exit))(
            qp_sP, Kinv, A, q, l, u, rho, D, E, c, x, z, y),
        qp_s.P, Kinv, qp_s.A, qp_s.q, qp_s.l, qp_s.u, rho, D, E, c,
        x0s, z0s, y0s))
    # FLOP model (see ops/pallas_qp.py _kernel): per iteration 7 padded
    # matvecs; per convergence check 3 matvecs
    mac_iter = (mp_ * np_            # mv_n(rho z - y)
                + np_ * np_          # Kinv rhs
                + (np_ * mp_ + mp_ * np_ + np_ * np_ + np_ * np_)  # refine
                + np_ * mp_)         # zt
    mac_check = np_ * mp_ + np_ * np_ + mp_ * np_
    # +1: the kernel checks residuals once at entry (warm-start early exit)
    checks = np.ceil(iters / scfg.check_every) + 1
    flops_admm = float(2 * (iters.astype(np.float64) * mac_iter
                            + checks * mac_check).sum())
    bytes_admm = B * 4.0 * (np_ * np_ * 2 + mp_ * np_ + 8 * mp_
                            + 2 * np_ + 2 * mp_ + np_ + mp_ + 128)
    rows["pallas_qp_admm"] = dict(
        wall_ms=t_admm * 1e3, flops=flops_admm, hbm_bytes=bytes_admm,
        tflops=flops_admm / t_admm / 1e12,
        gbps=bytes_admm / t_admm / 1e9,
        iters_mean=it_mean, iters_p99=it_p99,
        pct_bf16_peak=100 * flops_admm / t_admm / PEAK_BF16,
        pct_f32_highest=100 * flops_admm / t_admm / PEAK_F32_HIGHEST,
        pct_m1_matvec_ceiling=100 * flops_admm / t_admm / PEAK_F32_M1,
        bound="MXU-pass-serial at M=1 (see notes)",
    )

    # ---- 2. full qp_mod.solve (prologue + kernel + epilogue) -------------
    t_solve = _slope_time(scan_of(
        lambda P, q, A, l, u, wx, wy, fac: jax.vmap(
            lambda *a: qp_mod.solve(
                qp_mod.QPData(a[0], a[1], a[2], a[3], a[4]), scfg,
                warm=(a[5], a[6]), fac=a[7]).x)(P, q, A, l, u, wx, wy, fac),
        qp.P, qp.q, qp.A, qp.l, qp.u, state.warm_x, state.warm_y, state.fac))
    # prologue measured DIRECTLY (round-4 item 5: subtracting overlapped
    # stages produced a physically-absurd negative number in round 3);
    # overlap = how much of (prologue + kernel) XLA hides inside the full
    # solve — reported as overlap, clamped >= 0.
    t_pro = _slope_time(scan_of(
        lambda P, q, A, l, u, wx, wy, fac: jax.vmap(prologue)(
            qp_mod.QPData(P, q, A, l, u), fac, (wx, wy))[5],
        qp.P, qp.q, qp.A, qp.l, qp.u, state.warm_x, state.warm_y, state.fac))
    rows["qp_solve_full"] = dict(
        wall_ms=t_solve * 1e3,
        kernel_ms=t_admm * 1e3,
        prologue_ms=t_pro * 1e3,
        overlap_ms=max((t_pro + t_admm - t_solve) * 1e3, 0.0),
        note="prologue (measured directly) = warm Ruiz "
             f"({scfg.scaling_warm_iters} sweeps) + K build + warm "
             "Newton-Schulz; overlap = prologue + kernel - full solve "
             "(XLA pipelines the stages)",
    )

    # ---- 3. pallas_sysid --------------------------------------------------
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from racinglmpc_tpu.ops import pallas_sysid

        N = cfg.lmpc.N
        t_sysid = _slope_time(scan_of(
            lambda sx, su, ss, xl, ul: jax.vmap(
                lambda a, b, c2, d, e: pallas_sysid.local_linearization_horizon(
                    type(state.store)(x=a, u=b, steps=c2), trk, d, e,
                    cfg.lmpc, 0.1))(sx, su, ss, xl, ul),
            state.store.x, state.store.u, state.store.steps,
            state.x_lin[:, :N], state.u_lin))
        K_l, T = cfg.lmpc.model_laps, cfg.lmpc.model_pts
        NQ, knn = 16, cfg.lmpc.knn_max
        mac_sysid = K_l * (5 * NQ * T                  # distance lane_bcasts
                           + knn * (3 * NQ * T + NQ * T * 16))  # rounds+gather
        flops_sysid = float(2 * mac_sysid * B)
        bytes_sysid = B * 4.0 * (K_l * 8 * T + K_l * T * 16 + NQ * 8
                                 + NQ * 16 + NQ * 64)
        rows["pallas_sysid"] = dict(
            wall_ms=t_sysid * 1e3, flops=flops_sysid, hbm_bytes=bytes_sysid,
            tflops=flops_sysid / t_sysid / 1e12,
            gbps=bytes_sysid / t_sysid / 1e9,
            pct_f32_highest=100 * flops_sysid / t_sysid / PEAK_F32_HIGHEST,
            bound="VPU lane-reductions + serial grid (one scenario/program)",
        )

        # ---- 4. pallas_rollout --------------------------------------------
        from racinglmpc_tpu.ops.pallas_rollout import plant_step_batch

        u_apply = state.u_pred[:, 0]
        # the rollout is ~tens of us per call: a 10-rep slope is below timer
        # noise (round 3 committed wall 0.0 -> tflops 156x peak); resolve it
        # with a 480-rep slope instead
        t_roll = _slope_time(scan_of(
            lambda px, pxg, uu: plant_step_batch(px, pxg, uu, vp, trk,
                                                 cfg.sim),
            plant.x, plant.x_glob, u_apply), r_lo=32, r_hi=512)
        # ~60 VPU flops x 2 frames x 100 substeps per scenario (elementwise;
        # no MXU work)
        flops_roll = float(2 * 60 * 100 * B)
        bytes_roll = B * 4.0 * (6 * 4 + 2)
        rows["pallas_rollout"] = dict(
            wall_ms=t_roll * 1e3, flops=flops_roll, hbm_bytes=bytes_roll,
            tflops=flops_roll / t_roll / 1e12,
            gbps=bytes_roll / t_roll / 1e9,
            bound="VPU elementwise, substep-serial; negligible share",
        )

    out_doc = {
        "metric": "pallas_kernel_roofline",
        "batch": B,
        "device": jax.devices()[0].platform,
        "peaks": {"bf16_tflops": PEAK_BF16 / 1e12,
                  "f32_highest_tflops_est": PEAK_F32_HIGHEST / 1e12,
                  "m1_matvec_tflops_est": PEAK_F32_M1 / 1e12,
                  "hbm_gbps": HBM_GBPS / 1e9},
        "kernels": {k: {kk: (round(vv, 3) if isinstance(vv, float) else vv)
                        for kk, vv in v.items()} for k, v in rows.items()},
    }
    path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_mfu_roofline.json")
    with open(path, "w") as f:
        json.dump(out_doc, f, indent=1)
    print(json.dumps(out_doc))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
