"""On-TPU numerics smoke lane (round-4 verdict item 7).

The CPU test suite forces an 8-device CPU mesh (tests/conftest.py), so a
Mosaic/TPU-only regression — the class of bug where a Pallas kernel
silently returns unwritten buffers, or an x64-trace literal fails to
legalize (commit c0bd380) — is invisible between bench runs. This script is
ONE bounded command that exercises every TPU-lowered kernel on the real
backend and checks it against its XLA twin:

  1. Pallas ADMM QP kernel vs the XLA ADMM path on a batch of assembled
     FTOCPs (the product problem family, built through controllers/ocp.py);
  2. the in-kernel rho-escalation rescue stage (forced by an undersized
     main-loop budget) — must engage and reach its primal exit;
  3. the structured block-tridiagonal KKT inverse residual on TPU;
  4. fused Pallas sys-ID kernel vs models/sysid.py;
  5. fused Pallas plant-rollout kernel vs the XLA plant step.

Prints one PASS/FAIL line per check and exits non-zero on any failure.
Runtime is compile-dominated (~2-4 min cold). Run:

    python examples/tpu_smoke.py
"""
from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses  # noqa: E402

from racinglmpc_tpu.controllers import ocp  # noqa: E402
from racinglmpc_tpu.models import sysid, track as track_mod  # noqa: E402
from racinglmpc_tpu.models.dynamics import PlantState, plant_step  # noqa: E402
from racinglmpc_tpu.ops import kkt_band, pallas_rollout, pallas_sysid  # noqa: E402
from racinglmpc_tpu.ops import qp as qp_mod  # noqa: E402
from racinglmpc_tpu.utils.config import (  # noqa: E402
    LMPCConfig,
    SimConfig,
    SolverConfig,
    VehicleParams,
)

FAILED = []


def check(name, ok, detail=""):
    status = "PASS" if ok else "FAIL"
    print(f"[tpu_smoke] {status} {name} {detail}", flush=True)
    if not ok:
        FAILED.append(name)


def ftocp_batch(B=32, seed=0, dtype=jnp.float32):
    """Batch of realistic LMPC FTOCPs through the product assembly path."""
    cfg = LMPCConfig()
    rng = np.random.default_rng(seed)
    dims, tmpl = ocp.make_templates(
        N=cfg.N, Q=cfg.Q, R=cfg.R, dR=cfg.dR, Qf=(0.0,) * 6,
        q_slack=cfg.q_slack, x_ref=(0.0,) * 6,
        ey_max=cfg.ey_max, delta_max=cfg.delta_max, a_max=cfg.a_max,
        K=cfg.num_ss_points, q_terminal_slack=cfg.q_terminal_slack,
        dtype=dtype,
    )

    def one(seed_i):
        r = np.random.default_rng(seed_i)
        A = jnp.asarray(np.eye(6) + 0.05 * r.normal(size=(cfg.N, 6, 6)),
                        dtype)
        Bm = jnp.asarray(0.1 * r.normal(size=(cfg.N, 6, 2)), dtype)
        C = jnp.asarray(0.01 * r.normal(size=(cfg.N, 6)), dtype)
        x0 = jnp.asarray([0.5 + 0.3 * r.uniform(), 0, 0, 0, 0,
                          0.2 * r.normal()], dtype)
        ss = jnp.asarray(r.normal(size=(6, cfg.num_ss_points)), dtype)
        qf = jnp.asarray(r.uniform(1, 50, cfg.num_ss_points), dtype)
        return ocp.assemble_qp(dims, tmpl, ocp.StageDynamics(A, Bm, C), x0,
                               jnp.zeros(2, dtype), cfg.dR, ss_points=ss,
                               qfun_sel=qf)
    qps = [one(int(s)) for s in rng.integers(0, 2**31, B)]
    qp = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *qps)
    return dims, qp


def main():
    on_tpu = jax.default_backend() == "tpu"
    print(f"[tpu_smoke] backend: {jax.default_backend()} {jax.devices()}")
    if not on_tpu:
        print("[tpu_smoke] FAIL not-on-tpu (this lane must run on the real "
              "backend)")
        sys.exit(2)

    dims, qp = ftocp_batch()
    st_band = kkt_band.band_structure(dims.N, dims.K)

    # --- 1. Pallas kernel vs XLA ADMM path: FIXED-ITERATION parity --------
    # Tolerance-exited near-optima from two different iteration schedules
    # legitimately differ by ~1e-2 along the FTOCP's soft directions, so the
    # miscompile check forces BOTH paths through EXACTLY the same math:
    # eps = 0 (no early exit), identical fixed iteration budget, rescue
    # off. Correct lowerings then agree to f32 rounding; a Mosaic
    # miscompile (unwritten buffers, wrong dot lowering, bad predication)
    # shows up as wholesale divergence.
    base = dataclasses.replace(
        SolverConfig.throughput(), kkt_structured=False)
    # 16 iterations: every dot/elementwise op in the loop executes
    # repeatedly. Measured legitimate divergence between the kernel's
    # row-vector dots and XLA's GEMMs is ~2-3e-3 (f32 rounding amplified
    # through the ~1e5-conditioned x-update; constant in iteration count),
    # so the threshold sits an order above that and orders below
    # miscompile-class garbage (unwritten buffers / wrong lowerings give
    # O(1)-to-NaN divergence)
    fixed = dataclasses.replace(
        base, eps_abs=0.0, eps_rel=0.0, max_iter=16, warmup_iters=16,
        check_every=16, rescue_max_iter=0, polish=False)
    fixed_x = dataclasses.replace(fixed, use_pallas=False)
    sol_p = jax.jit(lambda q: jax.vmap(
        lambda p: qp_mod.solve(p, fixed))(q))(qp)
    sol_x = jax.jit(lambda q: jax.vmap(
        lambda p: qp_mod.solve(p, fixed_x))(q))(qp)
    dlane = np.abs(np.asarray(sol_p.x) - np.asarray(sol_x.x)).max(axis=1)
    du = float(dlane.max())
    B = qp.P.shape[0]
    check("pallas_kernel_vs_xla_fixed_iter", du < 3e-2,
          f"(16 fixed iterations, max|dx| {du:.1e})")
    # and the normal tolerance-exited run must solve the batch
    sol_t = jax.jit(lambda q: jax.vmap(
        lambda p: qp_mod.solve(p, base))(q))(qp)
    n_ok = int(np.asarray(sol_t.solved).sum())
    check("pallas_kernel_solves_batch", n_ok >= 0.9 * B,
          f"(solved {n_ok}/{B})")
    # unwritten-buffer regression guard: outputs must not be all-zero/NaN
    check("pallas_kernel_outputs_written",
          bool(jnp.all(jnp.isfinite(sol_p.x)))
          and float(jnp.max(jnp.abs(sol_p.x))) > 1e-6)

    # --- 2. rescue stage engages under an undersized main budget ----------
    cfg_rescue = dataclasses.replace(base, max_iter=8, check_every=4,
                                     rescue_max_iter=300)
    sol_r = jax.jit(lambda q: jax.vmap(
        lambda p: qp_mod.solve(p, cfg_rescue))(q))(qp)
    pri = np.asarray(sol_r.pri_res)
    iters = np.asarray(sol_r.iters)
    engaged = int((iters > 8).sum())
    check("rescue_stage_engages",
          engaged > 0 and float(pri.max()) < cfg_rescue.rescue_exit * 10,
          f"(engaged {engaged}/{B}, pri max {pri.max():.1e})")

    # --- 3. structured KKT inverse residual on TPU ------------------------
    with jax.default_matmul_precision("highest"):
        is_eq = jnp.isfinite(qp.l) & jnp.isfinite(qp.u) & (qp.u - qp.l < 1e-12)
        rho = jnp.where(is_eq, base.rho * base.rho_eq_scale,
                        base.rho).astype(jnp.float32)
        scaled = jax.jit(jax.vmap(
            lambda p: qp_mod._ruiz_equilibrate(p, 10)))(qp)
        K = jax.jit(jax.vmap(
            lambda p, r: qp_mod._build_K(p, r, base.sigma)))(scaled[0], rho)
        X = jax.jit(jax.vmap(
            lambda k: kkt_band.structured_kinv(k, st_band)))(K)
        I = jnp.eye(dims.nz, dtype=jnp.float32)
        resid = float(jnp.max(jnp.abs(I - K @ X)))
    check("structured_kinv_residual", resid < 5e-2, f"(max {resid:.1e})")

    # --- 4. fused sys-ID kernel vs XLA ------------------------------------
    T = 128
    lcfg = LMPCConfig(model_laps=4, model_pts=T)
    trk = track_mod.make_track()
    rng = np.random.default_rng(3)
    store = sysid.make_lap_store(lcfg.model_laps, T, dtype=jnp.float32)
    for steps in (100, 120, 90, 110):
        x = np.zeros((steps, 6), np.float32)
        x[:, 0] = 1.0 + 0.5 * rng.standard_normal(steps)
        x[:, 1] = 0.1 * rng.standard_normal(steps)
        x[:, 2] = 0.3 * rng.standard_normal(steps)
        x[:, 4] = np.linspace(0, 19.0, steps)
        x[:, 5] = 0.2 * rng.standard_normal(steps)
        u = 0.3 * rng.standard_normal((steps, 2)).astype(np.float32)
        store = sysid.add_lap(store, jnp.asarray(x), jnp.asarray(u),
                              jnp.int32(steps))
    xq = jnp.asarray(np.stack([
        1.0 + 0.3 * rng.standard_normal(14),
        0.1 * rng.standard_normal(14),
        0.2 * rng.standard_normal(14),
        0.1 * rng.standard_normal(14),
        np.linspace(0.5, 18.0, 14),
        0.2 * rng.standard_normal(14)], axis=1).astype(np.float32))
    uq = jnp.asarray(0.3 * rng.standard_normal((14, 2)).astype(np.float32))
    A_x, B_x, C_x = jax.jit(lambda: sysid.local_linearization_horizon(
        store, trk, xq, uq, lcfg, 0.1))()
    A_p, B_p, C_p = jax.jit(lambda: pallas_sysid.local_linearization_horizon(
        store, trk, xq, uq, lcfg, 0.1))()
    d_sys = max(float(jnp.max(jnp.abs(A_x - A_p))),
                float(jnp.max(jnp.abs(B_x - B_p))),
                float(jnp.max(jnp.abs(C_x - C_p))))
    check("pallas_sysid_vs_xla", d_sys < 1e-3, f"(max diff {d_sys:.1e})")

    # --- 5. fused rollout kernel vs XLA plant step ------------------------
    sim = SimConfig(noise=False)
    vp = VehicleParams()
    xb = jnp.asarray(np.stack([
        1.0 + 0.2 * rng.standard_normal(16),
        0.05 * rng.standard_normal(16),
        0.1 * rng.standard_normal(16),
        0.05 * rng.standard_normal(16),
        np.linspace(0.1, 18.0, 16),
        0.1 * rng.standard_normal(16)], axis=1).astype(np.float32))
    ub = jnp.asarray(0.2 * rng.standard_normal((16, 2)).astype(np.float32))
    ox, oxg = jax.jit(lambda: pallas_rollout.plant_step_batch(
        xb, xb, ub, vp, trk, sim))()
    ref = jax.jit(jax.vmap(lambda x, u: plant_step(
        PlantState(x=x, x_glob=x), u, vp, trk, sim, None)))(xb, ub)
    d_roll = max(float(jnp.max(jnp.abs(ox - ref.x))),
                 float(jnp.max(jnp.abs(oxg - ref.x_glob))))
    check("pallas_rollout_vs_xla", d_roll < 1e-4, f"(max diff {d_roll:.1e})")

    print(f"[tpu_smoke] {'FAILED: ' + ', '.join(FAILED) if FAILED else 'all checks passed'}")
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
