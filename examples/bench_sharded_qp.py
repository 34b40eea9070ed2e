"""Giant-QP capacity demonstration for the cross-chip sharded solver.

Exercises ``ops/qp_sharded.py`` (SURVEY §5.8: ONE dense QP's blocks reduced
via collectives) at sizes far beyond the product FTOCP (n=200):

- on the virtual 8-device CPU mesh: correctness + p-way block placement at
  n in the thousands (per-device rows = n/p — the memory-capacity story);
- on a real TPU: the same program at giant n on however many chips are
  attached (a 1-device mesh degenerates the collectives but exercises the
  identical program and proves the *indirect* path's capacity headroom —
  the dense batched solver would need the n^2 KKT inverse resident per
  problem, which at n=16384 is 1 GiB before Newton-Schulz temporaries).

The problem is a synthetic strongly-convex QP generated ON DEVICE (a host
round-trip of an n^2 matrix would dominate at giant n): P = M'M/n + 0.5 I
with M ~ N(0,1), box-active inequalities and a few equalities.

Writes one JSON line per size; artifact committed as
``BENCH_sharded_qp_demo.json``.

Usage:
  python examples/bench_sharded_qp.py --backend cpu --sizes 1024,4096
  python examples/bench_sharded_qp.py --backend tpu --sizes 8192,16384
  python examples/bench_sharded_qp.py --backend cpu --table --sizes 64,256,1024
      (accuracy-vs-n table: unscaled residuals with/without the refinement
       tail, plus max|x - x_oracle| where the f64 interior-point oracle is
       tractable — round-4 verdict item 4)
  python examples/bench_sharded_qp.py --backend tpu --ftocp --horizons 512,1024
      (REAL giant-horizon LMPC FTOCPs assembled through the product
       controllers/ocp.py path — controllers/giant_ftocp.py — instead of
       synthetic random matrices; round-4 verdict item 3)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

if "--backend" in sys.argv:
    _b = sys.argv[sys.argv.index("--backend") + 1]
    if _b == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

import jax
import jax.numpy as jnp

if "--backend" in sys.argv and sys.argv[sys.argv.index("--backend") + 1] == "cpu":
    # sitecustomize already imported jax (axon TPU plugin), so the env var
    # alone is too late — force the platform the way tests/conftest.py does.
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from racinglmpc_tpu.ops import qp as qp_mod  # noqa: E402
from racinglmpc_tpu.ops import qp_sharded  # noqa: E402
from racinglmpc_tpu.parallel import make_mesh  # noqa: E402


def _make_giant_qp(key, n: int, me: int, mi: int, dt=jnp.float32):
    """Strongly-convex synthetic QP, built on device."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    M = jax.random.normal(k1, (n, n), dt)
    P = M.T @ M / n + 0.5 * jnp.eye(n, dtype=dt)
    q = jax.random.normal(k2, (n,), dt)
    G = jax.random.normal(k3, (me, n), dt)
    F = jax.random.normal(k4, (mi, n), dt)
    z0 = jax.random.normal(k5, (n,), dt) * 0.3
    g = G @ z0
    b = F @ z0 + jnp.abs(jax.random.normal(k6, (mi,), dt)) + 0.05
    A = jnp.concatenate([F, G], axis=0)
    inf = jnp.asarray(jnp.inf, dt)
    l = jnp.concatenate([jnp.full((mi,), -inf), g])
    u = jnp.concatenate([b, g])
    return qp_mod.QPData(P, q, A, l, u)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--sizes", default="1024,4096")
    ap.add_argument("--max-iter", type=int, default=500)
    ap.add_argument("--table", action="store_true",
                    help="accuracy-vs-n table (residuals +/- polish, "
                         "vs-oracle error up to n=1024)")
    ap.add_argument("--ftocp", action="store_true",
                    help="giant-horizon FTOCPs assembled via ocp.py "
                         "(controllers/giant_ftocp.py) instead of synthetic")
    ap.add_argument("--horizons", default="512,1024",
                    help="FTOCP horizons for --ftocp")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    devices = jax.devices()
    mesh = make_mesh(devices, axis_name=qp_sharded.BLOCK_AXIS)
    p = mesh.devices.size
    rows = []

    if args.ftocp:
        from racinglmpc_tpu.controllers import giant_ftocp
        from racinglmpc_tpu.models import track as track_mod
        from racinglmpc_tpu.runtime import experiment as exp
        from racinglmpc_tpu.utils.config import LMPCConfig

        cfgx = exp.ExperimentConfig(stage_steps=420)
        pid = exp.run_experiment(jax.random.PRNGKey(0), cfgx, batch=1,
                                 stages="pid")
        trk = track_mod.make_track()
        for N in [int(h) for h in args.horizons.split(",")]:
            t0 = time.perf_counter()
            giant = giant_ftocp.assemble_giant_ftocp(
                trk, pid.pid.x[0], pid.pid.u[0], pid.pid.steps[0],
                N=N, K=48, cfg=LMPCConfig(), dtype=jnp.float32)
            jax.block_until_ready(giant.qp.P)
            t_asm = time.perf_counter() - t0
            cfg = qp_sharded.ShardedSolverConfig(max_iter=args.max_iter)
            t0 = time.perf_counter()
            sol = qp_sharded.solve_sharded(giant.qp, mesh, cfg=cfg)
            jax.block_until_ready(sol.x)
            t_cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            sol = qp_sharded.solve_sharded(giant.qp, mesh, cfg=cfg)
            jax.block_until_ready(sol.x)
            t_warm = time.perf_counter() - t0
            import numpy as np
            lam = np.asarray(sol.x)[giant.dims.off_lambda:
                                    giant.dims.off_lambda + giant.dims.K]
            n, m = giant.dims.nz, giant.qp.A.shape[0]
            row = {
                "source": "ocp_assembly", "N": N, "n": n, "m": m,
                "devices": p, "backend": args.backend,
                "solved": bool(sol.solved),
                "pri_res": float(sol.pri_res), "dua_res": float(sol.dua_res),
                "admm_iters": int(sol.iters), "cg_iters": int(sol.cg_iters),
                "assemble_s": round(t_asm, 3),
                "wall_s_cold": round(t_cold, 3), "wall_s": round(t_warm, 3),
                "lambda_sum": round(float(lam.sum()), 5),
                "lambda_min": float(lam.min()),
                "per_device_block_mb": round(
                    (n * n + m * n) // p * 4 / 2**20, 1),
            }
            rows.append(row)
            print(json.dumps(row))
        if args.out:
            with open(args.out, "w") as f:
                json.dump({"metric": "sharded_giant_ftocp", "rows": rows}, f,
                          indent=1)
            print("wrote", args.out)
        return

    if args.table:
        import numpy as np
        for n in [int(s) for s in args.sizes.split(",")]:
            me, mi = n // 16, n // 4
            qp = _make_giant_qp(jax.random.PRNGKey(0), n, me, mi)
            jax.block_until_ready(qp.P)
            row = {"n": n, "m": me + mi, "devices": p,
                   "backend": args.backend}
            for tag, pol in (("nopolish", False), ("polish", True)):
                cfg = qp_sharded.ShardedSolverConfig(
                    max_iter=args.max_iter, polish=pol)
                sol = qp_sharded.solve_sharded(qp, mesh, cfg=cfg)
                jax.block_until_ready(sol.x)
                row[f"pri_{tag}"] = float(sol.pri_res)
                row[f"dua_{tag}"] = float(sol.dua_res)
                row[f"solved_{tag}"] = bool(sol.solved)
                if n <= 1024:
                    from tests.oracles import qp_ip
                    P64 = np.asarray(qp.P, np.float64)
                    A64 = np.asarray(qp.A, np.float64)
                    l64 = np.asarray(qp.l, np.float64)
                    u64 = np.asarray(qp.u, np.float64)
                    eq = np.isfinite(l64) & (u64 - l64 < 1e-9)
                    z_ref, *_, ok = qp_ip.solve_qp(
                        P64, np.asarray(qp.q, np.float64),
                        A64[eq], u64[eq], A64[~eq], u64[~eq])
                    if ok:
                        row[f"err_vs_oracle_{tag}"] = float(
                            np.abs(np.asarray(sol.x) - z_ref).max())
            rows.append(row)
            print(json.dumps(row))
        if args.out:
            with open(args.out, "w") as f:
                json.dump({"metric": "sharded_qp_accuracy_table",
                           "rows": rows}, f, indent=1)
            print("wrote", args.out)
        return

    for n in [int(s) for s in args.sizes.split(",")]:
        me, mi = n // 16, n // 4
        qp = _make_giant_qp(jax.random.PRNGKey(0), n, me, mi)
        jax.block_until_ready(qp.P)
        m = qp.A.shape[0]
        # capacity row: tail off (the wall-time story); quality row: tail on
        cfg0 = qp_sharded.ShardedSolverConfig(max_iter=args.max_iter,
                                              polish=False)
        cfg1 = qp_sharded.ShardedSolverConfig(max_iter=args.max_iter)

        t0 = time.perf_counter()
        sol = qp_sharded.solve_sharded(qp, mesh, cfg=cfg0)
        jax.block_until_ready(sol.x)
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        sol = qp_sharded.solve_sharded(qp, mesh, cfg=cfg0)
        jax.block_until_ready(sol.x)
        t_warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        sol_p = qp_sharded.solve_sharded(qp, mesh, cfg=cfg1)
        jax.block_until_ready(sol_p.x)
        t_pol = time.perf_counter() - t0

        blk_bytes = (n * n + m * n) // p * qp.P.dtype.itemsize
        row = {
            "n": n, "m": m, "devices": p, "backend": args.backend,
            "solved": bool(sol.solved),
            "pri_res": float(sol.pri_res), "dua_res": float(sol.dua_res),
            "admm_iters": int(sol.iters), "cg_iters": int(sol.cg_iters),
            "wall_s_cold": round(t_cold, 3), "wall_s": round(t_warm, 3),
            "pri_res_refined": float(sol_p.pri_res),
            "dua_res_refined": float(sol_p.dua_res),
            "wall_s_refined": round(t_pol, 3),
            "per_device_block_mb": round(blk_bytes / 2**20, 1),
            "dense_kinv_mb_if_single": round(n * n * 4 / 2**20, 1),
        }
        rows.append(row)
        print(json.dumps(row))

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"metric": "sharded_giant_qp_demo", "rows": rows}, f,
                      indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
