"""Replay QPs captured by examples/probe_rejects.py under candidate solver
configurations (round-4 item 1: root-cause the late-lap rejection bursts).

For every captured snapshot (rejected solves + accepted controls) this:
  1. solves it with the vendored f64 interior-point oracle (feasibility +
     reference optimum),
  2. re-solves it with the EXACT production path (ops/qp.solve, throughput
     preset, the captured warm start + FactorCache) — the reject must
     reproduce,
  3. sweeps candidate fixes: rho multipliers, fresh equilibration, cold
     start, larger iteration budget, adaptive rho (XLA path),
and prints a per-snapshot table + per-variant accept counts.

Run ON TPU (the kernel's numerics are the object under study):
    python -m examples.replay_rejects [--snaps /tmp/reject_probe/snaps.npz]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from racinglmpc_tpu.ops import qp as qp_mod
from racinglmpc_tpu.utils.config import SolverConfig

from tests.oracles import qp_ip


def batched_solve(cfg: SolverConfig, d, *, use_fac=True, use_warm=True,
                  force_refresh=False):
    """Solve all snapshots (leading axis) under ``cfg`` on-device."""
    B = d["P"].shape[0]
    qp = qp_mod.QPData(
        P=jnp.asarray(d["P"]), q=jnp.asarray(d["q"]), A=jnp.asarray(d["A"]),
        l=jnp.asarray(d["l"]), u=jnp.asarray(d["u"]),
    )
    if use_fac:
        valid = jnp.asarray(d["fvalid"]) & (not force_refresh)
        # age=1 so the refresh-every-K schedule does not trigger unless asked
        age = jnp.where(
            jnp.asarray(force_refresh), jnp.zeros(B, jnp.int32),
            jnp.ones(B, jnp.int32),
        )
        fac = qp_mod.FactorCache(
            kinv=jnp.asarray(d["kinv"]), D=jnp.asarray(d["fD"]),
            E=jnp.asarray(d["fE"]), c=jnp.asarray(d["fc"]),
            valid=valid, age=age,
        )
    else:
        fac = jax.vmap(
            lambda _: qp_mod.init_factor_cache(
                d["P"].shape[1], d["A"].shape[1])
        )(jnp.arange(B))
    if use_warm:
        warm = (jnp.asarray(d["warm_x"]), jnp.asarray(d["warm_y"]))
    else:
        warm = (jnp.zeros_like(jnp.asarray(d["warm_x"])),
                jnp.zeros_like(jnp.asarray(d["warm_y"])))

    sol = jax.jit(
        jax.vmap(lambda p, w, f: qp_mod.solve(p, cfg, warm=w, fac=f))
    )(qp, warm, fac)
    return {
        "pri": np.asarray(sol.pri_res), "dua": np.asarray(sol.dua_res),
        "iters": np.asarray(sol.iters), "solved": np.asarray(sol.solved),
        "x": np.asarray(sol.x),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snaps", default="/tmp/reject_probe/snaps.npz")
    ap.add_argument("--skip-oracle", action="store_true")
    args = ap.parse_args()
    d = dict(np.load(args.snaps))
    B = d["P"].shape[0]
    rej = d["rejected"].astype(bool)
    print(f"{B} snapshots ({rej.sum()} rejected, {(~rej).sum()} controls); "
          f"backend={jax.default_backend()}", file=sys.stderr)

    # ---- oracle (f64 IP) --------------------------------------------------
    oracle = []
    if not args.skip_oracle:
        for i in range(B):
            l, u = d["l"][i].astype(np.float64), d["u"][i].astype(np.float64)
            A = d["A"][i].astype(np.float64)
            eq = np.isfinite(l)
            z, _, _, conv = qp_ip.solve_qp(
                d["P"][i].astype(np.float64), d["q"][i].astype(np.float64),
                G=A[eq], g=u[eq], F=A[~eq], b=u[~eq],
            )
            Ax = A @ z
            pri = np.max(np.abs(Ax - np.clip(Ax, l, u)))
            oracle.append({"conv": bool(conv), "pri": float(pri)})
            print(f"  oracle {i}: conv={conv} pri={pri:.2e}", file=sys.stderr)

    # ---- variants on the real solver --------------------------------------
    base = SolverConfig.throughput()
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        base = dataclasses.replace(base, use_pallas=False)
    variants = {
        "base(repro)": (base, {}),
        "cold_scaling": (base, {"force_refresh": True}),
        "cold_start": (base, {"use_warm": False}),
        "cold_both": (base, {"use_warm": False, "force_refresh": True}),
        "max_iter_3000": (dataclasses.replace(base, max_iter=3000), {}),
        "rho_x0.2": (dataclasses.replace(base, rho=base.rho * 0.2), {}),
        "rho_x5": (dataclasses.replace(base, rho=base.rho * 5), {}),
        "rho_x25": (dataclasses.replace(base, rho=base.rho * 25), {}),
        "rho_x100": (dataclasses.replace(base, rho=base.rho * 100), {}),
        "eqscale_x10": (
            dataclasses.replace(base, rho_eq_scale=base.rho_eq_scale * 10),
            {}),
        "adaptive_xla": (
            dataclasses.replace(base, use_pallas=False, adaptive_rho=True,
                                max_iter=600),
            {}),
    }

    results = {}
    for name, (cfg, kw) in variants.items():
        r = batched_solve(cfg, d, **kw)
        acc = r["pri"] < base.accept_pri_res
        results[name] = r
        print(f"{name:16s} accepted {int(acc.sum())}/{B} "
              f"(rejected-snaps accepted: "
              f"{int((acc & rej).sum())}/{int(rej.sum())}) "
              f"iters p50 {int(np.percentile(r['iters'], 50))}",
              file=sys.stderr)

    # ---- per-snapshot table ------------------------------------------------
    hdr = ["idx", "lap", "t", "rej", "pri0", "it0"] + list(variants)
    print("\t".join(hdr))
    for i in range(B):
        row = [str(i), str(int(d["lap"][i])), str(int(d["t"][i])),
               str(int(d["rejected"][i])),
               f"{float(d['pri'][i]):.1e}", str(int(d["iters"][i]))]
        for name in variants:
            r = results[name]
            row.append(f"{r['pri'][i]:.1e}/{int(r['iters'][i])}")
        print("\t".join(row))

    summary = {
        name: {
            "accept_all": int((results[name]["pri"]
                               < base.accept_pri_res).sum()),
            "accept_rejected": int(((results[name]["pri"]
                                     < base.accept_pri_res) & rej).sum()),
            "n_rejected": int(rej.sum()), "n": B,
        }
        for name in variants
    }
    if oracle:
        summary["oracle_converged"] = int(sum(o["conv"] for o in oracle))
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
