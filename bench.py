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
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
On failure the line is still printed, with value 0 and an "error" field
(the TPU tunnel here can wedge for minutes; the scoreboard artifact must
degrade to a diagnostic record, never to an empty file). Backend init is
probed in a bounded subprocess with retry/backoff BEFORE the measurement;
probe children are never killed (a killed TPU client can wedge the tunnel's
remote lease cleanup for 10+ minutes — observed in round 2).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_SOLVES_PER_S = 45.0  # reference single-problem CPU (SURVEY §6)
_METRIC = "lmpc_full_step_qp_solves_per_s_per_chip"
_UNIT = "solves/s (N=14, full control step incl. sys-ID)"

_PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((256, 256));"
    "(x @ x).block_until_ready();"
    "print('backend:', jax.default_backend(), jax.devices())"
)


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe_backend(attempt_timeout_s: float = 150.0,
                  total_budget_s: float = 600.0) -> bool:
    """Verify the JAX backend initializes and runs one op, in a subprocess.

    Retries with backoff for up to ``total_budget_s``. A child that exceeds
    ``attempt_timeout_s`` is NOT killed — killing a TPU client mid-init can
    wedge the tunnel's lease cleanup for 10+ minutes (round-2 incident); we
    keep waiting on the same child until the total budget instead, and on
    final failure leave it to exit on its own.
    """
    deadline = time.time() + total_budget_s
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        _log(f"[bench] backend probe attempt {attempt}...")
        child = subprocess.Popen(
            [sys.executable, "-c", _PROBE_SRC],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        warned = False
        while True:
            rc = child.poll()
            if rc is not None:
                break
            now = time.time()
            if now - t0 > attempt_timeout_s and not warned:
                _log(f"[bench] probe slow (> {attempt_timeout_s:.0f}s); "
                     "waiting (never killing a TPU client)...")
                warned = True
            if now > deadline:
                _log(f"[bench] probe still hung at total budget "
                     f"({total_budget_s:.0f}s); giving up (child left to "
                     "exit on its own)")
                return False
            time.sleep(2.0)
        out, err = child.communicate()
        if rc == 0:
            _log(f"[bench] probe ok in {time.time() - t0:.1f}s: "
                 f"{out.strip()}")
            return True
        _log(f"[bench] probe failed (rc={rc}) in {time.time() - t0:.1f}s; "
             f"stderr tail: {err.strip()[-400:]}")
        if time.time() + 30.0 > deadline:
            return False
        time.sleep(min(30.0, max(deadline - time.time(), 0.0)))


CONVERGED_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures", "converged_laps_v1.npz")


def _run_gate_laps(cfg, trk, vp, seed_laps, key, *, laps, batch, chunk,
                   max_steps, log):
    """Run a batched LMPC session seeded with ``seed_laps`` and collect
    per-lap mean steps / rejected / unconverged counts."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from racinglmpc_tpu.controllers import lmpc as lmpc_mod
    from racinglmpc_tpu.models.dynamics import PlantState
    from racinglmpc_tpu.runtime import experiment as exp
    from racinglmpc_tpu.runtime import loop as loop_mod

    L = trk.total_len
    # seed laps + quality laps must fit the safe-set capacity
    lcfg = dataclasses.replace(cfg.lmpc, max_laps=cfg.lmpc.num_ss_it + laps + 2)
    step = lmpc_mod.make_lmpc(lcfg, trk, cfg.solver, cfg.sim.dt)

    def seed_one(_):
        st = lmpc_mod.init_lmpc_state(lcfg)
        for x_s, u_s, xg_s, st_s in seed_laps:
            st = lmpc_mod.lmpc_add_trajectory(
                st, lcfg, x_s, u_s, xg_s, st_s, L
            )
        return st

    state = jax.jit(jax.vmap(seed_one))(jnp.arange(batch))
    x0 = jnp.tile(jnp.asarray([0.5, 0, 0, 0, 0, 0], jnp.float32), (batch, 1))
    plant = PlantState(x=x0, x_glob=x0)

    # per-step diagnostics: controller-level rejection AND the weaker
    # "accepted but missed tolerance" event (round-4 verdict item 2)
    collect = lambda st: {  # noqa: E731
        "rej": st.rejects > 0,
        "unconv": jnp.logical_not(st.feasible),
    }

    if exp.fused_rollout_ok(cfg.sim):
        runner = jax.jit(lambda cs, pl, ks, d0, s0: loop_mod.run_lap_fused(
            step, cs, pl, ks, trk=trk, vp=vp, sim_cfg=cfg.sim,
            max_steps=chunk, multi_lap=False, done0=d0, step0=s0,
            collect_fn=collect,
        ))
    else:
        runner = jax.jit(jax.vmap(
            lambda cs, pl, k, d0, s0: loop_mod.run_lap(
                step, cs, pl, k, trk=trk, vp=vp, sim_cfg=cfg.sim,
                max_steps=chunk, multi_lap=False, done0=d0, step0=s0,
                collect_fn=collect,
            ),
            in_axes=(0, 0, 0, 0, None),
        ))

    add_lap = jax.jit(jax.vmap(
        lambda st, x, u, xg, s: lmpc_mod.lmpc_add_trajectory(
            st, lcfg, x, u, xg, s, L
        )
    ))

    lap_steps_mean, rejects_per_lap, unconv_per_lap = [], [], []
    for lap in range(laps):
        keys = jax.random.split(jax.random.fold_in(key, lap), batch)
        done = jnp.zeros(batch, bool)
        xs, us, xgs, masks, rejs, uncs = [], [], [], [], [], []
        s0 = 0
        while s0 < max_steps:
            res = runner(state, plant, keys, done, jnp.int32(s0))
            state, plant, done = res.ctrl_state, res.plant_final, res.done
            xs.append(res.x)
            us.append(res.u)
            xgs.append(res.x_glob)
            masks.append(res.mask)
            rejs.append(res.collected["rej"])
            uncs.append(res.collected["unconv"])
            s0 += chunk
            if bool(jax.device_get(jnp.all(done))):
                break
        x = jnp.concatenate(xs, axis=1)
        u = jnp.concatenate(us, axis=1)
        xg = jnp.concatenate(xgs, axis=1)
        mask = jnp.concatenate(masks, axis=1)
        rej = jnp.concatenate(rejs, axis=1)
        unc = jnp.concatenate(uncs, axis=1)
        steps = jnp.sum(mask, axis=1).astype(jnp.int32)
        s_shift = jnp.zeros_like(plant.x).at[:, 4].set(L)
        plant = PlantState(x=plant.x - s_shift, x_glob=plant.x_glob)
        state = add_lap(state, x, u, xg, steps)
        lap_steps_mean.append(float(jnp.mean(steps)))
        rejects_per_lap.append(int(jnp.sum(rej & mask)))
        unconv_per_lap.append(int(jnp.sum(unc & mask)))
        log(f"quality lap {lap}: mean steps {lap_steps_mean[-1]:.1f}, "
            f"rejects {rejects_per_lap[-1]}, "
            f"unconverged {unconv_per_lap[-1]}")
    return lap_steps_mean, rejects_per_lap, unconv_per_lap


def quality_gate(cfg, trk, vp, x_seed, u_seed, xg_seed, steps_seed, key,
                 *, laps: int = 12, batch: int = 8, chunk: int = 100,
                 max_steps: int = 400, conv_laps: int = 8,
                 fixture: str = CONVERGED_FIXTURE,
                 log=lambda *a: None) -> dict:
    """On-TPU closed-loop quality check on the SAME preset bench measures.

    Round-4 verdict item 4: CPU CI cannot see TPU solver numerics, and a
    throughput "win" can hide a quality regression (round 3's preset was
    +21% solves/s and the quality-worst at 16 laps). Two phases:

    PHASE 1 (transient): a 12-lap batched LMPC session seeded with the
    bench's own PID lap; gates on the reference's implicit test — printed
    lap times decrease (`/root/reference/src/main.py:120-127`):

      improving:  mean steps of the last 3 laps < 0.6 x first lap
      no_spike:   for laps >= 6, mean steps <= 1.3 x best-so-far
                  (the round-3 late-lap burst was 1.43x)
      rejects:    rejected solves <= 0.5% of executed steps

    PHASE 2 (converged regime — round-4 verdict item 2): the same session
    re-seeded from committed CONVERGED laps (fixtures/converged_laps_v1.npz,
    generated by examples/make_converged_fixture.py), so the gated laps run
    at the 66-80-step pace where the hard FTOCPs live — the regime the
    round-3 preset degraded while the PID-seeded phase stayed green:

      conv_pace:   mean lap steps <= 1.15 x the fixture's seed-lap mean
      conv_spike:  every lap <= 1.3 x best-so-far
      conv_rejects / conv_unconverged: rejected <= 0.5%, unconverged
                   <= 20% of executed steps

    Returns a dict for the bench JSON line, including "pass" (all phases).
    """
    import os

    import numpy as np

    lap_steps_mean, rejects_per_lap, unconv_per_lap = _run_gate_laps(
        cfg, trk, vp,
        [(x_seed, u_seed, xg_seed, steps_seed)] * cfg.lmpc.num_ss_it,
        key, laps=laps, batch=batch, chunk=chunk, max_steps=max_steps,
        log=log)

    ls = np.asarray(lap_steps_mean)
    total_steps = float(ls.sum()) * batch
    improving = float(ls[-3:].mean()) < 0.6 * float(ls[0])
    best = np.minimum.accumulate(ls)
    no_spike = bool(np.all(ls[6:] <= 1.3 * best[5:-1]))
    rej_total = int(sum(rejects_per_lap))
    rejects_ok = rej_total <= 0.005 * total_steps
    out = {
        "laps_mean_steps": [round(v, 1) for v in lap_steps_mean],
        "rejects_per_lap": rejects_per_lap,
        "unconverged_per_lap": unconv_per_lap,
        "unconverged_rate": round(sum(unconv_per_lap)
                                  / max(total_steps, 1.0), 4),
        "batch": batch,
        "improving": bool(improving),
        "no_spike": bool(no_spike),
        "rejects_ok": bool(rejects_ok),
    }
    phase1 = bool(improving and no_spike and rejects_ok)

    # ---- phase 2: converged regime from the committed fixture -------------
    if os.path.exists(fixture):
        import jax.numpy as jnp

        fx = np.load(fixture)
        seed_laps = []
        for i in range(int(fx["n_laps"])):
            seed_laps.append((
                jnp.asarray(fx[f"x{i}"]), jnp.asarray(fx[f"u{i}"]),
                jnp.asarray(fx[f"xg{i}"]), jnp.int32(fx[f"steps{i}"])))
        seed_mean = float(fx["mean_steps"])
        c_steps, c_rej, c_unc = _run_gate_laps(
            cfg, trk, vp, seed_laps, key, laps=conv_laps, batch=batch,
            chunk=chunk, max_steps=max_steps, log=log)
        cs = np.asarray(c_steps)
        c_total = float(cs.sum()) * batch
        conv_pace = bool(cs.mean() <= 1.15 * seed_mean)
        cbest = np.minimum.accumulate(cs)
        conv_spike = bool(np.all(cs[1:] <= 1.3 * cbest[:-1]))
        conv_rej_ok = int(sum(c_rej)) <= 0.005 * c_total
        conv_unc_ok = int(sum(c_unc)) <= 0.20 * c_total
        out.update({
            "conv_seed_mean_steps": round(seed_mean, 1),
            "conv_laps_mean_steps": [round(v, 1) for v in c_steps],
            "conv_rejects_per_lap": c_rej,
            "conv_unconverged_per_lap": c_unc,
            "conv_unconverged_rate": round(sum(c_unc) / max(c_total, 1.0), 4),
            "conv_pace": conv_pace,
            "conv_spike_ok": conv_spike,
            "conv_rejects_ok": bool(conv_rej_ok),
            "conv_unconverged_ok": bool(conv_unc_ok),
        })
        phase2 = bool(conv_pace and conv_spike and conv_rej_ok
                      and conv_unc_ok)
    else:
        out["converged_phase"] = f"SKIPPED: no fixture at {fixture}"
        phase2 = True

    out["pass"] = bool(phase1 and phase2)
    return out


def _failure_record(stage: str, err: str) -> dict:
    rec = {
        "metric": _METRIC, "value": 0.0, "unit": _UNIT, "vs_baseline": 0.0,
        "error": f"{stage}: {err[:500]}",
    }
    print(json.dumps(rec), flush=True)
    return rec


def main(batch: int = 256, steps: int = 50, reps: int = 3,
         verbose: bool = False, pallas_rollout: bool = True) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

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

    log = _log if verbose else (lambda *a: None)
    # the fused Pallas kernels have TPU lowerings only — gate on the backend
    # so a plain-CPU `python bench.py` measures the XLA paths instead of
    # crashing at lowering
    on_tpu = jax.default_backend() == "tpu"
    cfg = exp.ExperimentConfig(
        stage_steps=450,
        solver=SolverConfig.throughput(),
        sim=SimConfig(use_pallas_rollout=pallas_rollout and on_tpu),
        lmpc=LMPCConfig(max_laps=12, max_pts=1024, model_pts=512,
                        use_pallas_sysid=on_tpu),
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
            # per-step ADMM iteration counts: the single number that says
            # whether the next solver win is fewer iterations or cheaper ones
            return (state, plant), state.iters

        (state, plant), iters = jax.lax.scan(
            body, (state, plant), jnp.arange(steps)
        )
        return state, plant, iters

    log("compiling + warmup chunk...")
    t0 = time.time()
    state, plant, _ = run_chunk(state, plant, jax.random.fold_in(key, 1))
    jax.block_until_ready(plant.x)
    log(f"warmup (incl. compile): {time.time() - t0:.1f}s")

    times = []
    iters_all = []
    for r in range(reps):
        t0 = time.time()
        state, plant, iters = run_chunk(state, plant, jax.random.fold_in(key, 2 + r))
        jax.block_until_ready(plant.x)
        times.append(time.time() - t0)
        iters_all.append(np.asarray(iters).ravel())
        log(f"rep {r}: {times[-1]:.3f}s -> "
            f"{batch * steps / times[-1]:.0f} solves/s")

    best = min(times)
    solves_per_s = batch * steps / best
    it = np.concatenate(iters_all)
    result = {
        "metric": _METRIC,
        "value": round(solves_per_s, 1),
        "unit": _UNIT,
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
        # ADMM iterations-to-tolerance distribution across (steps x batch);
        # granularity = SolverConfig.check_every
        "admm_iters_mean": round(float(it.mean()), 1),
        "admm_iters_p50": int(np.percentile(it, 50)),
        "admm_iters_p99": int(np.percentile(it, 99)),
        "batch": batch,
    }

    # ---- secondary: the throughput_max preset (structured KKT inverse) ----
    # +31% solves/s at identical tolerances; NOT the headline because its
    # converged-lap quality measures 2.18% vs the 1% parity criterion the
    # headline preset meets (see SolverConfig.throughput_max and the
    # round-5 quality A/B in BASELINE.md). Reported so the speed frontier
    # stays visible next to the criterion-bound number.
    try:
        import dataclasses

        scfg_max = SolverConfig.throughput_max()

        def seed_one_max(_):
            st = lmpc_mod.init_lmpc_state(cfg.lmpc, solver=scfg_max)
            for _i in range(cfg.lmpc.num_ss_it):
                st = lmpc_mod.lmpc_add_trajectory(
                    st, cfg.lmpc, x_seed, u_seed, xg_seed, steps_seed, L
                )
            return st

        state_m = jax.jit(jax.vmap(seed_one_max))(jnp.arange(batch))
        step_m = lmpc_mod.make_lmpc(cfg.lmpc, trk, scfg_max, cfg.sim.dt)

        @jax.jit
        def run_chunk_max(state, plant, key):
            def body(carry, t):
                state, plant = carry
                k = jax.random.fold_in(key, t)
                kc, kp = jax.random.split(k)
                kcs = jax.random.split(kc, state.time_step.shape[0])
                kps = jax.random.split(kp, state.time_step.shape[0])
                state, u = jax.vmap(step_m)(state, plant.x, kcs)
                if cfg.sim.use_pallas_rollout:
                    from racinglmpc_tpu.ops.pallas_rollout import (
                        plant_step_batch,
                    )

                    nx, nxg = plant_step_batch(
                        plant.x, plant.x_glob, u, vp, trk, cfg.sim
                    )
                    if cfg.sim.noise:
                        sig = jnp.asarray(cfg.sim.noise_sigma,
                                          dtype=nx.dtype)
                        raw = jax.vmap(
                            lambda kk: jax.random.normal(kk, (3,),
                                                         dtype=nx.dtype)
                        )(kps) * sig
                        nx = nx.at[:, :3].add(cfg.sim.noise_gain * jnp.clip(
                            raw, -cfg.sim.noise_clip, cfg.sim.noise_clip))
                    plant = PlantState(x=nx, x_glob=nxg)
                else:
                    plant = jax.vmap(
                        lambda pl, uu, kk: plant_step(pl, uu, vp, trk,
                                                      cfg.sim, kk)
                    )(plant, u, kps)
                return (state, plant), None

            (state, plant), _ = jax.lax.scan(
                body, (state, plant), jnp.arange(steps)
            )
            return state, plant

        x0m = jnp.tile(jnp.asarray([0.5, 0, 0, 0, 0, 0], jnp.float32),
                       (batch, 1))
        plant_m = PlantState(x=x0m, x_glob=x0m)
        state_m, plant_m = run_chunk_max(state_m, plant_m,
                                         jax.random.fold_in(key, 11))
        jax.block_until_ready(plant_m.x)
        tmax = []
        for r in range(2):
            t0 = time.time()
            state_m, plant_m = run_chunk_max(state_m, plant_m,
                                             jax.random.fold_in(key, 12 + r))
            jax.block_until_ready(plant_m.x)
            tmax.append(time.time() - t0)
        result["max_preset_solves_per_s"] = round(
            batch * steps / min(tmax), 1)
        log(f"throughput_max: {result['max_preset_solves_per_s']} solves/s")
    except BaseException as e:  # noqa: BLE001 — secondary must not kill bench
        result["max_preset_error"] = f"{type(e).__name__}: {e}"[:200]
    # ---- on-TPU quality gate on the SAME preset (round-4 item 4) ----------
    log("running quality gate (12-lap batched LMPC session)...")
    t0 = time.time()
    try:
        q = quality_gate(
            cfg, trk, vp, x_seed, u_seed, xg_seed, steps_seed,
            jax.random.fold_in(key, 99), log=log,
        )
    except BaseException as e:  # noqa: BLE001 - gate failure must be visible
        import traceback

        traceback.print_exc(file=sys.stderr)
        q = {"pass": False, "error": f"{type(e).__name__}: {e}"[:300]}
    log(f"quality gate: {time.time() - t0:.1f}s")
    result["quality"] = q
    if not q.get("pass"):
        _log("[bench] QUALITY GATE FAILED — the throughput number above is "
             "not a valid headline: " + json.dumps(q))
    print(json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    verbose = "-v" in sys.argv
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 256
    if "--no-probe" not in sys.argv:
        if not probe_backend():
            _failure_record("backend-probe", "backend init did not complete "
                            "within the retry budget (TPU tunnel wedge?)")
            sys.exit(1)
    try:
        main(batch=batch, verbose=verbose,
             pallas_rollout="--no-pallas-rollout" not in sys.argv)
    except BaseException as e:  # noqa: BLE001 - scoreboard must not be empty
        import traceback

        traceback.print_exc(file=sys.stderr)
        _failure_record("measurement", f"{type(e).__name__}: {e}")
        sys.exit(1)
