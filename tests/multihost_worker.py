"""Worker process for the 2-process multi-host test (run via subprocess).

Each worker owns 4 virtual CPU devices; ``jax.distributed.initialize`` joins
them into one 8-device job, the scenario mesh spans both processes (the DCN
analog), and the sharded PID stage runs SPMD. Prints one RESULT line the
driver compares across processes and against a single-process run.

Usage: python multihost_worker.py <port> <process_id> <num_processes>
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from racinglmpc_tpu.parallel import init_multi_host, make_mesh  # noqa: E402


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    n = init_multi_host(f"localhost:{port}", num_processes=nproc,
                        process_id=pid)
    # import the framework only after jax.distributed.initialize: nothing in
    # the package may touch the XLA backend at import time
    from racinglmpc_tpu.runtime import experiment as exp
    assert n == nproc, f"process_count {n} != {nproc}"
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())
    assert len(jax.local_devices()) == 4

    stage = sys.argv[4] if len(sys.argv) > 4 else "pid"
    mesh = make_mesh()  # spans all 8 devices across both processes
    if stage == "pid":
        cfg = exp.ExperimentConfig(stage_steps=120)
        res = exp.run_experiment(
            jax.random.PRNGKey(0), cfg, batch=8, stages="pid", mesh=mesh
        )
        # cross-process reductions (XLA collectives over the scenario axis);
        # per-shard leaves are not addressable from one process, so only
        # replicated reduction results are pulled to the host
        final_s = res.pid.x[:, -1, 4]
        mean_s = float(jax.numpy.mean(final_s))
        steps_ok = bool(jax.numpy.all(res.pid.steps == 120))
        print(f"RESULT pid={pid} mean_s={mean_s:.6f} steps_ok={steps_ok}",
              flush=True)
    elif stage == "qp":
        # ONE giant QP with its dense blocks row-sharded across BOTH
        # processes (ops/qp_sharded.py): the all_gather/psum per operator
        # application span the process boundary — the DCN analog of the
        # ICI collectives on a real slice.
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp  # noqa: E402

        from racinglmpc_tpu.ops import qp as qp_mod  # noqa: E402
        from racinglmpc_tpu.ops import qp_sharded  # noqa: E402

        rng = np.random.default_rng(0)
        n, me, mi = 96, 16, 48
        M = rng.normal(size=(n, n))
        H = M.T @ M / n + 0.5 * np.eye(n)
        q = rng.normal(size=n)
        G = rng.normal(size=(me, n))
        F = rng.normal(size=(mi, n))
        z0 = rng.normal(size=n) * 0.3
        g = G @ z0
        b = F @ z0 + np.abs(rng.normal(size=mi)) + 0.05
        A = np.vstack([F, G])
        l = np.concatenate([np.full(mi, -np.inf), g])
        u = np.concatenate([b, g])
        qp = qp_mod.QPData(*(jnp.asarray(v) for v in (H, q, A, l, u)))

        mesh = make_mesh(axis_name=qp_sharded.BLOCK_AXIS)
        sol = qp_sharded.solve_sharded(
            qp, mesh,
            cfg=qp_sharded.ShardedSolverConfig(
                max_iter=2000, eps_abs=1e-7, eps_rel=1e-7, cg_tol=1e-10),
        )
        # x / residuals / iters are replicated — addressable on every process
        x = np.asarray(jax.device_get(sol.x))
        print(
            f"RESULT pid={pid} solved={bool(sol.solved)} "
            f"iters={int(sol.iters)} cg={int(sol.cg_iters)} "
            f"xsum={float(np.sum(x)):.12f} xmax={float(np.max(x)):.12f}",
            flush=True,
        )
    else:  # the full LMPC stage across processes (sharded safe sets,
        # DCN-spanning lap loop with host early exit + per-lap bookkeeping)
        from racinglmpc_tpu.utils.config import LMPCConfig, SolverConfig

        cfg = exp.ExperimentConfig(
            stage_steps=300, n_lmpc_laps=2, lap_max_steps=320, lap_chunk=80,
            solver=SolverConfig.throughput(),
            lmpc=LMPCConfig(max_laps=8, max_pts=512, model_pts=256),
        )
        res = exp.run_experiment(
            jax.random.PRNGKey(0), cfg, batch=8, stages="pid,lmpc", mesh=mesh
        )
        # lap_steps is host-gathered identically on every process (_to_host)
        steps_str = ",".join(str(int(v)) for v in res.lap_steps.ravel())
        improved = bool((res.lap_steps[:, 1] <= res.lap_steps[:, 0]).all())
        print(f"RESULT pid={pid} lap_steps={steps_str} improved={improved}",
              flush=True)


if __name__ == "__main__":
    main()
