"""Real multi-process `jax.distributed` test (SURVEY §5.8, VERDICT item 6).

Spawns 2 CPU processes with 4 virtual devices each, joins them with
``init_multi_host``, and runs the sharded PID stage over the resulting
8-device, 2-host mesh — the DCN-spanning path that single-process tests
(test_sharded_experiment.py) cannot exercise. Both processes must agree on
the cross-process scenario reduction, and the value must match a
single-process run of the same batch (the mesh changes placement, not math).
"""
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_pid_stage():
    port = _free_port()
    env = dict(os.environ)
    # clean slate: drop any sitecustomize that initializes an XLA backend at
    # interpreter startup (jax.distributed.initialize must run first), and
    # let the worker set its own XLA_FLAGS/JAX_PLATFORMS before importing jax
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    means = []
    for out in outs:
        m = re.search(r"mean_s=([-\d.]+) steps_ok=(\w+)", out)
        assert m, f"no RESULT line in: {out}"
        means.append(float(m.group(1)))
        assert m.group(2) == "True"

    # both processes computed the same cross-host reduction
    assert means[0] == pytest.approx(means[1], abs=1e-6)

    # and it matches a single-process run (placement must not change math)
    import jax

    from racinglmpc_tpu.runtime import experiment as exp

    cfg = exp.ExperimentConfig(stage_steps=120)
    res = exp.run_experiment(jax.random.PRNGKey(0), cfg, batch=8,
                             stages="pid")
    expected = float(np.mean(np.asarray(res.pid.x)[:, -1, 4]))
    assert means[0] == pytest.approx(expected, abs=5e-4)


@pytest.mark.slow
def test_two_process_sharded_giant_qp():
    """ONE giant QP's dense blocks row-sharded across 2 processes
    (ops/qp_sharded.py): the per-operator all_gather/psum cross the process
    boundary. Both processes must converge, agree bit-for-bit on the
    replicated solution summary, and match the interior-point oracle."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), "2", "qp"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    results = []
    for out in outs:
        m = re.search(
            r"solved=(\w+) iters=(\d+) cg=(\d+) xsum=([-\d.]+) "
            r"xmax=([-\d.]+)", out)
        assert m, f"no RESULT line in: {out}"
        assert m.group(1) == "True"
        results.append(m.groups())
    # replicated outputs must be identical across processes
    assert results[0] == results[1]

    # and the solution must match the float64 interior-point oracle
    import numpy as np2

    from tests.oracles import qp_ip

    rng = np2.random.default_rng(0)
    n, me, mi = 96, 16, 48
    M = rng.normal(size=(n, n))
    H = M.T @ M / n + 0.5 * np2.eye(n)
    q = rng.normal(size=n)
    G = rng.normal(size=(me, n))
    F = rng.normal(size=(mi, n))
    z0 = rng.normal(size=n) * 0.3
    g = G @ z0
    b = F @ z0 + np2.abs(rng.normal(size=mi)) + 0.05
    z_ref, *_, ok = qp_ip.solve_qp(H, q, G, g, F, b)
    assert ok
    assert float(results[0][3]) == pytest.approx(float(np2.sum(z_ref)),
                                                 abs=1e-3)
    assert float(results[0][4]) == pytest.approx(float(np2.max(z_ref)),
                                                 abs=1e-4)


@pytest.mark.slow
def test_two_process_distributed_lmpc_stage():
    """Full LMPC stage across 2 processes: sharded safe sets, DCN-spanning
    closed-loop lap scan, host early exit, and the per-lap bookkeeping
    (which host-gathers lap steps via process_allgather). Both processes
    must report identical lap-step tables."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), "2", "lmpc"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    tables = []
    for out in outs:
        m = re.search(r"lap_steps=([\d,]+) improved=(\w+)", out)
        assert m, f"no RESULT line in: {out}"
        tables.append(m.group(1))
        assert m.group(2) == "True"
    assert tables[0] == tables[1]
