"""Metrics, profiling, and latency reporting.

The reference's observability is ``print()`` plus vestigial, never-read
wall-clock attributes (SURVEY §5.1/§5.5). Here:

- :class:`StepMetrics` — per-step, per-scenario solver/lap data produced as
  *arrays* on device (no host sync in the hot loop); gather with
  :func:`summarize` after a chunk.
- :func:`latency_report` — wall-clock step-latency percentiles (incl. p99
  vs the 100 ms / 10 Hz control budget, the BASELINE headline).
- :func:`profile` — context manager around ``jax.profiler.trace`` for
  per-kernel TPU timelines viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class StepMetrics(NamedTuple):
    """Per-scenario step diagnostics (leading axes: [batch] or [T, batch])."""

    feasible: jnp.ndarray   # bool — accepted QP solution
    pri_res: jnp.ndarray    # primal residual of the accepted/last solve
    dua_res: jnp.ndarray    # dual residual
    iters: jnp.ndarray      # ADMM iterations to tolerance (max_iter if never)
    lap_progress: jnp.ndarray  # arc length s


def summarize(m: StepMetrics) -> dict:
    """Host-side summary of a metrics pytree (one device_get)."""
    h = jax.device_get(m)
    return {
        "feasible_rate": float(np.mean(np.asarray(h.feasible, dtype=np.float64))),
        "pri_res_p50": float(np.percentile(h.pri_res, 50)),
        "pri_res_p99": float(np.percentile(h.pri_res, 99)),
        "dua_res_p50": float(np.percentile(h.dua_res, 50)),
        "iters_mean": float(np.mean(h.iters)),
        "s_mean": float(np.mean(h.lap_progress)),
    }


def latency_report(step_seconds: np.ndarray, budget_s: float = 0.1) -> dict:
    """Percentile latency vs the 10 Hz control budget (BASELINE metric)."""
    s = np.asarray(step_seconds, dtype=np.float64)
    return {
        "p50_ms": float(np.percentile(s, 50) * 1e3),
        "p99_ms": float(np.percentile(s, 99) * 1e3),
        "max_ms": float(s.max() * 1e3),
        "budget_ms": budget_s * 1e3,
        "within_budget_p99": bool(np.percentile(s, 99) <= budget_s),
    }


def time_steps(fn, n: int, *args, **kwargs) -> np.ndarray:
    """Call ``fn(*args)`` ``n`` times, blocking each; returns seconds/call.
    ``fn`` must return (at least one) jax array to block on."""
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args, **kwargs)
        jax.block_until_ready(r)
        out.append(time.perf_counter() - t0)
    return np.asarray(out)


@contextlib.contextmanager
def profile(logdir: Optional[str]) -> Iterator[None]:
    """``with profile('/tmp/trace'):`` — captures a TPU profiler trace;
    no-op when ``logdir`` is None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
