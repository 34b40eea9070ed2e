"""Microbenchmark: the per-step addPoint extension-buffer write (VERDICT
round-2 item 8 — addPoint is ~11-15% of the control step).

``add_point`` writes ONE row per scenario per step into the (ext_cap, ·)
buffers at a per-lane dynamic index ``ext.n``. Under vmap that lowers to a
batched scatter — and on TPU scatters serialize. But ``ext.n`` is actually
UNIFORM across the batch in the product loop (every scenario appends every
step; the capacity guard never trips with correctly sized buffers), so the
same write could be a lane-shared dynamic_update_slice or a one-hot blend.
This probe times the three formulations inside a scan on realistic shapes.

Usage: python examples/probe_addpoint.py [--batch 256] [--cap 1024]
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp


def time_scan(fn, carry, n=200):
    f = jax.jit(functools.partial(fn, n=n))
    jax.block_until_ready(f(carry))
    t0 = time.perf_counter()
    jax.block_until_ready(f(carry))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--cap", type=int, default=1024)
    args = ap.parse_args()
    B, E = args.batch, args.cap

    x = jnp.zeros((B, E, 6), jnp.float32)
    u = jnp.zeros((B, E, 2), jnp.float32)
    q = jnp.zeros((B, E), jnp.float32)
    n = jnp.zeros((B,), jnp.int32)
    row = jnp.ones((B, 6), jnp.float32)

    # current formulation: per-lane dynamic index (batched scatter)
    def scatter_step(carry, t):
        x, u, q, n = carry

        def one(x, u, q, n, row):
            e = jnp.minimum(n, E - 1)
            ok = n < E
            return (
                x.at[e].set(jnp.where(ok, row, x[e])),
                u.at[e].set(jnp.where(ok, row[:2], u[e])),
                q.at[e].set(jnp.where(ok, row[0], q[e])),
                jnp.where(ok, n + 1, n),
            )

        x, u, q, n = jax.vmap(one)(x, u, q, n, row + t)
        return (x, u, q, n), None

    # uniform-index formulation: one shared dynamic_update_slice per buffer
    def uniform_step(carry, t):
        x, u, q, n = carry
        e = jnp.minimum(t, E - 1)
        ok = (n < E)[:, None]                       # per-lane mask on values
        r = row + t
        old = jax.lax.dynamic_slice(x, (0, e, 0), (B, 1, 6))
        x = jax.lax.dynamic_update_slice(
            x, jnp.where(ok[:, :, None], r[:, None], old), (0, e, 0))
        oldu = jax.lax.dynamic_slice(u, (0, e, 0), (B, 1, 2))
        u = jax.lax.dynamic_update_slice(
            u, jnp.where(ok[:, :, None], r[:, None, :2], oldu), (0, e, 0))
        oldq = jax.lax.dynamic_slice(q, (0, e), (B, 1))
        q = jax.lax.dynamic_update_slice(
            q, jnp.where(ok, r[:, :1], oldq), (0, e))
        return (x, u, q, n + (n < E)), None

    # one-hot blend: full-buffer elementwise, no scatter at all
    def onehot_step(carry, t):
        x, u, q, n = carry
        hot = (jnp.arange(E)[None] == n[:, None]).astype(x.dtype)  # (B, E)
        r = row + t
        x = x * (1 - hot[..., None]) + hot[..., None] * r[:, None]
        u = u * (1 - hot[..., None]) + hot[..., None] * r[:, None, :2]
        q = q * (1 - hot) + hot * r[:, :1]
        return (x, u, q, n + (n < E)), None

    out = {}
    for name, step in [("scatter", scatter_step), ("uniform", uniform_step),
                       ("onehot", onehot_step)]:
        def run(carry, n=200, _s=step):
            carry, _ = jax.lax.scan(_s, carry, jnp.arange(n))
            return carry

        ms = time_scan(run, (x, u, q, n))
        out[name] = round(ms, 4)
        print(f"{name}: {ms:.4f} ms/step")

    print(json.dumps({"metric": "addpoint_write_formulations_ms",
                      "batch": B, "cap": E, **out}))


if __name__ == "__main__":
    main()
