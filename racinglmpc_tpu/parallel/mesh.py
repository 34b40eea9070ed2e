"""Device mesh / sharding helpers for the scenario axis.

The reference is single-process single-thread (SURVEY §2.13-2.14: no
parallelism, no communication backend). The TPU build's unit of scale is the
**scenario batch** — thousands of independent closed-loop (plant, controller)
pairs — so the canonical layout is one mesh axis ``'scenario'`` spanning all
chips (ICI within a slice, DCN across hosts), with every batched leaf
sharded on its leading axis and all per-scenario math purely local. XLA
inserts collectives only where cross-scenario aggregation is requested
(metrics reductions, best-lap gathers — see :func:`cross_scenario_metrics`).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENARIO_AXIS = "scenario"


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = SCENARIO_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def scenario_sharding(mesh: Mesh, axis_name: str = SCENARIO_AXIS) -> NamedSharding:
    """Sharding that splits the leading (scenario) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_scenario_tree(tree: Any, mesh: Mesh,
                        axis_name: str = SCENARIO_AXIS) -> Any:
    """Place every leaf of a scenario-batched pytree with its leading axis
    split across the mesh (leaves whose leading dim is not divisible are
    replicated — e.g. per-scenario scalars broadcast from configs)."""
    n = mesh.devices.size
    shard = scenario_sharding(mesh, axis_name)
    repl = replicated_sharding(mesh)

    def place(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[0] % n == 0 and leaf.shape[0] > 0:
            return jax.device_put(leaf, shard)
        return jax.device_put(leaf, repl)

    return jax.tree_util.tree_map(place, tree)


def init_multi_host(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host JAX (``jax.distributed.initialize``).

    No-op (returns 1) when neither arguments nor the standard cluster env
    vars are present — single-process runs and unit tests stay untouched.
    Returns the process count. After this, :func:`make_mesh` over
    ``jax.devices()`` spans all hosts (ICI within a slice, DCN across).
    """
    import os

    has_env = "COORDINATOR_ADDRESS" in os.environ or "JAX_COORDINATOR" in os.environ
    if coordinator_address is None and not has_env:
        return 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count()


def cross_scenario_metrics(values: jnp.ndarray) -> dict:
    """Cross-chip reductions XLA lowers to ICI collectives: summary stats of
    a per-scenario metric (lap steps, solve residuals, ...)."""
    return {
        "mean": jnp.mean(values),
        "min": jnp.min(values),
        "max": jnp.max(values),
    }
