"""Closed-loop lap runner: the TPU equivalent of the reference Simulator.sim.

Reference semantics (`/root/reference/src/fnc/simulator/SysModel.py:22-54`):
per control step, call the controller on the latest state, apply the first
predicted input, integrate the plant, and (when ``multi_lap=False``) exit as
soon as the *new* state's arc length exceeds the track length. The trajectory
returned excludes the crossing state, which is returned separately with its
arc length wrapped by one track length (the next lap's initial condition —
laps are continuous, never reset).

TPU design: a fixed-length ``lax.scan`` over ``max_steps`` with a ``done``
mask (data-dependent exit becomes masking; state freezes once done). The
per-scenario function is plain; batching is ``vmap`` over (ctrl_state, plant,
key) — see :func:`run_lap_batch`.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from racinglmpc_tpu.models.dynamics import PlantState, plant_step
from racinglmpc_tpu.models.track import Track
from racinglmpc_tpu.utils.config import SimConfig, VehicleParams

# A controller is a pure step function (ctrl_state, x, key) -> (ctrl_state, u).
ControllerStep = Callable[[Any, jnp.ndarray, Optional[jax.Array]], Any]


class LapResult(NamedTuple):
    """One closed-loop lap (fixed-capacity, mask-annotated)."""

    x: jnp.ndarray        # (T_max, 6) curvilinear states (row t valid iff mask[t])
    u: jnp.ndarray        # (T_max, 2) applied inputs
    x_glob: jnp.ndarray   # (T_max, 6) global-frame states
    mask: jnp.ndarray     # (T_max,) bool — steps actually executed
    steps: jnp.ndarray    # () int32 — number of executed steps (== mask.sum())
    x_final: PlantState   # crossing state, with s wrapped by -TrackLength
    ctrl_state: Any       # controller state after the lap
    plant_final: PlantState  # raw (unwrapped) plant state — chunk resumption
    done: jnp.ndarray     # () bool — lap completed (always False when multi_lap)
    collected: Any = None  # per-step debug archive (see ``collect_fn``)


def run_lap(
    controller_step: ControllerStep,
    ctrl_state,
    plant: PlantState,
    key: jax.Array,
    *,
    trk: Track,
    vp: VehicleParams,
    sim_cfg: SimConfig,
    max_steps: int,
    multi_lap: bool = False,
    done0: Optional[jnp.ndarray] = None,
    step0: int | jnp.ndarray = 0,
    collect_fn=None,
) -> LapResult:
    """Run one closed-loop lap (or a fixed-horizon run when ``multi_lap``).

    ``multi_lap=True`` mirrors the reference's Simulator(map) default used for
    the PID/MPC/LTV stages: no lap-completion exit, exactly ``max_steps``
    steps (reference maxSimTime/dt = 1000).

    ``done0``/``step0`` support chunked execution (resume a partially
    completed lap): already-done scenarios stay frozen, and per-step PRNG
    keys are derived from the *global* step index so chunking does not change
    the noise stream.

    ``collect_fn(ctrl_state) -> pytree``: optional per-step debug archive —
    the TPU equivalent of the reference's memory-heavy predicted-trajectory
    store (xStoredPredTraj/uStoredPredTraj, PredictiveControllers.py:323-328,
    377-379; SURVEY §5.5). E.g. for the LMPC pass
    ``lambda st: (st.x_pred, st.u_pred, st.lam)``; the result lands in
    ``LapResult.collected`` with a leading time axis.
    """
    L = trk.total_len

    def step(carry, t):
        ctrl_state, plant, done = carry
        step_key = jax.random.fold_in(key, t)
        k_ctrl, k_plant = jax.random.split(step_key)

        new_ctrl, u = controller_step(ctrl_state, plant.x, k_ctrl)
        new_plant = plant_step(plant, u, vp, trk, sim_cfg, k_plant)

        crossed = jnp.logical_and(
            jnp.asarray(not multi_lap), new_plant.x[4] > L
        )
        valid = jnp.logical_not(done)
        # freeze everything once done
        sel = lambda new, old: jax.tree_util.tree_map(  # noqa: E731
            lambda a, b: jnp.where(done, b, a), new, old
        )
        out_ctrl = sel(new_ctrl, ctrl_state)
        out_plant = sel(new_plant, plant)
        new_done = jnp.logical_or(done, crossed)
        extra = collect_fn(new_ctrl) if collect_fn is not None else None
        ys = (plant.x, u, plant.x_glob, valid, extra)
        return (out_ctrl, out_plant, new_done), ys

    done_init = jnp.asarray(False) if done0 is None else done0
    init = (ctrl_state, plant, done_init)
    (ctrl_out, plant_out, done_out), (xs, us, xgs, mask, collected) = (
        jax.lax.scan(step, init, step0 + jnp.arange(max_steps))
    )

    steps = jnp.sum(mask).astype(jnp.int32)
    s_shift = jnp.zeros_like(plant_out.x).at[4].set(L)
    x_final = PlantState(x=plant_out.x - s_shift, x_glob=plant_out.x_glob)
    return LapResult(
        x=xs, u=us, x_glob=xgs, mask=mask, steps=steps,
        x_final=x_final, ctrl_state=ctrl_out,
        plant_final=plant_out, done=done_out, collected=collected,
    )


def run_lap_batch(
    controller_step: ControllerStep,
    ctrl_state,
    plant: PlantState,
    key: jax.Array,
    **kwargs,
) -> LapResult:
    """Scenario-batched lap: vmap of :func:`run_lap` over leading axes of
    (ctrl_state, plant, key). Static configs are closed over."""
    f = functools.partial(run_lap, controller_step, **kwargs)
    return jax.vmap(f)(ctrl_state, plant, key)


def run_lap_fused(
    controller_step: ControllerStep,
    ctrl_state,
    plant: PlantState,
    keys: jax.Array,
    *,
    trk: Track,
    vp: VehicleParams,
    sim_cfg: SimConfig,
    max_steps: int,
    multi_lap: bool = False,
    done0: Optional[jnp.ndarray] = None,
    step0: int | jnp.ndarray = 0,
    collect_fn=None,
) -> LapResult:
    """Batch-level lap runner using the fused Pallas plant-rollout kernel.

    Same semantics and noise stream as ``vmap(run_lap)`` (the controller is
    still vmapped per scenario, and the per-step PRNG keys are derived
    identically), but the plant's 100 Euler substeps for the whole batch run
    inside one VMEM-resident kernel (``ops/pallas_rollout.plant_step_batch``)
    instead of a vmapped ``fori_loop`` — one HBM round-trip per control step
    instead of one per substep. Engaged by ``SimConfig.use_pallas_rollout``
    (see :func:`make_lap_runner`); requires scalar ``VehicleParams`` (the
    kernel holds them in SMEM).

    All batched arguments (``ctrl_state``, ``plant``, ``keys``, ``done0``)
    carry a leading scenario axis; the result matches :func:`run_lap_batch`.
    """
    from racinglmpc_tpu.ops.pallas_rollout import plant_step_batch

    L = trk.total_len
    B = plant.x.shape[0]
    interpret = sim_cfg.pallas_interpret

    def bwhere(done, new, old):
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                done.reshape(done.shape + (1,) * (a.ndim - 1)), b, a
            ),
            new, old,
        )

    def step(carry, t):
        ctrl_state, plant, done = carry
        step_keys = jax.vmap(lambda k: jax.random.fold_in(k, t))(keys)
        kk = jax.vmap(jax.random.split)(step_keys)     # (B, 2, 2)
        k_ctrl, k_plant = kk[:, 0], kk[:, 1]

        new_ctrl, u = jax.vmap(controller_step)(ctrl_state, plant.x, k_ctrl)
        nx, nxg = plant_step_batch(
            plant.x, plant.x_glob, u, vp, trk, sim_cfg, interpret=interpret
        )
        if sim_cfg.noise:
            # identical noise stream to models.dynamics.plant_step
            sig = jnp.asarray(sim_cfg.noise_sigma, dtype=nx.dtype)
            raw = jax.vmap(
                lambda k: jax.random.normal(k, (3,), dtype=nx.dtype)
            )(k_plant) * sig
            noise = sim_cfg.noise_gain * jnp.clip(
                raw, -sim_cfg.noise_clip, sim_cfg.noise_clip
            )
            nx = nx.at[:, :3].add(noise)
        new_plant = PlantState(x=nx, x_glob=nxg)

        crossed = jnp.logical_and(
            jnp.asarray(not multi_lap), new_plant.x[:, 4] > L
        )
        valid = jnp.logical_not(done)
        out_ctrl = bwhere(done, new_ctrl, ctrl_state)
        out_plant = bwhere(done, new_plant, plant)
        new_done = jnp.logical_or(done, crossed)
        extra = collect_fn(new_ctrl) if collect_fn is not None else None
        ys = (plant.x, u, plant.x_glob, valid, extra)
        return (out_ctrl, out_plant, new_done), ys

    done_init = jnp.zeros((B,), bool) if done0 is None else done0
    init = (ctrl_state, plant, done_init)
    (ctrl_out, plant_out, done_out), (xs, us, xgs, mask, collected) = (
        jax.lax.scan(step, init, step0 + jnp.arange(max_steps))
    )

    # scan stacks time first; LapResult carries (B, T, ...) like run_lap_batch
    tfirst = lambda a: jnp.swapaxes(a, 0, 1) if a is not None else None  # noqa: E731
    xs, us, xgs, mask = tfirst(xs), tfirst(us), tfirst(xgs), tfirst(mask)
    collected = jax.tree_util.tree_map(tfirst, collected)

    steps = jnp.sum(mask, axis=1).astype(jnp.int32)
    s_shift = jnp.zeros_like(plant_out.x).at[:, 4].set(L)
    x_final = PlantState(x=plant_out.x - s_shift, x_glob=plant_out.x_glob)
    return LapResult(
        x=xs, u=us, x_glob=xgs, mask=mask, steps=steps,
        x_final=x_final, ctrl_state=ctrl_out,
        plant_final=plant_out, done=done_out, collected=collected,
    )
