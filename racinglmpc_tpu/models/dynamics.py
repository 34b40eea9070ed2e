"""Single-track bicycle + Pacejka plant, dual-frame Euler integration.

Reproduces the reference plant (`/root/reference/src/fnc/simulator/SysModel.py:56-147`):
one control step = ``substeps`` (100) explicit-Euler substeps at 1 kHz that
propagate *both* the curvilinear state ``x = [vx, vy, wz, epsi, s, ey]`` and
the global-frame state ``x_glob = [vx, vy, wz, psi, X, Y]``, with the
curvature looked up from the track table each substep, followed by clipped
Gaussian noise on (vx, vy, wz) once per control step (SysModel.py:139-145).

TPU design: the substep loop is a ``lax.fori_loop`` over a fused elementwise
body (VPU work); everything is batched by ``vmap`` over the scenario axis so
the loop overhead amortizes across the whole batch. Noise uses explicit PRNG
keys (deterministic, switchable off for parity tests).

Note: the reference computes the rear slip angle with ``lf``
(SysModel.py:97, ``alpha_r = -atan2(vy - lf*wz, vx)``); since lf == lr in the
canonical config this is numerically identical to the physically-correct
``lr`` used here.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from racinglmpc_tpu.models import track as track_mod
from racinglmpc_tpu.utils.config import SimConfig, VehicleParams


class PlantState(NamedTuple):
    """Dual-frame plant state (a pytree; add leading dims to batch)."""

    x: jnp.ndarray        # (6,) curvilinear [vx, vy, wz, epsi, s, ey]
    x_glob: jnp.ndarray   # (6,) global      [vx, vy, wz, psi, X, Y]


def tire_forces(vp: VehicleParams, vx, vy, wz, delta):
    """Pacejka lateral tire forces (front, rear). SysModel.py:96-101."""
    alpha_f = delta - jnp.arctan2(vy + vp.lf * wz, vx)
    alpha_r = -jnp.arctan2(vy - vp.lr * wz, vx)
    fyf = vp.Df * jnp.sin(vp.Cf * jnp.arctan(vp.Bf * alpha_f))
    fyr = vp.Dr * jnp.sin(vp.Cr * jnp.arctan(vp.Br * alpha_r))
    return fyf, fyr


def _substep(state: PlantState, u, vp: VehicleParams, trk: track_mod.Track, dT):
    """One explicit-Euler substep of both frames (SysModel.py:94-129)."""
    vx, vy, wz, epsi, s, ey = (state.x[i] for i in range(6))
    psi, X, Y = state.x_glob[3], state.x_glob[4], state.x_glob[5]
    delta, a = u[0], u[1]

    fyf, fyr = tire_forces(vp, vx, vy, wz, delta)

    dvx = a - fyf * jnp.sin(delta) / vp.m + wz * vy
    dvy = (fyf * jnp.cos(delta) + fyr) / vp.m - wz * vx
    dwz = (vp.lf * fyf * jnp.cos(delta) - vp.lr * fyr) / vp.Iz

    cur = track_mod.curvature(trk, s)
    den = 1.0 - cur * ey
    # guard: when the car leaves the track past the curvature center
    # (|ey| -> 1/kappa) the reference's expression divides by ~0 and the
    # state explodes (the reference instead drops into pdb, Track.py:280).
    # Clamp so batched scenarios degrade gracefully instead of NaN-ing.
    den = jnp.where(den >= 0, jnp.maximum(den, 0.05), jnp.minimum(den, -0.05))
    s_dot = (vx * jnp.cos(epsi) - vy * jnp.sin(epsi)) / den
    depsi = wz - s_dot * cur
    dey = vx * jnp.sin(epsi) + vy * jnp.cos(epsi)

    x_new = jnp.stack(
        [vx + dT * dvx, vy + dT * dvy, wz + dT * dwz,
         epsi + dT * depsi, s + dT * s_dot, ey + dT * dey]
    )
    x_glob_new = jnp.stack(
        [vx + dT * dvx, vy + dT * dvy, wz + dT * dwz,
         psi + dT * wz,
         X + dT * (vx * jnp.cos(psi) - vy * jnp.sin(psi)),
         Y + dT * (vx * jnp.sin(psi) + vy * jnp.cos(psi))]
    )
    return PlantState(x=x_new, x_glob=x_glob_new)


def plant_step(
    state: PlantState,
    u: jnp.ndarray,
    vp: VehicleParams,
    trk: track_mod.Track,
    cfg: SimConfig,
    key: Optional[jax.Array] = None,
) -> PlantState:
    """Advance the plant one control period (``cfg.substeps`` Euler substeps),
    then add clipped Gaussian noise on (vx, vy, wz) if enabled.

    Per-scenario signature; ``vmap`` over a leading batch axis (with per-
    scenario keys and, optionally, per-scenario ``VehicleParams``).
    """
    dT = jnp.asarray(cfg.delta_t, dtype=state.x.dtype)

    def body(_, st):
        return _substep(st, u, vp, trk, dT)

    out = jax.lax.fori_loop(0, cfg.substeps, body, state)

    if cfg.noise and key is not None:
        sig = jnp.asarray(cfg.noise_sigma, dtype=out.x.dtype)
        raw = jax.random.normal(key, (3,), dtype=out.x.dtype) * sig
        noise = cfg.noise_gain * jnp.clip(raw, -cfg.noise_clip, cfg.noise_clip)
        x = out.x.at[:3].add(noise)
        out = PlantState(x=x, x_glob=out.x_glob)
    return out
