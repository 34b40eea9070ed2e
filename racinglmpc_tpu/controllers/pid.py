"""Exploration-noise PID path-following baseline.

Reproduces the reference PID (`/root/reference/src/fnc/Utilities.py:42-68`):
  steering = -0.6*ey - 0.9*epsi + clip(0.25*randn, +-0.9)
  accel    = 1.5*(vt - vx)      + clip(0.10*randn, +-0.2)
The Gaussian exploration noise is driven by explicit PRNG keys and can be
switched off for deterministic parity tests.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def pid_step(ctrl_state, x, key: Optional[jax.Array], *, vt: float, noise: bool = True):
    """One PID control step. ``ctrl_state`` is unused (stateless controller).

    Returns ``(ctrl_state, u)`` with ``u = [delta, a]``.
    """
    steer = -0.6 * x[5] - 0.9 * x[3]
    accel = 1.5 * (vt - x[0])
    if noise and key is not None:
        k1, k2 = jax.random.split(key)
        steer = steer + jnp.clip(jax.random.normal(k1, dtype=x.dtype) * 0.25, -0.9, 0.9)
        accel = accel + jnp.clip(jax.random.normal(k2, dtype=x.dtype) * 0.10, -0.2, 0.2)
    u = jnp.stack([steer, accel]).astype(x.dtype)
    return ctrl_state, u


def make_pid_controller(vt: float, noise: bool = True):
    """Bind PID hyper-parameters; returns ``(step_fn, init_state)``."""

    def step(ctrl_state, x, key):
        return pid_step(ctrl_state, x, key, vt=vt, noise=noise)

    return step, ()
