"""Pallas TPU kernel: fused batched plant rollout (100 Euler substeps).

The plant step (models/dynamics.py, reference SysModel.py:56-147) is 100
sequential Euler substeps of ~50 elementwise flops each. Under XLA the
``fori_loop`` body round-trips the (small) state through HBM every substep
and pays per-iteration scheduling; here the whole control period runs inside
one kernel with the state resident in VMEM.

Layout: states are carried **feature-major** — ``(8, B)`` tiles, the 6 state
features (padded to 8 sublanes) on the sublane axis and the scenario batch on
the 128-wide lane axis — so every substep is full-width VPU work. The track's
segment table (7 segments padded to 8) lives in VMEM and the curvature lookup
is a masked sum over segments instead of a ``searchsorted``.

Scalar vehicle/track/sim parameters ride in SMEM. Per-scenario (batched)
vehicle parameters fall back to the XLA path (models/dynamics.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from racinglmpc_tpu.models.track import Track
from racinglmpc_tpu.utils.config import SimConfig, VehicleParams

_LANE = 128
_NSEG_PAD = 8

_PI = 3.14159265358979
_TAN_PI_8 = 0.4142135623730950
_TAN_3PI_8 = 2.414213562373095


def _atan(x):
    """Branch-free float32 arctan (Cephes atanf ranges + degree-4 minimax);
    Pallas TPU has no atan/atan2 lowering, so we provide our own (~1e-7)."""
    sgn = jnp.sign(x)
    ax = jnp.abs(x)
    big = ax > _TAN_3PI_8
    mid = jnp.logical_and(jnp.logical_not(big), ax > _TAN_PI_8)
    ax_safe = jnp.maximum(ax, 1e-30)
    xr = jnp.where(
        big, -1.0 / ax_safe, jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax)
    )
    off = jnp.where(big, _PI / 2, jnp.where(mid, _PI / 4, 0.0))
    z = xr * xr
    p = (((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1)
         * z - 3.33329491539e-1) * z * xr + xr
    return sgn * (off + p)


def _atan2(y, x):
    """Branch-free float32 atan2 built on :func:`_atan`."""
    x_safe = jnp.where(jnp.abs(x) < 1e-30, 1e-30, x)
    base = _atan(y / x_safe)
    add = jnp.where(y >= 0, _PI, -_PI)
    return jnp.where(x > 0, base, jnp.where(x < 0, base + add,
                                            jnp.sign(y) * (_PI / 2)))


def _kernel(par_ref, seg_ref, x_ref, xg_ref, u_ref, out_x_ref, out_xg_ref,
            *, substeps: int):
    # scalar params (SMEM row): m lf lr Iz Df Cf Bf Dr Cr Br dT L den_eps
    m = par_ref[0, 0]
    lf = par_ref[0, 1]
    lr = par_ref[0, 2]
    Iz = par_ref[0, 3]
    Df = par_ref[0, 4]
    Cf = par_ref[0, 5]
    Bf = par_ref[0, 6]
    Dr = par_ref[0, 7]
    Cr = par_ref[0, 8]
    Br = par_ref[0, 9]
    dT = par_ref[0, 10]
    L = par_ref[0, 11]
    den_eps = par_ref[0, 12]

    seg = seg_ref[:]          # (3, _NSEG_PAD): rows = s0, s_end, curvature
    delta = u_ref[0, :]       # (B,)
    a = u_ref[1, :]

    def substep(_, st):
        x, xg = st
        vx, vy, wz = x[0], x[1], x[2]
        epsi, s, ey = x[3], x[4], x[5]
        psi, X, Y = xg[3], xg[4], xg[5]

        # Pacejka lateral forces (SysModel.py:96-101)
        alpha_f = delta - _atan2(vy + lf * wz, vx)
        alpha_r = -_atan2(vy - lr * wz, vx)
        fyf = Df * jnp.sin(Cf * _atan(Bf * alpha_f))
        fyr = Dr * jnp.sin(Cr * _atan(Br * alpha_r))

        dvx = a - fyf * jnp.sin(delta) / m + wz * vy
        dvy = (fyf * jnp.cos(delta) + fyr) / m - wz * vx
        dwz = (lf * fyf * jnp.cos(delta) - lr * fyr) / Iz

        # curvature: wrap s into [0, L) for s > L, masked segment sum
        s_w = jnp.where(s > L, s - L * jnp.floor(s / L), s)
        cur = jnp.zeros_like(s)
        for k in range(_NSEG_PAD):
            inseg = jnp.logical_and(s_w >= seg[0, k], s_w < seg[1, k])
            cur = cur + jnp.where(inseg, seg[2, k], 0.0)

        den = 1.0 - cur * ey
        den = jnp.where(
            den >= 0, jnp.maximum(den, den_eps), jnp.minimum(den, -den_eps)
        )
        ce, se = jnp.cos(epsi), jnp.sin(epsi)
        s_dot = (vx * ce - vy * se) / den
        depsi = wz - s_dot * cur
        dey = vx * se + vy * ce

        cp, sp = jnp.cos(psi), jnp.sin(psi)
        x_new = jnp.stack([
            vx + dT * dvx, vy + dT * dvy, wz + dT * dwz,
            epsi + dT * depsi, s + dT * s_dot, ey + dT * dey,
            x[6], x[7],
        ])
        xg_new = jnp.stack([
            vx + dT * dvx, vy + dT * dvy, wz + dT * dwz,
            psi + dT * wz,
            X + dT * (vx * cp - vy * sp),
            Y + dT * (vx * sp + vy * cp),
            xg[6], xg[7],
        ])
        return x_new, xg_new

    x, xg = jax.lax.fori_loop(0, substeps, substep, (x_ref[:], xg_ref[:]))
    out_x_ref[:] = x
    out_xg_ref[:] = xg


def _seg_table(trk: Track) -> jnp.ndarray:
    """(3, 8) rows [s0, s_end, curvature]; padding rows never match."""
    s0 = trk.s0.astype(jnp.float32)
    send = s0 + trk.seg_len.astype(jnp.float32)
    cur = trk.curv.astype(jnp.float32)
    n = s0.shape[0]
    pad = _NSEG_PAD - n
    big = jnp.full((pad,), 1e30, jnp.float32)
    return jnp.stack([
        jnp.concatenate([s0, big]),
        jnp.concatenate([send, big]),
        jnp.concatenate([cur, jnp.zeros(pad, jnp.float32)]),
    ])
    # the final segment's s_end == L; s_w < L by construction of the wrap


def _params_row(vp: VehicleParams, cfg: SimConfig, trk: Track) -> jnp.ndarray:
    vals = [vp.m, vp.lf, vp.lr, vp.Iz, vp.Df, vp.Cf, vp.Bf, vp.Dr, vp.Cr,
            vp.Br, cfg.delta_t, trk.total_len, 0.05]
    row = jnp.zeros((1, 16), jnp.float32)
    return row.at[0, : len(vals)].set(jnp.asarray(vals, jnp.float32))


@functools.partial(jax.jit, static_argnames=("substeps", "interpret"))
def _rollout_call(params, seg, x, xg, u, substeps: int, interpret: bool):
    B = x.shape[1]
    kern = functools.partial(_kernel, substeps=substeps)
    out_shape = [
        jax.ShapeDtypeStruct((8, B), jnp.float32),
        jax.ShapeDtypeStruct((8, B), jnp.float32),
    ]
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(params, seg, x, xg, u)


def plant_step_batch(
    x: jnp.ndarray,        # (B, 6) curvilinear states
    x_glob: jnp.ndarray,   # (B, 6) global states
    u: jnp.ndarray,        # (B, 2) inputs
    vp: VehicleParams,
    trk: Track,
    cfg: SimConfig,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused batched control-period rollout (noise-free part).

    Returns (x_next, x_glob_next), each (B, 6). Batch is padded to a lane
    multiple internally. Scalar ``vp`` only (batched params -> XLA path).
    """
    B = x.shape[0]
    Bp = -(-B // _LANE) * _LANE
    dt_in = x.dtype

    def to_fm(a):  # (B, k) -> feature-major (8, Bp) f32
        out = jnp.zeros((8, Bp), jnp.float32)
        return out.at[: a.shape[1], :B].set(a.astype(jnp.float32).T)

    # pad vx with 1 to keep atan2(0, vx_pad) well-defined in dead lanes
    xf = to_fm(x).at[0, B:].set(1.0)
    xgf = to_fm(x_glob).at[0, B:].set(1.0)
    uf = to_fm(u)

    params = _params_row(vp, cfg, trk)
    seg = _seg_table(trk)
    ox, oxg = _rollout_call(params, seg, xf, xgf, uf, cfg.substeps, interpret)
    return ox[:6, :B].T.astype(dt_in), oxg[:6, :B].T.astype(dt_in)
