"""Track geometry as fixed-shape arrays + branch-free JAX transforms.

The reference (`/root/reference/src/fnc/simulator/Track.py`) builds a
piecewise line/arc centerline table ``PointAndTangent`` and then walks it with
data-dependent Python loops (`while` s-wrapping, `np.where` segment search,
`pdb.set_trace` failure traps). Here the same geometry is precomputed on the
host into a :class:`Track` pytree of per-segment arrays, and all queries
(curvature, frame transforms) are pure, vectorized, jit/vmap-friendly
functions: segment lookup is a ``searchsorted`` over cumulative arc length and
all branches are ``jnp.where`` selects.

Semantics reproduced (reference file:line):
- table construction incl. the closing segment      Track.py:54-133
- ``curvature(s)``                                  Track.py:292-310
- ``getGlobalPosition(s, ey)``                      Track.py:135-189
- ``getAngle(s, epsi)``                             Track.py:312-349
- ``getLocalPosition(x, y, psi)``                   Track.py:191-290
  (out-of-track returns an invalid flag instead of dropping into pdb)
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class Track(NamedTuple):
    """Per-segment geometry table (all leaves are arrays → a JAX pytree).

    ``S`` segments (reference L-track: 6 spec rows + 1 closing segment = 7).
    Arc segments carry their precomputed center and start angle so queries
    need no trig solves.
    """

    s0: jnp.ndarray        # (S,) cumulative arc length at segment start
    seg_len: jnp.ndarray   # (S,) segment length
    curv: jnp.ndarray      # (S,) signed curvature (0 for straights)
    x0: jnp.ndarray        # (S,) start point
    y0: jnp.ndarray        # (S,)
    psi0: jnp.ndarray      # (S,) tangent angle at start
    cx: jnp.ndarray        # (S,) arc center (0 for straights)
    cy: jnp.ndarray        # (S,)
    theta0: jnp.ndarray    # (S,) angle of start point about center (arcs)
    total_len: jnp.ndarray  # () track length
    half_width: jnp.ndarray  # ()
    slack: jnp.ndarray     # () out-of-lane tolerance used by local_position


# Reference L-shaped track spec rows [segment length, signed radius]
# (Track.py:31-40). radius 0 => straight.
_L_CURVE = 4.5
L_TRACK_SPEC = np.array(
    [
        [1.0, 0.0],
        [_L_CURVE, _L_CURVE / np.pi],
        [_L_CURVE / 2.0, -_L_CURVE / np.pi],
        [_L_CURVE, _L_CURVE / np.pi],
        [_L_CURVE / np.pi * 2.0, 0.0],
        [_L_CURVE / 2.0, _L_CURVE / np.pi],
    ]
)


def _wrap(a: float) -> float:
    return (a + np.pi) % (2.0 * np.pi) - np.pi


def make_track(
    spec: Optional[np.ndarray] = None,
    half_width: float = 0.4,
    slack: float = 0.45,
    dtype=jnp.float32,
) -> Track:
    """Build a :class:`Track` from ``spec`` rows ``[length, signed radius]``.

    Host-side (NumPy, float64) construction mirroring Track.py:54-133: each
    segment starts at the previous segment's end pose; a final straight
    segment closes the loop back to the origin.
    """
    if spec is None:
        spec = L_TRACK_SPEC
    spec = np.asarray(spec, dtype=np.float64)
    n = spec.shape[0]
    S = n + 1

    s0 = np.zeros(S)
    seg_len = np.zeros(S)
    curv = np.zeros(S)
    x0 = np.zeros(S)
    y0 = np.zeros(S)
    psi0 = np.zeros(S)
    cx = np.zeros(S)
    cy = np.zeros(S)
    theta0 = np.zeros(S)

    x, y, psi, s = 0.0, 0.0, 0.0, 0.0
    for i in range(n):
        length, radius = spec[i]
        x0[i], y0[i], psi0[i], s0[i] = x, y, psi, s
        seg_len[i] = length
        if radius == 0.0:
            x += length * np.cos(psi)
            y += length * np.sin(psi)
        else:
            curv[i] = 1.0 / radius
            direction = 1.0 if radius >= 0 else -1.0
            cx[i] = x + abs(radius) * np.cos(psi + direction * np.pi / 2.0)
            cy[i] = y + abs(radius) * np.sin(psi + direction * np.pi / 2.0)
            theta0[i] = np.arctan2(y - cy[i], x - cx[i])
            span = length / abs(radius)
            ang_end = theta0[i] + direction * span
            x = cx[i] + abs(radius) * np.cos(ang_end)
            y = cy[i] + abs(radius) * np.sin(ang_end)
            psi = _wrap(psi + span * np.sign(radius))
        s += length

    # closing straight segment back to the origin (Track.py:119-130)
    x0[n], y0[n], psi0[n], s0[n] = x, y, psi, s
    seg_len[n] = np.hypot(x, y)
    # reference defines the closing segment's tangent as psi_f = 0; its start
    # tangent is the previous segment's end tangent (already in psi).

    total = s0[n] + seg_len[n]
    as_j = lambda a: jnp.asarray(a, dtype=dtype)  # noqa: E731
    return Track(
        s0=as_j(s0),
        seg_len=as_j(seg_len),
        curv=as_j(curv),
        x0=as_j(x0),
        y0=as_j(y0),
        psi0=as_j(psi0),
        cx=as_j(cx),
        cy=as_j(cy),
        theta0=as_j(theta0),
        total_len=as_j(total),
        half_width=as_j(half_width),
        slack=as_j(slack),
    )


def wrap_s(track: Track, s: jnp.ndarray) -> jnp.ndarray:
    """Wrap arc length into [0, L) for s > L (reference leaves s <= L alone)."""
    L = track.total_len
    return jnp.where(s > L, s - L * jnp.floor(s / L), s)


def _segment_index(track: Track, s_w: jnp.ndarray) -> jnp.ndarray:
    idx = jnp.searchsorted(track.s0, s_w, side="right") - 1
    return jnp.clip(idx, 0, track.s0.shape[0] - 1)


def curvature(track: Track, s: jnp.ndarray) -> jnp.ndarray:
    """Signed curvature at arc length ``s`` (Track.py:292-310). Vectorized."""
    s_w = wrap_s(track, s)
    return track.curv[_segment_index(track, s_w)]


def tangent_angle(track: Track, s: jnp.ndarray, epsi: jnp.ndarray = 0.0) -> jnp.ndarray:
    """Heading of the centerline tangent at ``s`` plus ``epsi`` (Track.py:312-349)."""
    s_w = wrap_s(track, s)
    i = _segment_index(track, s_w)
    psi = track.psi0[i] + (s_w - track.s0[i]) * track.curv[i]
    psi = jnp.arctan2(jnp.sin(psi), jnp.cos(psi))
    return psi + epsi


def global_position(track: Track, s: jnp.ndarray, ey: jnp.ndarray):
    """Curvilinear (s, ey) -> inertial (X, Y) (Track.py:135-189). Vectorized."""
    s_w = wrap_s(track, s)
    i = _segment_index(track, s_w)
    ds = s_w - track.s0[i]
    psi = track.psi0[i]
    kappa = track.curv[i]
    # straight branch
    xs = track.x0[i] + ds * jnp.cos(psi) - ey * jnp.sin(psi)
    ys = track.y0[i] + ds * jnp.sin(psi) + ey * jnp.cos(psi)
    # arc branch: point at radius (|r| - dir*ey) about the center
    r_abs = jnp.where(kappa != 0.0, 1.0 / jnp.abs(jnp.where(kappa != 0.0, kappa, 1.0)), 0.0)
    direction = jnp.sign(kappa)
    ang = track.theta0[i] + direction * ds * jnp.abs(kappa)
    xa = track.cx[i] + (r_abs - direction * ey) * jnp.cos(ang)
    ya = track.cy[i] + (r_abs - direction * ey) * jnp.sin(ang)
    on_arc = kappa != 0.0
    return jnp.where(on_arc, xa, xs), jnp.where(on_arc, ya, ys)


def _wrap_angle(a):
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def local_position(track: Track, x: jnp.ndarray, y: jnp.ndarray, psi: jnp.ndarray):
    """Inertial (X, Y, psi) -> curvilinear (s, ey, epsi, valid) (Track.py:191-290).

    Evaluates every segment's candidate projection branch-free and picks the
    first valid one, matching the reference's first-match loop. Instead of the
    reference's ``pdb.set_trace()`` on out-of-track points, returns
    ``valid=False`` (and the reference's sentinel 1e4 values).
    """
    S = track.s0.shape[0]
    px = jnp.broadcast_to(x, jnp.shape(x))
    del px

    # straight candidates
    tx, ty = jnp.cos(track.psi0), jnp.sin(track.psi0)
    vx_, vy_ = x - track.x0, y - track.y0                    # (S,) via broadcast
    s_loc_line = vx_ * tx + vy_ * ty
    ey_line = -vx_ * ty + vy_ * tx
    epsi_line = _wrap_angle(psi - track.psi0)
    valid_line = (
        (track.curv == 0.0)
        & (s_loc_line >= 0.0)
        & (s_loc_line <= track.seg_len)
        & (jnp.abs(ey_line) <= track.half_width + track.slack)
    )

    # arc candidates
    kappa_safe = jnp.where(track.curv != 0.0, track.curv, 1.0)
    r_abs = 1.0 / jnp.abs(kappa_safe)
    direction = jnp.sign(track.curv)
    dxc, dyc = x - track.cx, y - track.cy
    theta = jnp.arctan2(dyc, dxc)
    arc2 = _wrap_angle(theta - track.theta0)                 # signed angle from start
    arc1 = track.seg_len * track.curv                        # total signed span
    s_loc_arc = jnp.abs(arc2) * r_abs
    ey_arc = -direction * (jnp.hypot(dxc, dyc) - r_abs)
    epsi_arc = _wrap_angle(psi - (track.psi0 + arc2))
    valid_arc = (
        (track.curv != 0.0)
        & (jnp.sign(arc1) == jnp.sign(arc2))
        & (jnp.abs(arc2) <= jnp.abs(arc1))
        & (jnp.abs(ey_arc) <= track.half_width + track.slack)
    )

    on_arc = track.curv != 0.0
    s_cand = track.s0 + jnp.where(on_arc, s_loc_arc, s_loc_line)
    ey_cand = jnp.where(on_arc, ey_arc, ey_line)
    epsi_cand = jnp.where(on_arc, epsi_arc, epsi_line)
    valid = jnp.where(on_arc, valid_arc, valid_line)

    any_valid = jnp.any(valid)
    first = jnp.argmax(valid)  # first True (first-match semantics)
    sentinel = jnp.asarray(10000.0, dtype=s_cand.dtype)
    s_out = jnp.where(any_valid, s_cand[first], sentinel)
    ey_out = jnp.where(any_valid, ey_cand[first], sentinel)
    epsi_out = jnp.where(any_valid, epsi_cand[first], sentinel)
    del S
    return s_out, ey_out, epsi_out, any_valid
