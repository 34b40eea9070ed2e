"""Pallas TPU kernel: fused local system identification over the horizon.

One kernel evaluates the LMPC's full per-step local model — kNN candidate
search over every stored lap, Epanechnikov weighting, the two 5x5 weighted
least-squares solves, and the analytic constant-curvature kinematic rows —
for all N horizon queries of one scenario, VMEM-resident (reference
``regressionAndLinearization`` + ``computeIndices``,
`/root/reference/src/fnc/controller/PredictiveModel.py:48-197` — the
reference's dominant per-step cost, 12.4 ms on CPU, SURVEY §6).

Semantics match ``models/sysid.local_linearization_horizon`` (the XLA path,
parity-tested in ``tests/test_pallas_sysid.py``); the XLA path is already
batched onto the MXU so thoroughly that sys-ID is ~0.04% of the TPU control
step (BASELINE.md step split) — this kernel exists to keep the *whole*
model-learning path expressible as a single fused program (one HBM read of
the lap store per step instead of one per unrolled argmin round) and is
wired behind ``LMPCConfig.use_pallas_sysid``.

Layout: queries ride the sublane axis (N=14 padded to 16) and the stored-lap
time axis rides the lanes (T = model_pts, a multiple of 128), so the hot
(NQ, T) distance rounds reduce along lanes. (NQ, 1) per-query scalars are
expanded to (NQ, T) through an MXU ones-product (``lane_bcast``) — Mosaic
cannot lane-broadcast the replicated layout that lane reductions produce.
Neighbor gathers are one-hot (NQ, T) x (T, 16) MXU matmuls that pull all
raw-feature/target planes for the 16 queries at once.

The track's segment table and the scalar config (h, reg, dt, L) are baked in
as compile-time constants — the wrapper requires a *concrete* (host-built)
``Track``, which ``make_lmpc`` always has.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from racinglmpc_tpu.models import sysid as sysid_mod

_LANE = 128
_BIG = 1e30
_NQ = 16          # horizon queries padded to one sublane tile


def _gj_solve(Q, B):
    """Gauss–Jordan solve of a 5x5 system held as nested lists of (NQ, 1)
    arrays (diagonal pivoting; SPD + ridge jitter make it safe — same
    scheme as models/sysid._solve_small_spd)."""
    n = 5
    m = len(B[0])
    M = [[Q[i][j] for j in range(n)] + [B[i][j] for j in range(m)]
         for i in range(n)]
    for k in range(n):
        piv = M[k][k]
        row_k = [M[k][j] / piv for j in range(n + m)]
        for i in range(n):
            if i == k:
                continue
            f = M[i][k]
            M[i] = [M[i][j] - f * row_k[j] for j in range(n + m)]
        M[k] = row_k
    return [[M[i][n + j] for j in range(m)] for i in range(n)]


def _kernel(dist_ref, gath_ref, zq_ref, xq_ref, out_ref,
            *, K: int, T: int, knn: int, h: float, reg: float, dt: float,
            L: float, seg_s0: tuple, seg_curv: tuple):
    # Everything here must trace at "highest" matmul precision: the MXU
    # ones-product broadcasts and one-hot gathers are only EXACT when the
    # f32 operands go through the multi-pass decomposition — at the default
    # bf16 precision the broadcast values come back off by ~1e-2, min-index
    # selection finds no candidate row, and the gathers return zeros
    # (debugged on v5e; interpret mode hides it).
    with jax.default_matmul_precision("highest"):
        _kernel_body(dist_ref, gath_ref, zq_ref, xq_ref, out_ref,
                     K=K, T=T, knn=knn, h=h, reg=reg, dt=dt, L=L,
                     seg_s0=seg_s0, seg_curv=seg_curv)


def _kernel_body(dist_ref, gath_ref, zq_ref, xq_ref, out_ref,
                 *, K: int, T: int, knn: int, h: float, reg: float,
                 dt: float, L: float, seg_s0: tuple, seg_curv: tuple):
    f32 = jnp.float32
    ones_T = jnp.ones((1, T), f32)
    # Mosaic's tpu.iota is integer-only; cast to f32 for value comparisons
    col = jax.lax.broadcasted_iota(jnp.int32, (_NQ, T), 1).astype(f32)

    def lane_bcast(v, width=T, ones=None):
        # (NQ, 1) -> (NQ, width) via MXU ones-product (see module docstring)
        o = jnp.ones((1, width), f32) if ones is None else ones
        return jax.lax.dot_general(
            v, o, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    zq = zq_ref[:]      # (NQ, 8): scaled query features, cols 0-4
    xq = xq_ref[:]      # (NQ, 16): raw x_lin state 0-5, u_lin 6-7

    # --- accumulators for the two weighted normal equations ---------------
    # M_vx features [vx, vy, wz, a, 1] -> target vx';
    # M_lat features [vx, vy, wz, delta, 1] -> targets (vy', wz').
    zero = jnp.zeros((_NQ, 1), f32)
    Qvx = [[zero for _ in range(5)] for _ in range(5)]
    Qlat = [[zero for _ in range(5)] for _ in range(5)]
    bvx = [[zero] for _ in range(5)]
    blat = [[zero, zero] for _ in range(5)]

    for k in range(K):
        # scaled-L1 distance surface for this lap (NQ, T)
        D = jnp.zeros((_NQ, T), f32)
        for p in range(5):
            fp = dist_ref[k, p:p + 1, :]                     # (1, T)
            fq = lane_bcast(zq[:, p:p + 1])                  # (NQ, T)
            D = D + jnp.abs(fq - fp)                         # row bcast (1,T)
        valid = dist_ref[k, 5:6, :]                          # (1, T) 0/1
        D = D + (1.0 - valid) * _BIG                         # invalid -> BIG

        gp = gath_ref[k]                                     # (T, 16)
        for _ in range(knn):
            dmin = jnp.min(D, axis=1, keepdims=True)         # (NQ, 1)
            dmin_b = lane_bcast(dmin)
            # first index attaining the min (tolerance absorbs the 1-ulp
            # rounding a bcast through the MXU could introduce; near-ties
            # resolve to the FIRST row either way, like jnp.argmin)
            cand = D <= dmin_b * (1.0 + 1e-6) + 1e-12
            idx = jnp.min(jnp.where(cand, col, _BIG), axis=1, keepdims=True)
            # integer-valued f32 compare with 0.5 slack: exact selection even
            # if the MXU bcast rounds by an ulp
            onehot = (jnp.abs(col - lane_bcast(idx)) < 0.5).astype(f32)
            D = D + onehot * _BIG                            # exclude next round
            w = jnp.where(dmin < h, 0.75 * (1.0 - (dmin / h) ** 2), 0.0)
            # gather raw features + successor targets: one MXU product
            sel = jax.lax.dot_general(
                onehot, gp, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)                  # (NQ, 16)
            vx = sel[:, 0:1]
            vy = sel[:, 1:2]
            wz = sel[:, 2:3]
            de = sel[:, 3:4]
            ac = sel[:, 4:5]
            yv = [sel[:, 5:6], sel[:, 6:7], sel[:, 7:8]]     # vx', vy', wz'
            one = jnp.full((_NQ, 1), 1.0, f32)
            mvx = [vx, vy, wz, ac, one]
            mlat = [vx, vy, wz, de, one]
            for a in range(5):
                wa_vx = w * mvx[a]
                wa_lat = w * mlat[a]
                for b in range(a, 5):
                    Qvx[a][b] = Qvx[a][b] + wa_vx * mvx[b]
                    Qlat[a][b] = Qlat[a][b] + wa_lat * mlat[b]
                bvx[a][0] = bvx[a][0] + wa_vx * yv[0]
                blat[a][0] = blat[a][0] + wa_lat * yv[1]
                blat[a][1] = blat[a][1] + wa_lat * yv[2]

    # symmetrize + ridge
    regc = jnp.full((_NQ, 1), reg, f32)
    for a in range(5):
        Qvx[a][a] = Qvx[a][a] + regc
        Qlat[a][a] = Qlat[a][a] + regc
        for b in range(a):
            Qvx[a][b] = Qvx[b][a]
            Qlat[a][b] = Qlat[b][a]

    th_vx = _gj_solve(Qvx, bvx)     # [5][1]
    th_lat = _gj_solve(Qlat, blat)  # [5][2]

    # --- analytic constant-curvature kinematic rows (sysid.py:226-269) ----
    vx_q = xq[:, 0:1]
    vy_q = xq[:, 1:2]
    epsi = xq[:, 3:4]
    s = xq[:, 4:5]
    ey = xq[:, 5:6]

    s_w = jnp.where(s > L, s - L * jnp.floor(s / L), s)
    cur = jnp.zeros((_NQ, 1), f32)
    S = len(seg_s0)
    for i in range(S):
        lo = (s_w >= seg_s0[i]) if i > 0 else jnp.full((_NQ, 1), True)
        hi = (s_w < seg_s0[i + 1]) if i < S - 1 else jnp.full((_NQ, 1), True)
        cur = jnp.where(lo & hi, seg_curv[i], cur)

    den = 1.0 - cur * ey
    den = jnp.where(den >= 0, jnp.maximum(den, 0.05), jnp.minimum(den, -0.05))
    ce, se = jnp.cos(epsi), jnp.sin(epsi)
    sdot = (vx_q * ce - vy_q * se) / den
    hh = dt
    one = jnp.full((_NQ, 1), 1.0, f32)
    zeroc = zero

    row_epsi = [-hh * ce / den * cur, hh * se / den * cur, hh * one,
                1.0 - hh * (-vx_q * se - vy_q * ce) / den * cur, zeroc,
                hh * (vx_q * ce - vy_q * se) / (den ** 2) * cur * (-cur)]
    f_epsi = epsi + hh * (xq[:, 2:3] - sdot * cur)
    row_s = [hh * ce / den, -hh * se / den, zeroc,
             hh * (-vx_q * se - vy_q * ce) / den, one,
             -hh * (vx_q * ce - vy_q * se) / (den ** 2) * (-cur)]
    f_s = s + hh * sdot
    row_ey = [hh * se, hh * ce, zeroc, hh * (vx_q * ce - vy_q * se), zeroc,
              one]
    f_ey = ey + hh * (vx_q * se + vy_q * ce)

    def dotx(row):
        return sum(row[i] * xq[:, i:i + 1] for i in range(6))

    # --- assemble the flat (NQ, 64) output --------------------------------
    # cols [0:36] A row-major, [36:48] B row-major, [48:54] C
    A = [[zeroc] * 6 for _ in range(6)]
    B = [[zeroc, zeroc] for _ in range(6)]
    C = [zeroc] * 6
    for j in range(3):
        A[0][j] = th_vx[j][0]
        A[1][j] = th_lat[j][0]
        A[2][j] = th_lat[j][1]
    B[0][1] = th_vx[3][0]
    B[1][0] = th_lat[3][0]
    B[2][0] = th_lat[3][1]
    C[0] = th_vx[4][0]
    C[1] = th_lat[4][0]
    C[2] = th_lat[4][1]
    A[3], A[4], A[5] = row_epsi, row_s, row_ey
    C[3] = f_epsi - dotx(row_epsi)
    C[4] = f_s - dotx(row_s)
    C[5] = f_ey - dotx(row_ey)

    vals = [A[i][j] for i in range(6) for j in range(6)]
    vals += [B[i][j] for i in range(6) for j in range(2)]
    vals += C
    out_col = jax.lax.broadcasted_iota(jnp.int32, (_NQ, 64), 1)
    ones64 = jnp.ones((1, 64), f32)
    out = jnp.zeros((_NQ, 64), f32)
    for e, v in enumerate(vals):
        out = out + jnp.where(out_col == e, lane_bcast(v, 64, ones64), 0.0)
    out_ref[:] = out


@functools.partial(
    jax.jit,
    static_argnames=("knn", "h", "reg", "dt", "L", "seg_s0", "seg_curv",
                     "feat_scaling", "interpret"),
)
def _sysid_call(dist_planes, gather_planes, zq, xq,
                *, knn, h, reg, dt, L, seg_s0, seg_curv, feat_scaling,
                interpret):
    K, _, T = dist_planes.shape
    kern = functools.partial(
        _kernel, K=K, T=T, knn=knn, h=float(h), reg=float(reg),
        dt=float(dt), L=float(L), seg_s0=seg_s0, seg_curv=seg_curv,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((_NQ, 64), jnp.float32),
        in_specs=[vmem] * 4,
        out_specs=vmem,
        interpret=interpret,
    )(dist_planes, gather_planes, zq, xq)
    return out


def local_linearization_horizon(store, trk, x_lin: jnp.ndarray,
                                u_lin: jnp.ndarray, cfg, dt_ctrl: float = 0.1,
                                interpret: bool = False
                                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in fused-kernel replacement for
    ``models.sysid.local_linearization_horizon`` (same signature + outputs:
    (N,6,6), (N,6,2), (N,6)); ``vmap`` over scenarios turns the per-scenario
    program into a Pallas grid. Requires a concrete ``Track`` (the segment
    table is baked into the kernel as constants)."""
    f32 = jnp.float32
    N = x_lin.shape[0]
    K, T = store.x.shape[0], store.x.shape[1]
    assert T % _LANE == 0, f"model_pts must be a multiple of {_LANE}, got {T}"
    scaling = tuple(float(v) for v in cfg.feat_scaling)

    x = store.x.astype(f32)
    u = store.u.astype(f32)
    # distance planes (K, 8, T): rows 0-4 scaled [vx, vy, wz, delta, a],
    # row 5 validity (candidate rows 0..steps-2 of non-empty laps)
    feats = jnp.concatenate([x[:, :, :3], u], axis=2)        # (K, T, 5)
    scal = jnp.asarray(scaling, f32)
    dist = jnp.zeros((K, 8, T), f32)
    dist = dist.at[:, :5, :].set((feats * scal).transpose(0, 2, 1))
    n_valid = jnp.minimum(store.steps, T) - 1
    valid = (
        (jnp.arange(T)[None, :] < n_valid[:, None])
        & (store.steps < sysid_mod._EMPTY)[:, None]
    )
    dist = dist.at[:, 5, :].set(valid.astype(f32))
    # gather planes (K, T, 16): raw [vx, vy, wz, delta, a], successor
    # targets [vx', vy', wz'] (aligned at t; row T-1 never selected)
    succ = jnp.roll(x[:, :, :3], -1, axis=1)
    gather = jnp.zeros((K, T, 16), f32)
    gather = gather.at[:, :, :5].set(feats)
    gather = gather.at[:, :, 5:8].set(succ)

    zq_raw = jnp.concatenate([x_lin[:, :3], u_lin], axis=1).astype(f32)
    zq = jnp.zeros((_NQ, 8), f32).at[:N, :5].set(zq_raw * scal)
    xq = jnp.zeros((_NQ, 16), f32)
    xq = xq.at[:N, :6].set(x_lin.astype(f32)).at[:N, 6:8].set(u_lin.astype(f32))

    seg_s0 = tuple(float(v) for v in jax.device_get(trk.s0))
    seg_curv = tuple(float(v) for v in jax.device_get(trk.curv))
    out = _sysid_call(
        dist, gather, zq, xq,
        knn=int(cfg.knn_max), h=float(cfg.kernel_h),
        reg=float(cfg.reg_lambda + cfg.reg_jitter), dt=float(dt_ctrl),
        L=float(jax.device_get(trk.total_len)),
        seg_s0=seg_s0, seg_curv=seg_curv,
        feat_scaling=scaling, interpret=interpret,
    )
    dt_out = x_lin.dtype
    A = out[:N, 0:36].reshape(N, 6, 6).astype(dt_out)
    B = out[:N, 36:48].reshape(N, 6, 2).astype(dt_out)
    C = out[:N, 48:54].astype(dt_out)
    return A, B, C
