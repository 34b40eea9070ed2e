"""Cross-chip sharded giant-QP solver: one QP's dense blocks over a mesh.

This is the SURVEY §5.8 stretch goal and the BASELINE north-star clause
"dense blocks reduced via ICI collectives": solve ONE dense QP

    min 1/2 x'Px + q'x   s.t.   l <= Ax <= u

whose matrices do not fit (or are not worth holding) on a single chip, by
sharding ``P`` and ``A`` **row-wise** over a mesh axis and running every
matvec as a local GEMV plus ICI collectives. The product FTOCP (n=200) is
VMEM-resident and is served by the batched dense solver (``ops/qp.py``) —
per PARITY.md, sharding *that* problem adds collective latency for nothing.
This module exists for the regime the dense solver cannot enter: n in the
tens of thousands, where the dense KKT inverse alone (n^2 floats) exceeds a
chip's HBM. Per-chip memory here is (n + m) * n / p floats for the operator
blocks plus O((n + m)) vectors, so capacity scales linearly with mesh size.

Algorithm: OSQP-style ADMM in *indirect* mode (the dense solver's
Newton-Schulz KKT **inverse** is exactly the object that cannot exist at
giant scale), matching OSQP's own indirect linear-system option
(`/root/reference/src/fnc/controller/PredictiveControllers.py:259-283` uses
the direct mode at n=200): the x-update system

    K xt = rhs,   K = P + sigma*I + A' diag(rho) A

is solved by Jacobi-preconditioned conjugate gradient (diag(K) assembled
once with one psum'd column reduction; the constraint term scales linearly
with the adapted rho so adaptation never re-reduces), warm-started from the
previous iterate. Each K@v costs three local GEMVs and exactly two
collectives:

    t1 = all_gather_p( P_blk @ v )            # row shards -> full (n,)
    t3 = psum_p( A_blk' (rho_blk * (A_blk @ v)) )   # partial sums -> (n,)
    K@v = t1 + sigma*v + t3

CG vectors (x, r, p) are replicated (n,); the constraint-space state
(z, y, l, u, rho, E) stays sharded (m/p,) and its ADMM updates are purely
local. Ruiz equilibration runs sharded as well: column norms are
``pmax``-reduced across row shards, row norms are local.

Termination mirrors ``ops/qp.py``: residuals are checked every
``check_every`` iterations inside a ``while_loop`` whose predicate is a
replicated scalar, so every device exits the loop on the same iteration —
no device ever waits on a peer inside an iteration, only inside the
collectives themselves.

Validated against the vendored float64 interior-point oracle on an 8-device
mesh (``tests/test_qp_sharded.py``); the same program runs unchanged on a
multi-chip TPU slice, where the two collectives ride ICI.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from racinglmpc_tpu.ops.qp import QPData

BLOCK_AXIS = "block"


@dataclasses.dataclass(frozen=True)
class ShardedSolverConfig:
    """ADMM + CG settings for the sharded giant-QP solver.

    The defaults mirror ``SolverConfig`` where the algorithms coincide
    (rho/sigma/alpha/tolerances/Ruiz); the CG fields are specific to the
    indirect mode. ``cg_tol`` is relative to ||rhs||; the classic indirect-
    OSQP schedule tightens it as ADMM converges, but a fixed modest value
    plus warm-started CG measures equally well at these conditionings and
    keeps the loop state static.
    """

    max_iter: int = 500
    rho: float = 0.1
    rho_eq_scale: float = 1e3
    sigma: float = 1e-6
    alpha: float = 1.6
    eps_abs: float = 1e-3
    eps_rel: float = 1e-3
    scaling_iters: int = 10
    check_every: int = 25
    cg_tol: float = 1e-6
    cg_max_iter: int = 200
    # --- absolute-residual refinement tail (round-4 verdict item 4) ---
    # At giant n the main loop exits at eps_abs + eps_rel * scale, and the
    # scale term dominates (n=16384 demo: pri 1.9e-2 at eps 1e-3). The
    # dense path's direct reduced-KKT polish cannot exist at giant n, and
    # active-set clamping variants were measured UNRELIABLE from a loose
    # ADMM exit (a single mis-classified row converts the tail into a
    # wrong-manifold solve whose dual residual blows up 100x — tried:
    # OSQP-style dual-sign actives, slack-based actives at several
    # tolerances, freed-dual zeroing; all rejected by the acceptance test
    # on realistic problems). What works robustly is simpler: CONTINUE the
    # ADMM with an ABSOLUTE-only exit (the eps_rel term dropped) and a
    # ~100x tighter CG tolerance — float32 indirect ADMM reaches
    # eps_abs-dominated residuals (~1e-4..1e-3 unscaled) before its
    # precision stall. Accepted only on a material primal-residual
    # improvement with no dual blowup.
    polish: bool = True
    polish_iters: int = 60
    polish_check_every: int = 20
    # tuned jointly (measured, CPU mesh): 60 iters @ cg 1e-8 matches or
    # beats 150 @ 1e-10 (n=64: pri 4.4e-4 vs 4.2e-4; n=1024: 3.2e-3 vs
    # 4.3e-3) at 2-3x less CG work; at giant n the tail is still the
    # dominant cost of a polished solve (capacity rows in
    # BENCH_sharded_qp_demo.json report both)
    polish_cg_tol: float = 1e-8


class ShardedQPSolution(NamedTuple):
    x: jnp.ndarray        # (n,) primal (original coordinates), replicated
    y: jnp.ndarray        # (m,) dual, gathered back to the caller
    pri_res: jnp.ndarray  # () final unscaled primal residual (inf norm)
    dua_res: jnp.ndarray  # () final unscaled dual residual (inf norm)
    solved: jnp.ndarray   # () bool
    iters: jnp.ndarray    # () int32 ADMM iterations until tolerance
    cg_iters: jnp.ndarray  # () int32 total CG iterations spent


def _pad_qp(qp: QPData, p: int) -> tuple[QPData, int, int]:
    """Pad n and m up to multiples of the mesh size.

    Extra variables are decoupled (unit diagonal in P, zero q/A columns, so
    their optimum is 0); extra constraint rows are all-zero with free bounds
    (never active, never binding a residual).
    """
    n, m = qp.P.shape[0], qp.A.shape[0]
    n_pad = (-n) % p
    m_pad = (-m) % p
    if n_pad == 0 and m_pad == 0:
        return qp, n, m
    dt = qp.P.dtype
    P_ = jnp.zeros((n + n_pad, n + n_pad), dt).at[:n, :n].set(qp.P)
    if n_pad:
        P_ = P_.at[jnp.arange(n, n + n_pad), jnp.arange(n, n + n_pad)].set(1.0)
    q_ = jnp.zeros(n + n_pad, dt).at[:n].set(qp.q)
    A_ = jnp.zeros((m + m_pad, n + n_pad), dt).at[:m, :n].set(qp.A)
    inf = jnp.asarray(jnp.inf, dt)
    l_ = jnp.full(m + m_pad, -inf).at[:m].set(qp.l)
    u_ = jnp.full(m + m_pad, inf).at[:m].set(qp.u)
    return QPData(P_, q_, A_, l_, u_), n, m


def _ruiz_sharded(P_l, q, A_l, l_l, u_l, iters: int, ax: str):
    """Sharded modified Ruiz equilibration (see qp._ruiz_equilibrate).

    Column norms of the row-sharded P/A blocks are global-``pmax`` reduced;
    row norms and row scalings are local. D and c come back replicated,
    E sharded.
    """
    dt = P_l.dtype
    n = q.shape[0]
    nl = P_l.shape[0]
    ml = A_l.shape[0]
    row0 = jax.lax.axis_index(ax) * nl

    def body(_, carry):
        P_l, q, A_l, l_l, u_l, D, E_l, c = carry
        coln = jnp.maximum(
            jax.lax.pmax(jnp.max(jnp.abs(P_l), axis=0), ax),
            jax.lax.pmax(jnp.max(jnp.abs(A_l), axis=0), ax),
        )
        d = 1.0 / jnp.sqrt(jnp.where(coln > 1e-12, coln, 1.0))
        rown = jnp.max(jnp.abs(A_l), axis=1)
        e = 1.0 / jnp.sqrt(jnp.where(rown > 1e-12, rown, 1.0))
        d_rows = jax.lax.dynamic_slice(d, (row0,), (nl,))
        P_l = d_rows[:, None] * P_l * d[None, :]
        q = d * q
        A_l = e[:, None] * A_l * d[None, :]
        l_l = e * l_l
        u_l = e * u_l
        cn = jnp.mean(jax.lax.pmax(jnp.max(jnp.abs(P_l), axis=0), ax))
        gamma = 1.0 / jnp.maximum(jnp.maximum(cn, jnp.max(jnp.abs(q))), 1e-12)
        P_l = gamma * P_l
        q = gamma * q
        return (P_l, q, A_l, l_l, u_l, D * d, E_l * e, c * gamma)

    D = jnp.ones(n, dt)
    E_l = jnp.ones(ml, dt)
    c = jnp.asarray(1.0, dt)
    return jax.lax.fori_loop(
        0, iters, body, (P_l, q, A_l, l_l, u_l, D, E_l, c)
    )


def _solve_core(P_l, q, A_l, l_l, u_l, x_w, y_wl, cfg: ShardedSolverConfig,
                ax: str):
    """Per-device body (inside shard_map). Replicated args: q, x_w."""
    dt = P_l.dtype
    n = q.shape[0]
    nl = P_l.shape[0]

    P_l, q, A_l, l_l, u_l, D, E_l, c = _ruiz_sharded(
        P_l, q, A_l, l_l, u_l, cfg.scaling_iters, ax
    )

    is_eq_l = jnp.isfinite(l_l) & jnp.isfinite(u_l) & (u_l - l_l < 1e-12)
    rho0_l = jnp.where(is_eq_l, cfg.rho * cfg.rho_eq_scale, cfg.rho).astype(dt)
    sigma = jnp.asarray(cfg.sigma, dt)
    alpha = jnp.asarray(cfg.alpha, dt)

    # Jacobi preconditioner pieces for the CG x-update: diag(K) =
    # diag(P) + sigma + sum_i rho_i A_i,col^2. rho_l = rho0_l * rho_fac, so
    # the constraint term scales LINEARLY with rho_fac — one psum'd column
    # reduction up front covers every adapted rho.
    row0 = jax.lax.axis_index(ax) * nl
    diag_P = jax.lax.all_gather(
        P_l[jnp.arange(nl), row0 + jnp.arange(nl)], ax, tiled=True)
    colsum0 = jax.lax.psum(jnp.sum(rho0_l[:, None] * A_l * A_l, axis=0), ax)

    def apply_K(v, rho_l):
        t1 = jax.lax.all_gather(P_l @ v, ax, tiled=True)
        t3 = jax.lax.psum(A_l.T @ (rho_l * (A_l @ v)), ax)
        return t1 + sigma * v + t3

    def cg(rhs, x0, rho_l, rho_fac, tol=None, dK=None):
        """Warm-started Jacobi-PCG on K x = rhs; vectors replicated (n,).

        ``tol``/``dK`` default to the main-loop settings; the refinement
        tail passes its tighter tolerance and a hoisted preconditioner."""
        if dK is None:
            dK = jnp.maximum(diag_P + sigma + rho_fac * colsum0, 1e-12)
        r0 = rhs - apply_K(x0, rho_l)
        z0 = r0 / dK
        tol2 = ((cfg.cg_tol if tol is None else tol) ** 2) * jnp.maximum(
            rhs @ rhs, 1e-30)

        def cond(st):
            _, r, _, _, it = st
            return jnp.logical_and(r @ r > tol2, it < cfg.cg_max_iter)

        def body(st):
            x, r, pvec, rz, it = st
            Kp = apply_K(pvec, rho_l)
            a = rz / jnp.maximum(pvec @ Kp, 1e-30)
            x = x + a * pvec
            r = r - a * Kp
            z = r / dK
            rz_new = r @ z
            pvec = z + (rz_new / jnp.maximum(rz, 1e-30)) * pvec
            return (x, r, pvec, rz_new, it + 1)

        x, _, _, _, it = jax.lax.while_loop(
            cond, body, (x0, r0, z0, r0 @ z0, jnp.int32(0))
        )
        return x, it

    def residuals(x, y_l):
        # same residual definitions as qp._residuals (z = clip(Ax, l, u))
        Ax_l = A_l @ x
        z_c = jnp.clip(Ax_l, l_l, u_l)
        pri = jax.lax.pmax(jnp.max(jnp.abs((Ax_l - z_c) / E_l)), ax)
        Px = jax.lax.all_gather(P_l @ x, ax, tiled=True)
        Aty = jax.lax.psum(A_l.T @ y_l, ax)
        dua = jnp.max(jnp.abs((Px + q + Aty) * D / c))
        pri_sc = jax.lax.pmax(
            jnp.maximum(jnp.max(jnp.abs(Ax_l / E_l)),
                        jnp.max(jnp.abs(z_c / E_l))), ax)
        dua_sc = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Px * D)), jnp.max(jnp.abs(Aty * D))),
            jnp.max(jnp.abs(q * D)),
        ) / c
        return pri, dua, pri_sc, dua_sc

    def one_iter(x, z_l, y_l, cg_tot, rho_fac):
        rho_l = rho0_l * rho_fac
        rhs = sigma * x - q + jax.lax.psum(
            A_l.T @ (rho_l * z_l - y_l), ax)
        xt, cg_it = cg(rhs, x, rho_l, rho_fac)
        zt_l = A_l @ xt
        x_new = alpha * xt + (1.0 - alpha) * x
        z_rel = alpha * zt_l + (1.0 - alpha) * z_l
        z_new = jnp.clip(z_rel + y_l / rho_l, l_l, u_l)
        y_new = y_l + rho_l * (z_rel - z_new)
        return x_new, z_new, y_new, cg_tot + cg_it

    # warm start (previous solve of a nearby problem), scaled like the dense
    # solver: x = D x_s, y = E y_s / c; non-finite warm values fall back to 0
    fin = jnp.all(jnp.isfinite(x_w)) & jax.lax.pmin(
        jnp.all(jnp.isfinite(y_wl)).astype(jnp.int32), ax).astype(bool)
    x = jnp.where(fin, x_w.astype(dt) / D, jnp.zeros(n, dt))
    y_l = jnp.where(fin, c * y_wl.astype(dt) / E_l, jnp.zeros_like(l_l))
    z_l = jnp.clip(A_l @ x, l_l, u_l)

    chunk = max(cfg.check_every, 1)
    # floor like the dense solver (ops/qp.py) so the configured iteration
    # budget is honored exactly: max_iter % chunk trailing iterations are
    # dropped rather than overrun, and reported iters never exceed max_iter
    n_chunks = max(cfg.max_iter // chunk, 1)

    def run_chunk(x, z_l, y_l, cg_tot, rho_fac):
        def body(carry, _):
            x, z_l, y_l, cg_tot = carry
            return one_iter(x, z_l, y_l, cg_tot, rho_fac), None

        (x, z_l, y_l, cg_tot), _ = jax.lax.scan(
            body, (x, z_l, y_l, cg_tot), None, length=chunk)
        return x, z_l, y_l, cg_tot

    def cond(st):
        _, _, _, _, _, k, done, _, _, _ = st
        return jnp.logical_and(jnp.logical_not(done), k < n_chunks)

    def body(st):
        x, z_l, y_l, cg_tot, rho_fac, k, done, iters, pri_o, dua_o = st
        x, z_l, y_l, cg_tot = run_chunk(x, z_l, y_l, cg_tot, rho_fac)
        pri, dua, pri_sc, dua_sc = residuals(x, y_l)
        ok = (pri < cfg.eps_abs + cfg.eps_rel * pri_sc) & (
            dua < cfg.eps_abs + cfg.eps_rel * dua_sc
        )
        newly = ok & jnp.logical_not(done)
        iters = jnp.where(newly, (k + 1) * chunk, iters)
        # OSQP adaptive rho (indirect mode makes it FREE: no refactorization
        # — the next CG just sees a different operator). Adapt on the
        # primal/dual residual ratio, OSQP's adaptive_rho_tolerance = 5.
        ratio = jnp.sqrt(
            (pri / jnp.maximum(pri_sc, 1e-30))
            / jnp.maximum(dua / jnp.maximum(dua_sc, 1e-30), 1e-30)
        )
        scale = jnp.clip(ratio, 0.1, 10.0)
        adapt = jnp.logical_not(ok) & ((scale > 5.0) | (scale < 0.2))
        rho_fac = jnp.where(
            adapt, jnp.clip(rho_fac * scale, 1e-6, 1e6), rho_fac)
        return (x, z_l, y_l, cg_tot, rho_fac, k + 1, done | ok, iters,
                pri, dua)

    st0 = (x, z_l, y_l, jnp.int32(0), jnp.asarray(1.0, dt), jnp.int32(0),
           jnp.asarray(False), jnp.int32(cfg.max_iter),
           jnp.asarray(jnp.inf, dt), jnp.asarray(jnp.inf, dt))
    x, z_l, y_l, cg_tot, rho_fac, _, done, iters, pri, dua = \
        jax.lax.while_loop(cond, body, st0)

    if cfg.polish and cfg.polish_iters > 0:
        # ---- refinement tail (see ShardedSolverConfig.polish) ------------
        rho_l = rho0_l * rho_fac
        dK_tail = jnp.maximum(diag_P + sigma + rho_fac * colsum0, 1e-12)

        def r_iter(carry, _):
            x, z_l, y_l, cg_tot = carry
            rhs = sigma * x - q + jax.lax.psum(
                A_l.T @ (rho_l * z_l - y_l), ax)
            xt, cg_it = cg(rhs, x, rho_l, rho_fac,
                           tol=cfg.polish_cg_tol, dK=dK_tail)
            zt_l = A_l @ xt
            x_n = alpha * xt + (1.0 - alpha) * x
            z_rel = alpha * zt_l + (1.0 - alpha) * z_l
            z_n = jnp.clip(z_rel + y_l / rho_l, l_l, u_l)
            y_n = y_l + rho_l * (z_rel - z_n)
            return (x_n, z_n, y_n, cg_tot + cg_it), None

        chunk_p = max(cfg.polish_check_every, 1)
        n_pchunks = max(cfg.polish_iters // chunk_p, 1)

        def pcond(st):
            _, _, _, _, k, done_p, _, _ = st
            return jnp.logical_and(jnp.logical_not(done_p), k < n_pchunks)

        def pbody(st):
            x, z_l, y_l, cg_tot, k, done_p, pri_c, dua_c = st
            (x, z_l, y_l, cg_tot), _ = jax.lax.scan(
                r_iter, (x, z_l, y_l, cg_tot), None, length=chunk_p)
            pri_c, dua_c, _, _ = residuals(x, y_l)
            ok = (pri_c < cfg.eps_abs) & (dua_c < cfg.eps_abs)
            return (x, z_l, y_l, cg_tot, k + 1, ok, pri_c, dua_c)

        x_p, z_p, y_p, cg_tot_p, _, _, pri_p, dua_p = jax.lax.while_loop(
            pcond, pbody,
            (x, z_l, y_l, cg_tot, jnp.int32(0), jnp.asarray(False),
             pri, dua))
        fin = jax.lax.pmin(
            (jnp.all(jnp.isfinite(x_p))
             & jnp.all(jnp.isfinite(y_p))).astype(jnp.int32),
            ax).astype(bool)
        better = fin & (pri_p < 0.7 * pri) & (
            dua_p < 2.0 * dua + cfg.eps_abs)
        x = jnp.where(better, x_p, x)
        y_l = jnp.where(better, y_p, y_l)
        pri = jnp.where(better, pri_p, pri)
        dua = jnp.where(better, dua_p, dua)
        done = done | (better & (pri_p < cfg.eps_abs) & (dua_p < cfg.eps_abs))
        cg_tot = jnp.where(better, cg_tot_p, cg_tot)

    x_u = D * x
    y_u = E_l * y_l / c
    return x_u, y_u, pri, dua, done, iters, cg_tot


def solve_sharded(
    qp: QPData,
    mesh: Mesh,
    axis_name: str = BLOCK_AXIS,
    cfg: Optional[ShardedSolverConfig] = None,
    warm: Optional[tuple] = None,
) -> ShardedQPSolution:
    """Solve ONE giant dense QP with its blocks sharded over ``mesh``.

    ``mesh`` must be 1-D over ``axis_name``. P/A rows (and the constraint-
    space vectors) are split across the axis; n and m are padded internally
    to multiples of the mesh size. All matmuls run at HIGHEST precision for
    the same conditioning reason as the dense solver.

    ``warm``: optional ``(x, y)`` primal/dual start in original (unscaled)
    coordinates — e.g. the previous solve of a slowly-drifting problem.
    """
    if cfg is None:
        cfg = ShardedSolverConfig()
    if mesh.axis_names != (axis_name,):
        raise ValueError(
            f"solve_sharded requires a 1-D mesh over {axis_name!r}; got "
            f"axis_names={mesh.axis_names!r}"
        )
    p = mesh.devices.size
    qp_pad, n, m = _pad_qp(qp, p)
    dt = qp_pad.P.dtype

    if warm is not None:
        x_w = jnp.zeros(qp_pad.q.shape[0], dt).at[:n].set(
            warm[0].astype(dt))
        y_w = jnp.zeros(qp_pad.l.shape[0], dt).at[:m].set(
            warm[1].astype(dt))
    else:
        x_w = jnp.zeros(qp_pad.q.shape[0], dt)
        y_w = jnp.zeros(qp_pad.l.shape[0], dt)

    shard_rows = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    P_s = jax.device_put(qp_pad.P, NamedSharding(mesh, P(axis_name, None)))
    q_s = jax.device_put(qp_pad.q, repl)
    A_s = jax.device_put(qp_pad.A, NamedSharding(mesh, P(axis_name, None)))
    l_s = jax.device_put(qp_pad.l, shard_rows)
    u_s = jax.device_put(qp_pad.u, shard_rows)
    xw_s = jax.device_put(x_w, repl)
    yw_s = jax.device_put(y_w, shard_rows)

    core = partial(_solve_core, cfg=cfg, ax=axis_name)
    mapped = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(None), P(axis_name, None),
                  P(axis_name), P(axis_name), P(None), P(axis_name)),
        out_specs=(P(), P(axis_name), P(), P(), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def run(P_s, q_s, A_s, l_s, u_s, xw_s, yw_s):
        with jax.default_matmul_precision("highest"):
            return mapped(P_s, q_s, A_s, l_s, u_s, xw_s, yw_s)

    x_u, y_u, pri, dua, solved, iters, cg_tot = run(
        P_s, q_s, A_s, l_s, u_s, xw_s, yw_s)
    return ShardedQPSolution(
        x=x_u[:n], y=y_u[:m], pri_res=pri, dua_res=dua,
        solved=solved, iters=iters, cg_iters=cg_tot,
    )
