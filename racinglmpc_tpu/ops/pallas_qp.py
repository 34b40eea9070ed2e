"""Pallas TPU kernel: VMEM-resident ADMM iteration loop.

The batched XLA ADMM (ops/qp.py) re-reads each scenario's Kinv/A/P from HBM
every iteration (~1 GB per iteration at batch 1024 — the solve is
HBM-bandwidth-bound). This kernel keeps one scenario's problem data resident
in VMEM (~900 KB: Kinv 256x256, P 256x256, A 384x256 + vectors) and runs the
whole iteration loop on-chip.

Two structural wins over the XLA path:

1. **One HBM pass per solve** instead of one per iteration.
2. **Per-scenario early exit**: the kernel is written for a single problem
   and batched with ``vmap`` (which turns the batch into a Pallas grid), so
   each scenario's ``while_loop`` stops at ITS convergence — under a vmapped
   XLA while_loop every scenario pays for the slowest one.

Shapes are padded to lane multiples (n -> 256, m -> 384 for the LMPC FTOCP);
padding rows/cols are zero with l = u = 0 and rho = 1 so padded entries stay
exactly zero through the iteration (verified in tests).

Design notes from rejected variants (measured on TPU v5e, batch 256 LMPC):

- **K-resident refine**: keeping K = P + sigma I + A' rho A (instead of P)
  in VMEM shortens the x-update's iterative-refinement chain from 3 matvecs
  to 1 (measured ~8% step-rate win) — but forming K explicitly in f32 bakes
  a fixed perturbation dK (rounding of the P + A'rhoA sum) into the refine
  operator, so refinement converges to (K+dK)^-1 rhs: solution error ~
  cond(K)*eps_f32 ~ 1e-1 at the FTOCP's cond ~1e6. The 3-matvec form applies
  the EXACT operator (per-application rounding only, no fixed bias) and is
  load-bearing for the 1e-4-tolerance presets. Do not re-form K.
- **Scenario tiling** (S scenarios per grid program, matvecs unrolled so
  Mosaic pipelines their MXU chains): S=1 5522 solves/s vs S=4 4829 — the
  heavy-tailed iteration distribution makes per-scenario early exit worth
  more than the pipelining (a tile runs until its SLOWEST scenario
  converges); S=8 OOMs VMEM (~21 MB with double buffering).
- **Lowered iteration precision** (round 3): running the iteration-loop
  dots below full f32 fidelity — either one truncated bf16 pass (DEFAULT)
  or a hand-rolled 3-product bf16 hi/lo decomposition (~2^-16 operator
  error) — fails outright on TPU: the scaled KKT's effective conditioning
  amplifies the operator error above the 1e-2 acceptance threshold, so
  every scenario runs to max_iter and is rejected (measured batch 256:
  bf16x3 2110 solves/s all-rejected vs 5465 healthy baseline). The 6-pass
  HIGHEST iteration dots are load-bearing; per-iteration MXU cost is not
  reducible via precision. (Mosaic supports only DEFAULT/HIGHEST for f32
  dots — lax.Precision.HIGH does not lower.)
- The tiled dispatch needed ``jax.custom_batching.custom_vmap`` (pad batch,
  regroup as (G, S)); under ``jit(vmap(jit(...)))`` nesting — and in the
  closed-loop scan of the real experiment — the custom_vmap'd pallas_call
  SILENTLY returned unwritten output buffers (NaN/zeros) on TPU while
  interpret-mode unit tests passed. Plain ``vmap`` of a single-scenario
  ``pallas_call`` (the structure here) is the only dispatch that has proven
  robust; any future dispatch rework must be validated with an on-TPU
  closed-loop quality run (lap times must *decrease*), not just unit tests.

Used by ops/qp.py when ``SolverConfig.use_pallas`` is set, the dtype is
float32, rho is fixed (``adaptive_rho=False``), and the backend is TPU;
interpret mode covers CPU tests.

Round-3 extension — the FUSED-PROLOGUE kernel (:func:`admm_iterate_fused`),
kept as a tested option but MEASURED SLOWER in the product loop; presets do
not enable it. The motivating stage profile (``examples/profile_qp.py``,
batch 256) showed XLA-side Newton-Schulz refactorization at 13.9 ms — but
that was a one-step artifact: the profiler captures a single step's inputs,
and at THAT step a stale lane forced the vmapped (lockstep) NS while_loop
through a ~30-iteration cold build. In loop steady state the warm refresh is
1-3 lockstep iterations (~1-2 ms), so moving it in-kernel:

    K = P + sigma I + A' rho A      (one M=256 MXU GEMM)
    Kinv = NewtonSchulz(K, warm X0) (per-scenario early exit, 2 GEMMs/iter)
    ADMM iteration loop             (as admm_iterate)

trades batched XLA GEMMs (full-MXU, pipelined across the batch) for
grid-serial in-program GEMMs plus ~70% more per-program VMEM I/O, and loses:
measured on the bench workload, fused 5371.7 vs unfused 5527.9 solves/s in
one process (and the Ruiz-refresh win is larger without it: 5904 vs 5725).
The padding/NS structure is kept correct and parity-tested
(test_pallas_qp.py::test_fused_ns_*) in case a future workload has a
heavy-tailed NS distribution in steady state — that is the one regime where
per-scenario NS exit beats batched lockstep. Padding note: the padded tail
of K's diagonal is 1 (not sigma) and the padded warm Kinv carries a unit
diagonal, so the pad block is exactly inverted from iteration 0.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_BIG = 1e30


def _pad_to(x: int) -> int:
    return -(-x // _LANE) * _LANE


def _admm_core(P, Kinv, A, vec, x0, z0, y0,
               *, sigma: float, alpha: float, eps_abs: float, eps_rel: float,
               max_iter: int, check_every: int, refine_steps: int,
               iter_precision: str, np_: int, mp_: int,
               Arho=None, n_real: int = 0,
               rescue_max_iter: int = 0, rescue_rho_scale: float = 5.0,
               rescue_trigger: float = 7.5e-3, rescue_exit: float = 1e-3,
               ns_tol: float = 1e-3, ns_max_iters: int = 40):
    """The VMEM-resident ADMM iteration loop (shared by both kernels).

    Takes VALUES already read from refs; returns (x, y, pri, dua, iters,
    done, rescued). ``vec`` rows: 0 q | 1 l | 2 u | 3 rho | 4 rho_inv | 5 D |
    6 E_inv (all length mp_; n-sized rows live in [:np_]); vec[7, 0] = 1/c.

    ``rescue_max_iter > 0`` enables the RHO-ESCALATION RESCUE stage
    (round-4 root-cause fix for the late-lap rejection bursts): when the
    main loop ends with unscaled primal residual above ``rescue_trigger``
    (i.e. the controller would reject the solve), rho is scaled by
    ``rescue_rho_scale``, the KKT inverse is rebuilt IN-KERNEL (Newton-
    Schulz, warm-tested from Kinv/scale with a Jacobi fallback) and up to
    ``rescue_max_iter`` further iterations run with an additional
    primal-only exit at ``rescue_exit``. Measured on the captured lap-11..15
    burst QPs (examples/probe_rejects.py + replay_rejects.py, TPU v5e):
    rho x5 converts 30/30 rejected solves into accepted ones AND improves
    solution accuracy vs the f64 oracle (|du0| p50 2.5e-2 -> 3.8e-3); a 10x
    iteration budget alone fixes only 5/30. Runs under ``lax.cond`` so
    scenarios that don't need it (the overwhelming steady state) skip the
    K-rebuild entirely; requires ``Arho`` = A * rho[:, None] (computed
    XLA-side — an (m,1) broadcast does not lower well in Mosaic) and
    ``n_real`` for the pad-block identity.
    """
    q = vec[0:1, :np_]
    l = vec[1:2, :]
    u = vec[2:3, :]
    rho = vec[3:4, :]
    rho_inv = vec[4:5, :]
    D = vec[5:6, :np_]
    E_inv = vec[6:7, :]
    c_inv = vec[7, 0]
    f32 = jnp.float32
    # Precision is pinned PER DOT, never taken from the ambient
    # default_matmul_precision context: the kernel must behave identically
    # whether traced inside qp.solve's "highest" context or standalone
    # (the round-2 roofline harness traced it bare and silently got the
    # default bf16 single-pass lowering — no scenario converged).
    # - residual checks always run at HIGHEST: they gate acceptance and the
    #   unscaled tolerances are meaningless if the check itself rounds.
    # - the iteration-loop dots run at ``iter_precision``: ADMM is a
    #   fixed-point iteration whose converged accuracy is enforced by the
    #   (full-precision) residual check, so the per-iteration operator may
    #   round as long as the iteration still contracts to tolerance —
    #   "high" (3-pass bf16 decomposition) halves the MXU passes of
    #   "highest" (6-pass). Quality-gated by on-TPU closed-loop runs.
    prec_check = jax.lax.Precision.HIGHEST
    if iter_precision not in ("highest", "bf16x3", "default"):
        raise ValueError(f"iter_precision: {iter_precision}")

    def _dot(v, M, dims, prec):
        return jax.lax.dot_general(
            v, M, (dims, ((), ())), precision=prec,
            preferred_element_type=f32)

    # "bf16x3": Mosaic lowers f32 dots only at DEFAULT (one truncated bf16
    # pass) or HIGHEST (six passes) — lax.Precision.HIGH is unsupported. The
    # classical 3-product decomposition is hand-rolled instead: M = M_hi +
    # M_lo (two bf16 planes, 16 mantissa bits combined), v likewise, and
    # v@M ~ v_hi@M_hi + v_hi@M_lo + v_lo@M_hi — three single-pass bf16 MXU
    # products with f32 accumulation, ~2^-16 relative operator error (well
    # under the 1e-3 solve tolerance that the full-precision residual check
    # enforces) at HALF the MXU passes of HIGHEST.
    bf16 = jnp.bfloat16
    if iter_precision == "bf16x3":
        def split(M):
            hi = M.astype(bf16)
            return hi, (M - hi.astype(f32)).astype(bf16)

        A_hi, A_lo = split(A)
        P_hi, P_lo = split(P)
        K_hi, K_lo = split(Kinv)
        splits = {id(A): (A_hi, A_lo), id(P): (P_hi, P_lo),
                  id(Kinv): (K_hi, K_lo)}

    def mv_iter(v, M, dims):
        if iter_precision == "highest":
            return _dot(v, M, dims, jax.lax.Precision.HIGHEST)
        if iter_precision == "default":
            return _dot(v, M, dims, jax.lax.Precision.DEFAULT)
        M_hi, M_lo = splits[id(M)]
        v_hi = v.astype(bf16)
        v_lo = (v - v_hi.astype(f32)).astype(bf16)
        d = jax.lax.Precision.DEFAULT
        return (_dot(v_hi, M_hi, dims, d)
                + (_dot(v_hi, M_lo, dims, d) + _dot(v_lo, M_hi, dims, d)))

    _N_DIMS = ((1,), (0,))   # (1, mp) @ A -> (1, np)   (contract m)
    _M_DIMS = ((1,), (1,))   # (1, np) @ A^T -> (1, mp) (contract n)

    def mv_n(v):   # iteration-precision v @ A
        return mv_iter(v, A, _N_DIMS)

    def mv_m(v):   # iteration-precision v @ A^T
        return mv_iter(v, A, _M_DIMS)

    def mv_s(v, M):  # iteration-precision (1, np) @ (np, np)
        return mv_iter(v, M, _N_DIMS)

    def one_iter(x, z, y):
        rhs = sigma * x - q + mv_n(rho * z - y)
        xt = mv_s(rhs, Kinv)
        for _ in range(refine_steps):
            r = rhs - (mv_s(xt, P) + sigma * xt + mv_n(rho * mv_m(xt)))
            xt = xt + mv_s(r, Kinv)
        zt = mv_m(xt)
        x_new = alpha * xt + (1.0 - alpha) * x
        z_rel = alpha * zt + (1.0 - alpha) * z
        z_new = jnp.clip(z_rel + y * rho_inv, l, u)
        y_new = y + rho * (z_rel - z_new)
        return x_new, z_new, y_new

    def residuals(x, y):
        p = prec_check
        Ax = _dot(x, A, _M_DIMS, p)
        zc = jnp.clip(Ax, l, u)
        pri = jnp.max(jnp.abs((Ax - zc) * E_inv))
        Px = _dot(x, P, _N_DIMS, p)
        Aty = _dot(y, A, _N_DIMS, p)
        dua = jnp.max(jnp.abs((Px + q + Aty) * D)) * c_inv
        pri_sc = jnp.maximum(jnp.max(jnp.abs(Ax * E_inv)),
                             jnp.max(jnp.abs(zc * E_inv)))
        dua_sc = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Px * D)), jnp.max(jnp.abs(Aty * D))),
            jnp.max(jnp.abs(q * D)),
        ) * c_inv
        return pri, dua, pri_sc, dua_sc

    # ceil-division with a last-chunk clamp so exactly max_iter iterations
    # run, matching the XLA path's accounting (max_iter need not be a
    # multiple of check_every)
    n_chunks = max(-(-max_iter // check_every), 1)

    def cond(st):
        _, _, _, k, done, _, _, _ = st
        return jnp.logical_and(jnp.logical_not(done), k < n_chunks)

    def body(st):
        x, z, y, k, done, pri, dua, iters = st
        this_chunk = jnp.minimum(check_every, max_iter - k * check_every)
        x, z, y = jax.lax.fori_loop(
            0, this_chunk, lambda _, s: one_iter(*s), (x, z, y)
        )
        pri, dua, pri_sc, dua_sc = residuals(x, y)
        ok = jnp.logical_and(pri < eps_abs + eps_rel * pri_sc,
                             dua < eps_abs + eps_rel * dua_sc)
        newly = jnp.logical_and(ok, jnp.logical_not(done))
        done_iters = jnp.minimum((k + 1) * check_every, max_iter)
        iters = jnp.where(newly, done_iters, iters)
        return (x, z, y, k + 1, jnp.logical_or(done, ok), pri, dua, iters)

    # entry check: the one-stage-shifted warm start of a slowly-drifting
    # FTOCP often already meets tolerance in steady state — such scenarios
    # exit after ONE residual evaluation (iters = 0) instead of paying a
    # full check_every chunk.
    pri0, dua0, pri_sc0, dua_sc0 = residuals(x0, y0)
    ok0 = jnp.logical_and(pri0 < eps_abs + eps_rel * pri_sc0,
                          dua0 < eps_abs + eps_rel * dua_sc0)
    init = (x0, z0, y0, jnp.int32(0), ok0,
            pri0, dua0,
            jnp.where(ok0, jnp.int32(0), jnp.int32(max_iter)))
    x, z, y, _, done, pri, dua, iters = jax.lax.while_loop(cond, body, init)

    if rescue_max_iter <= 0:
        return x, y, pri, dua, iters, done, jnp.asarray(False)

    # ---- rho-escalation rescue (see docstring) -----------------------------
    hi = jax.lax.Precision.HIGHEST
    need = pri > rescue_trigger

    def _rescue(carry):
        x, z, y, pri, dua, iters = carry
        s = jnp.asarray(rescue_rho_scale, f32)
        rho2 = rho * s
        rho2_inv = rho_inv / s
        r_i = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
        c_i = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
        eye = (r_i == c_i).astype(f32)
        # branches pinned to f32: under jax_enable_x64 a where() over python
        # floats yields f64, which Mosaic cannot lower (SIGABRT at compile)
        diag_add = jnp.where(
            r_i == c_i,
            jnp.where(r_i < n_real, jnp.float32(sigma), jnp.float32(1.0)),
            jnp.float32(0.0))
        # K2 = P + sigma I + A' (s rho) A; pad-block diagonal is exactly 1
        K2 = _dot(A, Arho, ((0,), (0,)), hi) * s + P + diag_add

        # Newton-Schulz inverse: warm-test Kinv/s (exact when A'rhoA
        # dominates K), Jacobi fallback — the two-pass structure of
        # ops/qp._ns_inverse
        diag_k = jnp.sum(K2 * eye, axis=0, keepdims=True)
        dg = 1.0 / jnp.clip(diag_k, jnp.float32(1e-12), None)
        Rj = eye - K2 * dg
        cj = jnp.sqrt(jnp.sum(Rj * Rj))
        Xj = (eye * dg) / jnp.maximum(cj, 1.0)
        X0r = Kinv / s
        R0 = eye - _dot(K2, X0r, ((1,), (0,)), hi)
        r0f = jnp.sqrt(jnp.sum(R0 * R0))
        Xi = jnp.where(jnp.isfinite(r0f) & (r0f < 0.9), X0r, Xj)

        def ns_run(X):
            def nc(st):
                _, r, it = st
                return jnp.logical_and(r > ns_tol, it < ns_max_iters)

            def nb(st):
                X, _, it = st
                R = eye - _dot(K2, X, ((1,), (0,)), hi)
                return (X + _dot(X, R, ((1,), (0,)), hi),
                        jnp.max(jnp.abs(R)), it + 1)

            X, r, _ = jax.lax.while_loop(
                nc, nb, (X, jnp.asarray(jnp.inf, f32), jnp.int32(0)))
            return X, r

        X1, r1 = ns_run(Xi)
        bad = jnp.logical_not(jnp.isfinite(r1)) | (r1 > 50 * ns_tol)
        K2inv, _ = ns_run(jnp.where(bad, Xj, X1))

        def r_iter(x, z, y):
            rhs = sigma * x - q + _dot(rho2 * z - y, A, _N_DIMS, hi)
            xt = _dot(rhs, K2inv, _N_DIMS, hi)
            for _ in range(refine_steps):
                r = rhs - (_dot(xt, P, _N_DIMS, hi) + sigma * xt
                           + _dot(rho2 * _dot(xt, A, _M_DIMS, hi), A,
                                  _N_DIMS, hi))
                xt = xt + _dot(r, K2inv, _N_DIMS, hi)
            zt = _dot(xt, A, _M_DIMS, hi)
            x_new = alpha * xt + (1.0 - alpha) * x
            z_rel = alpha * zt + (1.0 - alpha) * z
            z_new = jnp.clip(z_rel + y * rho2_inv, l, u)
            y_new = y + rho2 * (z_rel - z_new)
            return x_new, z_new, y_new

        n_rchunks = max(-(-rescue_max_iter // check_every), 1)

        def rc(st):
            _, _, _, k, done, _, _, _ = st
            return jnp.logical_and(jnp.logical_not(done), k < n_rchunks)

        it_main = jnp.minimum(iters, max_iter)

        def rb(st):
            x, z, y, k, done, pri, dua, iters = st
            this_chunk = jnp.minimum(
                check_every, rescue_max_iter - k * check_every)
            x, z, y = jax.lax.fori_loop(
                0, this_chunk, lambda _, s_: r_iter(*s_), (x, z, y))
            pri, dua, pri_sc, dua_sc = residuals(x, y)
            ok = jnp.logical_and(pri < eps_abs + eps_rel * pri_sc,
                                 dua < eps_abs + eps_rel * dua_sc)
            ok = jnp.logical_or(ok, pri < rescue_exit)
            newly = jnp.logical_and(ok, jnp.logical_not(done))
            used = jnp.minimum((k + 1) * check_every, rescue_max_iter)
            iters = jnp.where(newly, it_main + used, iters)
            return (x, z, y, k + 1, jnp.logical_or(done, ok), pri, dua, iters)

        x, z, y, _, rdone, pri, dua, iters = jax.lax.while_loop(
            rc, rb, (x, z, y, jnp.int32(0), jnp.asarray(False), pri, dua,
                     it_main + jnp.int32(rescue_max_iter)))
        return x, z, y, pri, dua, iters

    x, z, y, pri, dua, iters = jax.lax.cond(
        need, _rescue, lambda c: c, (x, z, y, pri, dua, iters))
    # a rescued lane that hit the primal-only exit counts as solved: its
    # accuracy vs the f64 oracle is measured BETTER than base-rho accepted
    # solves (replay_rejects) even though the f32 dual residual stalls
    done = done | (need & (pri < rescue_exit))
    return x, y, pri, dua, iters, done, need


def _stats_row(vals):
    """Assemble a (1, _LANE) stats row (no scatter lowering on TPU)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
    out = jnp.zeros((1, _LANE), jnp.float32)
    for i, v in enumerate(vals):
        # literal pinned to f32: under jax_enable_x64 a python-float branch
        # materializes as f64[] and Mosaic cannot legalize the truncf
        out = out + jnp.where(col == i, v.astype(jnp.float32),
                              jnp.float32(0.0))
    return out


def _kernel(*refs, sigma: float, alpha: float, eps_abs: float, eps_rel: float,
            max_iter: int, check_every: int, refine_steps: int,
            iter_precision: str, np_: int, mp_: int,
            n_real: int = 0, rescue_max_iter: int = 0,
            rescue_rho_scale: float = 5.0, rescue_trigger: float = 7.5e-3,
            rescue_exit: float = 1e-3, ns_tol: float = 1e-3,
            ns_max_iters: int = 40):
    if rescue_max_iter > 0:
        (P_ref, Kinv_ref, A_ref, Arho_ref, vec_ref, x_ref, z_ref, y_ref,
         out_x_ref, out_y_ref, out_stats_ref) = refs
        Arho = Arho_ref[:]
    else:
        (P_ref, Kinv_ref, A_ref, vec_ref, x_ref, z_ref, y_ref,
         out_x_ref, out_y_ref, out_stats_ref) = refs
        Arho = None
    x, y, pri, dua, iters, done, rescued = _admm_core(
        P_ref[:], Kinv_ref[:], A_ref[:], vec_ref[:],
        x_ref[:], z_ref[:], y_ref[:],
        sigma=sigma, alpha=alpha, eps_abs=eps_abs, eps_rel=eps_rel,
        max_iter=max_iter, check_every=check_every,
        refine_steps=refine_steps, iter_precision=iter_precision,
        np_=np_, mp_=mp_,
        Arho=Arho, n_real=n_real, rescue_max_iter=rescue_max_iter,
        rescue_rho_scale=rescue_rho_scale, rescue_trigger=rescue_trigger,
        rescue_exit=rescue_exit, ns_tol=ns_tol, ns_max_iters=ns_max_iters,
    )
    out_x_ref[:] = x
    out_y_ref[:] = y
    out_stats_ref[:] = _stats_row(
        [pri, dua, iters.astype(jnp.float32), done.astype(jnp.float32),
         rescued.astype(jnp.float32)])


def _kernel_fused(P_ref, Arho_ref, Kinv0_ref, A_ref, vec_ref,
                  x_ref, z_ref, y_ref,
                  out_x_ref, out_y_ref, out_stats_ref, out_kinv_ref,
                  *, sigma: float, alpha: float, eps_abs: float,
                  eps_rel: float, max_iter: int, check_every: int,
                  refine_steps: int, iter_precision: str,
                  ns_tol: float, ns_max_iters: int,
                  n_real: int, np_: int, mp_: int,
                  rescue_max_iter: int = 0, rescue_rho_scale: float = 5.0,
                  rescue_trigger: float = 7.5e-3, rescue_exit: float = 1e-3):
    """Fused prologue + ADMM: K build, Newton-Schulz refresh, iteration loop.

    Mirrors ops/qp._build_K + ops/qp._ns_inverse (same two-pass structure,
    same Frobenius contraction test, same Jacobi fallback init) but runs
    per scenario in VMEM: a lane whose warm inverse is stale pays ITS OWN
    ~30-iteration cold build without dragging the batch (the XLA vmapped
    while_loop runs all lanes to the slowest). ``Arho`` = A * rho[:, None]
    (computed XLA-side: a (mp,1)-shaped broadcast does not lower well in
    Mosaic). ``vec[7, 1]`` carries the warm-validity flag.
    """
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    A = A_ref[:]
    P = P_ref[:]
    X0 = Kinv0_ref[:]
    vec = vec_ref[:]
    warm_ok = vec[7, 1] > 0.5

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())), precision=hi,
            preferred_element_type=f32)

    r_i = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    eye = (r_i == c_i).astype(f32)
    # K = P + sigma I + A' rho A; the padded tail of the diagonal is 1 (an
    # exactly-invertible identity block — with sigma there, the Jacobi
    # init's norm scaling would leave a persistent pad residual)
    diag_add = jnp.where(
        r_i == c_i,
        jnp.where(r_i < n_real, jnp.float32(sigma), jnp.float32(1.0)),
        jnp.float32(0.0))
    K = dot(A, Arho_ref[:], ((0,), (0,))) + P + diag_add

    # Jacobi init (ops/qp._ns_inverse lines: d, KXj, cj, Xj)
    diag_k = jnp.sum(K * eye, axis=0, keepdims=True)        # (1, np_)
    d = 1.0 / jnp.clip(diag_k, 1e-12, None)
    Rj = eye - K * d                                        # K @ diag(d)
    cj = jnp.sqrt(jnp.sum(Rj * Rj))
    Xj = (eye * d) / jnp.maximum(cj, 1.0)

    R0 = eye - dot(K, X0, ((1,), (0,)))
    r0_f = jnp.sqrt(jnp.sum(R0 * R0))
    use_warm = warm_ok & jnp.isfinite(r0_f) & (r0_f < 0.9)
    X_init = jnp.where(use_warm, X0, Xj)

    def ns_run(X):
        def cond(st):
            _, r, it = st
            return jnp.logical_and(r > ns_tol, it < ns_max_iters)

        def body(st):
            X, _, it = st
            R = eye - dot(K, X, ((1,), (0,)))
            return (X + dot(X, R, ((1,), (0,))),
                    jnp.max(jnp.abs(R)), it + 1)

        X, r, _ = jax.lax.while_loop(
            cond, body, (X, jnp.asarray(jnp.inf, f32), jnp.int32(0)))
        return X, r

    X, r1 = ns_run(X_init)
    bad = jnp.logical_not(jnp.isfinite(r1)) | (r1 > 50 * ns_tol)
    Kinv, ns_resid = ns_run(jnp.where(bad, Xj, X))

    x, y, pri, dua, iters, done, rescued = _admm_core(
        P, Kinv, A, vec, x_ref[:], z_ref[:], y_ref[:],
        sigma=sigma, alpha=alpha, eps_abs=eps_abs, eps_rel=eps_rel,
        max_iter=max_iter, check_every=check_every,
        refine_steps=refine_steps, iter_precision=iter_precision,
        np_=np_, mp_=mp_,
        Arho=Arho_ref[:], n_real=n_real, rescue_max_iter=rescue_max_iter,
        rescue_rho_scale=rescue_rho_scale, rescue_trigger=rescue_trigger,
        rescue_exit=rescue_exit, ns_tol=ns_tol, ns_max_iters=ns_max_iters,
    )
    out_x_ref[:] = x
    out_y_ref[:] = y
    out_kinv_ref[:] = Kinv
    out_stats_ref[:] = _stats_row(
        [pri, dua, iters.astype(jnp.float32), done.astype(jnp.float32),
         ns_resid, rescued.astype(jnp.float32)])


@functools.partial(
    jax.jit,
    static_argnames=("sigma", "alpha", "eps_abs", "eps_rel", "max_iter",
                     "check_every", "refine_steps", "iter_precision",
                     "interpret", "rescue_max_iter", "rescue_rho_scale",
                     "rescue_trigger", "rescue_exit", "ns_tol",
                     "ns_max_iters"),
)
def admm_iterate(
    P: jnp.ndarray,      # (n, n) scaled quadratic cost
    Kinv: jnp.ndarray,   # (n, n) inverse of P + sigma I + A' rho A
    A: jnp.ndarray,      # (m, n) scaled constraints
    q: jnp.ndarray,      # (n,)
    l: jnp.ndarray,      # (m,) (-inf ok)
    u: jnp.ndarray,      # (m,)
    rho: jnp.ndarray,    # (m,)
    D: jnp.ndarray,      # (n,) unscaling
    E: jnp.ndarray,      # (m,)
    c: jnp.ndarray,      # () cost scaling
    x0: jnp.ndarray, z0: jnp.ndarray, y0: jnp.ndarray,
    *, sigma: float, alpha: float, eps_abs: float, eps_rel: float,
    max_iter: int, check_every: int, refine_steps: int,
    iter_precision: str = "highest",
    interpret: bool = False,
    rescue_max_iter: int = 0, rescue_rho_scale: float = 5.0,
    rescue_trigger: float = 7.5e-3, rescue_exit: float = 1e-3,
    ns_tol: float = 1e-3, ns_max_iters: int = 40,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           jnp.ndarray, jnp.ndarray]:
    """Run the ADMM loop for one (scaled) QP; vmap for a batch.

    Returns (x (n,), y (m,), pri, dua, iters, solved, rescued) in *scaled*
    coordinates. ``rescue_max_iter > 0`` enables the in-kernel
    rho-escalation rescue stage (see _admm_core).
    """
    n, m = P.shape[0], A.shape[0]
    np_, mp_ = _pad_to(n), _pad_to(m)
    f32 = jnp.float32

    Pp = jnp.zeros((np_, np_), f32).at[:n, :n].set(P.astype(f32))
    Kp = jnp.zeros((np_, np_), f32).at[:n, :n].set(Kinv.astype(f32))
    Ap = jnp.zeros((mp_, np_), f32).at[:m, :n].set(A.astype(f32))

    def padv(v, size, fill=0.0):
        out = jnp.full((size,), fill, f32)
        return out.at[: v.shape[0]].set(v.astype(f32))

    l_f = jnp.clip(l, -_BIG, _BIG)
    u_f = jnp.clip(u, -_BIG, _BIG)
    vec = jnp.zeros((8, mp_), f32)
    vec = vec.at[0, :np_].set(padv(q, np_))
    vec = vec.at[1].set(padv(l_f, mp_))
    vec = vec.at[2].set(padv(u_f, mp_))
    vec = vec.at[3].set(padv(rho, mp_, fill=1.0))
    vec = vec.at[4].set(padv(1.0 / rho, mp_, fill=1.0))
    vec = vec.at[5, :np_].set(padv(D, np_))
    vec = vec.at[6].set(padv(1.0 / E, mp_))
    vec = vec.at[7, 0].set((1.0 / c).astype(f32))

    xp = padv(x0, np_)[None, :]
    zp = padv(z0, mp_)[None, :]
    yp = padv(y0, mp_)[None, :]

    kern = functools.partial(
        _kernel, sigma=float(sigma), alpha=float(alpha),
        eps_abs=float(eps_abs), eps_rel=float(eps_rel),
        max_iter=int(max_iter), check_every=int(check_every),
        refine_steps=int(refine_steps), iter_precision=str(iter_precision),
        np_=np_, mp_=mp_, n_real=n,
        rescue_max_iter=int(rescue_max_iter),
        rescue_rho_scale=float(rescue_rho_scale),
        rescue_trigger=float(rescue_trigger),
        rescue_exit=float(rescue_exit),
        ns_tol=float(ns_tol), ns_max_iters=int(ns_max_iters),
    )
    out_shape = [
        jax.ShapeDtypeStruct((1, np_), f32),
        jax.ShapeDtypeStruct((1, mp_), f32),
        jax.ShapeDtypeStruct((1, _LANE), f32),
    ]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    if rescue_max_iter > 0:
        rho_p = vec[3]
        Arhop = Ap * rho_p[:, None]
        inputs = (Pp, Kp, Ap, Arhop, vec, xp, zp, yp)
    else:
        inputs = (Pp, Kp, Ap, vec, xp, zp, yp)
    ox, oy, stats = pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[vmem] * len(inputs),
        out_specs=[vmem] * 3,
        interpret=interpret,
    )(*inputs)

    x = ox[0, :n]
    y = oy[0, :m]
    pri, dua = stats[0, 0], stats[0, 1]
    iters = stats[0, 2].astype(jnp.int32)
    solved = stats[0, 3] > 0.5
    rescued = stats[0, 4] > 0.5
    return x, y, pri, dua, iters, solved, rescued


@functools.partial(
    jax.jit,
    static_argnames=("sigma", "alpha", "eps_abs", "eps_rel", "max_iter",
                     "check_every", "refine_steps", "iter_precision",
                     "ns_tol", "ns_max_iters", "interpret",
                     "rescue_max_iter", "rescue_rho_scale",
                     "rescue_trigger", "rescue_exit"),
)
def admm_iterate_fused(
    P: jnp.ndarray,       # (n, n) scaled quadratic cost
    A: jnp.ndarray,       # (m, n) scaled constraints
    Kinv0: jnp.ndarray,   # (n, n) previous step's KKT inverse (warm start)
    warm_ok: jnp.ndarray, # () bool — Kinv0 usable
    q: jnp.ndarray,       # (n,)
    l: jnp.ndarray,       # (m,) (-inf ok)
    u: jnp.ndarray,       # (m,)
    rho: jnp.ndarray,     # (m,)
    D: jnp.ndarray,       # (n,) unscaling
    E: jnp.ndarray,       # (m,)
    c: jnp.ndarray,       # () cost scaling
    x0: jnp.ndarray, z0: jnp.ndarray, y0: jnp.ndarray,
    *, sigma: float, alpha: float, eps_abs: float, eps_rel: float,
    max_iter: int, check_every: int, refine_steps: int,
    ns_tol: float, ns_max_iters: int,
    iter_precision: str = "highest",
    interpret: bool = False,
    rescue_max_iter: int = 0, rescue_rho_scale: float = 5.0,
    rescue_trigger: float = 7.5e-3, rescue_exit: float = 1e-3,
):
    """Fused K-build + Newton-Schulz + ADMM for one (scaled) QP; vmap for a
    batch. Returns (x, y, pri, dua, iters, solved, kinv, ns_resid) — kinv is
    the refreshed (n, n) KKT inverse for the FactorCache."""
    n, m = P.shape[0], A.shape[0]
    np_, mp_ = _pad_to(n), _pad_to(m)
    f32 = jnp.float32

    Pp = jnp.zeros((np_, np_), f32).at[:n, :n].set(P.astype(f32))
    Ap = jnp.zeros((mp_, np_), f32).at[:m, :n].set(A.astype(f32))
    # pad tail of the warm inverse's diagonal is 1, matching the padded K's
    # identity tail — otherwise R0's pad residual alone rejects every warm
    # start (sqrt(pad) > 0.9)
    pad_eye = jnp.concatenate(
        [jnp.zeros(n, f32), jnp.ones(np_ - n, f32)])
    Kp0 = (jnp.zeros((np_, np_), f32).at[:n, :n].set(Kinv0.astype(f32))
           + jnp.diag(pad_eye))

    def padv(v, size, fill=0.0):
        out = jnp.full((size,), fill, f32)
        return out.at[: v.shape[0]].set(v.astype(f32))

    rho_p = padv(rho, mp_, fill=1.0)
    Arho = Ap * rho_p[:, None]

    l_f = jnp.clip(l, -_BIG, _BIG)
    u_f = jnp.clip(u, -_BIG, _BIG)
    vec = jnp.zeros((8, mp_), f32)
    vec = vec.at[0, :np_].set(padv(q, np_))
    vec = vec.at[1].set(padv(l_f, mp_))
    vec = vec.at[2].set(padv(u_f, mp_))
    vec = vec.at[3].set(rho_p)
    vec = vec.at[4].set(padv(1.0 / rho, mp_, fill=1.0))
    vec = vec.at[5, :np_].set(padv(D, np_))
    vec = vec.at[6].set(padv(1.0 / E, mp_))
    vec = vec.at[7, 0].set((1.0 / c).astype(f32))
    vec = vec.at[7, 1].set(warm_ok.astype(f32))

    xp = padv(x0, np_)[None, :]
    zp = padv(z0, mp_)[None, :]
    yp = padv(y0, mp_)[None, :]

    kern = functools.partial(
        _kernel_fused, sigma=float(sigma), alpha=float(alpha),
        eps_abs=float(eps_abs), eps_rel=float(eps_rel),
        max_iter=int(max_iter), check_every=int(check_every),
        refine_steps=int(refine_steps), iter_precision=str(iter_precision),
        ns_tol=float(ns_tol), ns_max_iters=int(ns_max_iters),
        n_real=n, np_=np_, mp_=mp_,
        rescue_max_iter=int(rescue_max_iter),
        rescue_rho_scale=float(rescue_rho_scale),
        rescue_trigger=float(rescue_trigger),
        rescue_exit=float(rescue_exit),
    )
    out_shape = [
        jax.ShapeDtypeStruct((1, np_), f32),
        jax.ShapeDtypeStruct((1, mp_), f32),
        jax.ShapeDtypeStruct((1, _LANE), f32),
        jax.ShapeDtypeStruct((np_, np_), f32),
    ]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    ox, oy, stats, okinv = pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[vmem] * 8,
        out_specs=[vmem] * 4,
        interpret=interpret,
    )(Pp, Arho, Kp0, Ap, vec, xp, zp, yp)

    x = ox[0, :n]
    y = oy[0, :m]
    pri, dua = stats[0, 0], stats[0, 1]
    iters = stats[0, 2].astype(jnp.int32)
    solved = stats[0, 3] > 0.5
    ns_resid = stats[0, 4]
    return x, y, pri, dua, iters, solved, okinv[:n, :n], ns_resid
