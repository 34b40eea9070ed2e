// Native (host CPU) runtime components for racinglmpc_tpu.
//
// The reference delegates its native compute to OSQP / CVXOPT / BLAS
// (SURVEY §2.9-2.11). This library provides the framework's own native
// equivalents, used as (a) fast float64 oracles for verifying the TPU
// (JAX/Pallas) paths, and (b) a CPU deployment/runtime fallback:
//
//   - rlmpc_solve_qp_admm: dense OSQP-form ADMM QP solver (Ruiz
//     equilibration, rho-regularized iterations with over-relaxation,
//     Cholesky KKT factorization, iterative refinement) — the same
//     algorithm family as racinglmpc_tpu/ops/qp.py.
//   - rlmpc_rollout: batched Pacejka single-track plant, dual-frame Euler
//     integration (reference SysModel.py:56-147 semantics; same math as
//     racinglmpc_tpu/models/dynamics.py).
//
// Plain C ABI for ctypes binding (racinglmpc_tpu/runtime/native.py).
#pragma once
#include <cstdint>

extern "C" {

// Solve: min 1/2 x'Px + q'x  s.t.  l <= Ax <= u   (dense, row-major).
// Returns 0 on success (converged), 1 if iteration limit hit, <0 on error.
// Outputs: x (n), y (m), info[0]=pri_res, info[1]=dua_res, info[2]=iters.
int rlmpc_solve_qp_admm(
    int n, int m,
    const double* P,   // n*n
    const double* q,   // n
    const double* A,   // m*n
    const double* l,   // m  (use -1e30 for -inf)
    const double* u,   // m
    int max_iter,
    double rho0,
    double rho_eq_scale,
    double sigma,
    double alpha,
    double eps_abs,
    double eps_rel,
    int scaling_iters,
    int refine_steps,
    double* x_out,     // n
    double* y_out,     // m
    double* info);     // 3

// Batched plant rollout: B scenarios, `substeps` Euler steps of dt_sub.
// x, x_glob: B*6 row-major (curvilinear / global states, updated in place).
// u: B*2. Track segments: nseg rows of [s0, s_end, curvature]; track_len L.
// vp: [m, lf, lr, Iz, Df, Cf, Bf, Dr, Cr, Br].
void rlmpc_rollout(
    int B, int substeps, double dt_sub,
    double* x, double* x_glob, const double* u,
    const double* vp,
    const double* segs, int nseg, double track_len);

}  // extern "C"
