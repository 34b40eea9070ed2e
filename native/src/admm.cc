// Dense OSQP-form ADMM QP solver (float64, host CPU).
// Same algorithm family as racinglmpc_tpu/ops/qp.py — see header.
#include "racinglmpc_native.h"

#include <cmath>
#include <cstring>
#include <vector>

namespace {

constexpr double kInf = 1e29;

// Cholesky factorization (in place, lower). Returns false if not SPD.
bool cholesky(std::vector<double>& K, int n) {
  for (int j = 0; j < n; ++j) {
    double d = K[j * n + j];
    for (int k = 0; k < j; ++k) d -= K[j * n + k] * K[j * n + k];
    if (d <= 0.0) return false;
    const double lj = std::sqrt(d);
    K[j * n + j] = lj;
    for (int i = j + 1; i < n; ++i) {
      double s = K[i * n + j];
      for (int k = 0; k < j; ++k) s -= K[i * n + k] * K[j * n + k];
      K[i * n + j] = s / lj;
    }
  }
  return true;
}

void chol_solve(const std::vector<double>& L, int n, double* b) {
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[i * n + k] * b[k];
    b[i] = s / L[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * b[k];
    b[i] = s / L[i * n + i];
  }
}

inline double clampd(double v, double lo, double hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

}  // namespace

extern "C" int rlmpc_solve_qp_admm(
    int n, int m, const double* P_in, const double* q_in, const double* A_in,
    const double* l_in, const double* u_in, int max_iter, double rho0,
    double rho_eq_scale, double sigma, double alpha, double eps_abs,
    double eps_rel, int scaling_iters, int refine_steps, double* x_out,
    double* y_out, double* info) {
  std::vector<double> P(P_in, P_in + (size_t)n * n);
  std::vector<double> q(q_in, q_in + n);
  std::vector<double> A(A_in, A_in + (size_t)m * n);
  std::vector<double> l(l_in, l_in + m), u(u_in, u_in + m);
  std::vector<double> D(n, 1.0), E(m, 1.0);
  double c = 1.0;

  // ---- modified Ruiz equilibration (as ops/qp.py::_ruiz_equilibrate) ----
  for (int it = 0; it < scaling_iters; ++it) {
    std::vector<double> d(n), e(m);
    for (int j = 0; j < n; ++j) {
      double cn = 0.0;
      for (int i = 0; i < n; ++i) cn = std::max(cn, std::fabs(P[i * n + j]));
      for (int i = 0; i < m; ++i) cn = std::max(cn, std::fabs(A[i * n + j]));
      d[j] = 1.0 / std::sqrt(cn > 1e-12 ? cn : 1.0);
    }
    for (int i = 0; i < m; ++i) {
      double rn = 0.0;
      for (int j = 0; j < n; ++j) rn = std::max(rn, std::fabs(A[i * n + j]));
      e[i] = 1.0 / std::sqrt(rn > 1e-12 ? rn : 1.0);
    }
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j) P[i * n + j] *= d[i] * d[j];
    for (int j = 0; j < n; ++j) q[j] *= d[j];
    for (int i = 0; i < m; ++i)
      for (int j = 0; j < n; ++j) A[i * n + j] *= e[i] * d[j];
    for (int i = 0; i < m; ++i) {
      if (l[i] > -kInf) l[i] *= e[i];
      if (u[i] < kInf) u[i] *= e[i];
    }
    double cn_mean = 0.0, qmax = 0.0;
    for (int j = 0; j < n; ++j) {
      double cm = 0.0;
      for (int i = 0; i < n; ++i) cm = std::max(cm, std::fabs(P[i * n + j]));
      cn_mean += cm;
      qmax = std::max(qmax, std::fabs(q[j]));
    }
    cn_mean /= n;
    double gamma = 1.0 / std::max(std::max(cn_mean, qmax), 1e-12);
    for (auto& v : P) v *= gamma;
    for (auto& v : q) v *= gamma;
    for (int j = 0; j < n; ++j) D[j] *= d[j];
    for (int i = 0; i < m; ++i) E[i] *= e[i];
    c *= gamma;
  }

  std::vector<double> rho(m);
  for (int i = 0; i < m; ++i) {
    const bool is_eq = (l[i] > -kInf) && (u[i] < kInf) && (u[i] - l[i] < 1e-12);
    rho[i] = is_eq ? rho0 * rho_eq_scale : rho0;
  }

  // ---- K = P + sigma I + A' rho A, Cholesky ----
  std::vector<double> K((size_t)n * n);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) {
      double s = P[i * n + j] + (i == j ? sigma : 0.0);
      for (int k = 0; k < m; ++k) s += A[k * n + i] * rho[k] * A[k * n + j];
      K[i * n + j] = s;
    }
  std::vector<double> L = K;
  if (!cholesky(L, n)) return -1;

  std::vector<double> x(n, 0.0), z(m, 0.0), y(m, 0.0);
  std::vector<double> rhs(n), xt(n), Ax(m), zt(m), tmp_n(n), tmp_m(m);

  auto matvec_A = [&](const double* v, double* out) {
    for (int i = 0; i < m; ++i) {
      double s = 0.0;
      for (int j = 0; j < n; ++j) s += A[i * n + j] * v[j];
      out[i] = s;
    }
  };
  auto matvec_At = [&](const double* v, double* out) {
    for (int j = 0; j < n; ++j) out[j] = 0.0;
    for (int i = 0; i < m; ++i) {
      const double vi = v[i];
      if (vi == 0.0) continue;
      for (int j = 0; j < n; ++j) out[j] += A[i * n + j] * vi;
    }
  };
  auto apply_K = [&](const double* v, double* out) {
    matvec_A(v, tmp_m.data());
    for (int i = 0; i < m; ++i) tmp_m[i] *= rho[i];
    matvec_At(tmp_m.data(), out);
    for (int i = 0; i < n; ++i) {
      double s = sigma * v[i];
      for (int j = 0; j < n; ++j) s += P[i * n + j] * v[j];
      out[i] += s;
    }
  };

  int iters = max_iter;
  double pri = 1e30, dua = 1e30;
  bool solved = false;
  for (int it = 0; it < max_iter; ++it) {
    // rhs = sigma x - q + A'(rho z - y)
    for (int i = 0; i < m; ++i) tmp_m[i] = rho[i] * z[i] - y[i];
    matvec_At(tmp_m.data(), rhs.data());
    for (int j = 0; j < n; ++j) rhs[j] += sigma * x[j] - q[j];
    xt = rhs;
    chol_solve(L, n, xt.data());
    for (int r = 0; r < refine_steps; ++r) {
      apply_K(xt.data(), tmp_n.data());
      for (int j = 0; j < n; ++j) tmp_n[j] = rhs[j] - tmp_n[j];
      chol_solve(L, n, tmp_n.data());
      for (int j = 0; j < n; ++j) xt[j] += tmp_n[j];
    }
    matvec_A(xt.data(), zt.data());
    for (int j = 0; j < n; ++j) x[j] = alpha * xt[j] + (1 - alpha) * x[j];
    for (int i = 0; i < m; ++i) {
      const double zr = alpha * zt[i] + (1 - alpha) * z[i];
      const double zn = clampd(zr + y[i] / rho[i], l[i], u[i]);
      y[i] += rho[i] * (zr - zn);
      z[i] = zn;
    }

    if ((it + 1) % 25 == 0 || it + 1 == max_iter) {
      // unscaled residuals (as ops/qp.py::_residuals)
      matvec_A(x.data(), Ax.data());
      double pri_r = 0.0, pri_sc = 0.0;
      for (int i = 0; i < m; ++i) {
        const double zc = clampd(Ax[i], l[i], u[i]);
        pri_r = std::max(pri_r, std::fabs((Ax[i] - zc) / E[i]));
        pri_sc = std::max(pri_sc, std::max(std::fabs(Ax[i] / E[i]),
                                           std::fabs(zc / E[i])));
      }
      matvec_At(y.data(), tmp_n.data());
      double dua_r = 0.0, dua_sc = 0.0;
      for (int j = 0; j < n; ++j) {
        double Px = 0.0;
        for (int k = 0; k < n; ++k) Px += P[j * n + k] * x[k];
        dua_r = std::max(dua_r,
                         std::fabs((Px + q[j] + tmp_n[j]) * D[j] / c));
        dua_sc = std::max(dua_sc, std::fabs(Px * D[j]));
        dua_sc = std::max(dua_sc, std::fabs(tmp_n[j] * D[j]));
        dua_sc = std::max(dua_sc, std::fabs(q[j] * D[j]));
      }
      dua_sc /= c;
      pri = pri_r;
      dua = dua_r;
      if (pri_r < eps_abs + eps_rel * pri_sc &&
          dua_r < eps_abs + eps_rel * dua_sc) {
        iters = it + 1;
        solved = true;
        break;
      }
    }
  }

  for (int j = 0; j < n; ++j) x_out[j] = D[j] * x[j];
  for (int i = 0; i < m; ++i) y_out[i] = E[i] * y[i] / c;
  info[0] = pri;
  info[1] = dua;
  info[2] = iters;
  return solved ? 0 : 1;
}
