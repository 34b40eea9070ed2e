// Batched Pacejka single-track plant, dual-frame Euler integration.
// Reference semantics: SysModel.py:56-147 (same math as models/dynamics.py,
// including the off-track curvature-denominator guard).
#include "racinglmpc_native.h"

#include <cmath>

extern "C" void rlmpc_rollout(
    int B, int substeps, double dt_sub, double* x, double* x_glob,
    const double* u, const double* vp, const double* segs, int nseg,
    double track_len) {
  const double m = vp[0], lf = vp[1], lr = vp[2], Iz = vp[3];
  const double Df = vp[4], Cf = vp[5], Bf = vp[6];
  const double Dr = vp[7], Cr = vp[8], Br = vp[9];

  for (int b = 0; b < B; ++b) {
    double* xs = x + 6 * b;
    double* xg = x_glob + 6 * b;
    const double delta = u[2 * b + 0], a = u[2 * b + 1];
    for (int t = 0; t < substeps; ++t) {
      const double vx = xs[0], vy = xs[1], wz = xs[2];
      const double epsi = xs[3], s = xs[4], ey = xs[5];
      const double psi = xg[3], X = xg[4], Y = xg[5];

      const double alpha_f = delta - std::atan2(vy + lf * wz, vx);
      const double alpha_r = -std::atan2(vy - lr * wz, vx);
      const double fyf = Df * std::sin(Cf * std::atan(Bf * alpha_f));
      const double fyr = Dr * std::sin(Cr * std::atan(Br * alpha_r));

      const double dvx = a - fyf * std::sin(delta) / m + wz * vy;
      const double dvy = (fyf * std::cos(delta) + fyr) / m - wz * vx;
      const double dwz = (lf * fyf * std::cos(delta) - lr * fyr) / Iz;

      double sw = s;
      if (sw > track_len) sw -= track_len * std::floor(sw / track_len);
      double cur = 0.0;
      for (int k = 0; k < nseg; ++k) {
        if (sw >= segs[3 * k] && sw < segs[3 * k + 1]) {
          cur = segs[3 * k + 2];
          break;
        }
      }
      double den = 1.0 - cur * ey;
      if (den >= 0.0 && den < 0.05) den = 0.05;
      if (den < 0.0 && den > -0.05) den = -0.05;
      const double ce = std::cos(epsi), se = std::sin(epsi);
      const double s_dot = (vx * ce - vy * se) / den;
      const double depsi = wz - s_dot * cur;
      const double dey = vx * se + vy * ce;

      xs[0] = vx + dt_sub * dvx;
      xs[1] = vy + dt_sub * dvy;
      xs[2] = wz + dt_sub * dwz;
      xs[3] = epsi + dt_sub * depsi;
      xs[4] = s + dt_sub * s_dot;
      xs[5] = ey + dt_sub * dey;

      xg[0] = xs[0];
      xg[1] = xs[1];
      xg[2] = xs[2];
      xg[3] = psi + dt_sub * wz;
      xg[4] = X + dt_sub * (vx * std::cos(psi) - vy * std::sin(psi));
      xg[5] = Y + dt_sub * (vx * std::sin(psi) + vy * std::cos(psi));
    }
  }
}
