"""FTOCP (finite-time optimal control problem) assembly as structured blocks.

TPU-native re-design of the reference's per-step dense ``block_diag``
rebuilds (`/root/reference/src/fnc/controller/PredictiveControllers.py:166-257`
and the LMPC terminal extensions `:340-362`). The decision-vector layout is
the reference's canonical flattening (SURVEY §2.a), kept for parity checks:

    z = [ x_0..x_N | u_0..u_{N-1} | laneSlack (2N) | (λ_1..λ_K | termSlack) ]

Everything that does not depend on per-step data — the inequality system
(F, b), the quadratic cost H, the constant part of the linear cost q, the
initial-condition selector E, and the identity skeleton of the equality
system G — is precomputed **once** on the host into :class:`FTOCPTemplates`.
Per control step only the data-dependent pieces are scattered in:

    G  ← −A_i / −B_i dynamics blocks (and −SS for the LMPC terminal rows)
    L  ← affine offsets C_i
    q  ← input-rate coupling with the previously applied input, and the
         safe-set cost-to-go entries (LMPC)

so the per-step assembly is a handful of static-shape scatters that XLA fuses
into the solve — no host work, vmap-able over the scenario batch.

Semantics reproduced (reference file:line):
- ineq system incl. soft lane slack            PredictiveControllers.py:166-198
  (state constraints on stages 0..N-1; the terminal state is left to the
  terminal-set machinery, `:171-173`)
- eq system G z = E x0 + L                     PredictiveControllers.py:200-226
- cost H/q incl. input-rate tridiagonal        PredictiveControllers.py:228-257
  (H carries the factor 2: solver form is min ½ zᵀHz + qᵀz)
- LMPC λ ≥ 0 rows                              PredictiveControllers.py:340-343
- LMPC terminal x_N = SS λ − termSlack, Σλ = 1 PredictiveControllers.py:345-357
- LMPC terminal cost (Qfun·λ, termSlackᵀQtSᵀtermSlack)  :359-362
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from racinglmpc_tpu.ops.qp import QPData
from racinglmpc_tpu.utils.config import NU, NX


class StageDynamics(NamedTuple):
    """Per-stage affine models x_{k+1} = A_k x_k + B_k u_k + C_k (a pytree)."""

    A: jnp.ndarray  # (N, 6, 6)
    B: jnp.ndarray  # (N, 6, 2)
    C: jnp.ndarray  # (N, 6)


class FTOCPTemplates(NamedTuple):
    """Constant parts of the QP; all leaves are arrays (a pytree).

    Shapes (n=6, d=2, nc=2 lane rows, K=0 for plain MPC):
      nz = (N+1)n + Nd + nc·N + K + (n if K else 0)
      me = (N+1)n + (n+1 if K else 0)
      mi = nc·N + 4N + nc·N + K
    """

    H: jnp.ndarray        # (nz, nz) quadratic cost (×2 convention baked in)
    q_const: jnp.ndarray  # (nz,) constant linear cost
    F: jnp.ndarray        # (mi, nz)
    b: jnp.ndarray        # (mi,)
    G0: jnp.ndarray       # (me, nz) equality skeleton (identity blocks only)
    E: jnp.ndarray        # (me, 6)
    L0: jnp.ndarray       # (me,) constant part of L (the Σλ=1 row)


@dataclasses.dataclass(frozen=True)
class FTOCPDims:
    """Static layout of the decision vector / constraint rows."""

    N: int
    K: int = 0           # number of safe-set multipliers (0 = plain MPC)
    n: int = NX
    d: int = NU
    nc: int = 2          # lane constraint rows per stage

    @property
    def nx_tot(self) -> int:
        return self.n * (self.N + 1)

    @property
    def nu_tot(self) -> int:
        return self.d * self.N

    @property
    def ns_tot(self) -> int:
        return self.nc * self.N

    @property
    def off_u(self) -> int:
        return self.nx_tot

    @property
    def off_slack(self) -> int:
        return self.nx_tot + self.nu_tot

    @property
    def off_lambda(self) -> int:
        return self.off_slack + self.ns_tot

    @property
    def off_tslack(self) -> int:
        return self.off_lambda + self.K

    @property
    def nz(self) -> int:
        base = self.nx_tot + self.nu_tot + self.ns_tot
        return base + (self.K + self.n if self.K else 0)

    @property
    def me(self) -> int:
        return self.nx_tot + ((self.n + 1) if self.K else 0)

    @property
    def mi(self) -> int:
        return self.ns_tot + 4 * self.N + self.ns_tot + self.K


def make_templates(
    *,
    N: int,
    Q,
    R,
    dR,
    Qf,
    q_slack,
    x_ref,
    ey_max: float,
    delta_max: float,
    a_max: float,
    K: int = 0,
    q_terminal_slack: float = 0.0,
    dtype=jnp.float64,
) -> tuple[FTOCPDims, FTOCPTemplates]:
    """Host-side (NumPy) construction of all constant QP blocks."""
    dims = FTOCPDims(N=N, K=K)
    n, d, nc = dims.n, dims.d, dims.nc
    nz, me, mi = dims.nz, dims.me, dims.mi

    Q = np.asarray(Q, dtype=np.float64)
    R = np.asarray(R, dtype=np.float64)
    dR = np.asarray(dR, dtype=np.float64)
    Qf = np.asarray(Qf, dtype=np.float64)
    x_ref = np.asarray(x_ref, dtype=np.float64)

    # ---- quadratic cost (reference buildCost :228-257, ×2 baked in) ----
    H = np.zeros((nz, nz))
    for k in range(N):
        H[k * n:(k + 1) * n, k * n:(k + 1) * n] = np.diag(Q)
    H[N * n:(N + 1) * n, N * n:(N + 1) * n] = np.diag(Qf)
    ou = dims.off_u
    for k in range(N):
        blk = np.diag(R + 2.0 * dR)
        H[ou + k * d:ou + (k + 1) * d, ou + k * d:ou + (k + 1) * d] = blk
    # last input appears once in the rate differences
    H[ou + (N - 1) * d:ou + N * d, ou + (N - 1) * d:ou + N * d] -= np.diag(dR)
    for k in range(N - 1):
        off = np.diag(-dR)
        H[ou + k * d:ou + (k + 1) * d, ou + (k + 1) * d:ou + (k + 2) * d] = off
        H[ou + (k + 1) * d:ou + (k + 2) * d, ou + k * d:ou + (k + 1) * d] = off
    os_ = dims.off_slack
    H[os_:os_ + dims.ns_tot, os_:os_ + dims.ns_tot] = q_slack[0] * np.eye(dims.ns_tot)
    if K:
        ot = dims.off_tslack
        H[ot:ot + n, ot:ot + n] = q_terminal_slack * np.eye(n)
    H = 2.0 * H

    # ---- constant linear cost ----
    q_const = np.zeros(nz)
    for k in range(N):
        q_const[k * n:(k + 1) * n] = -2.0 * Q * x_ref
    q_const[N * n:(N + 1) * n] = -2.0 * Qf * x_ref
    q_const[os_:os_ + dims.ns_tot] = q_slack[1]

    # ---- inequality system (reference buildIneqConstr :166-198) ----
    # rows: [lane 0..N-1 (soft, −slack) | input boxes | slack ≥ 0 | λ ≥ 0]
    F = np.zeros((mi, nz))
    b = np.zeros(mi)
    r = 0
    for k in range(N):           # lane rows on stages 0..N-1 (:171-173)
        F[r, k * n + 5] = 1.0
        F[r, os_ + k * nc] = -1.0
        b[r] = ey_max
        r += 1
        F[r, k * n + 5] = -1.0
        F[r, os_ + k * nc + 1] = -1.0
        b[r] = ey_max
        r += 1
    for k in range(N):           # input boxes (Fu = kron(eye(2), [1,-1]).T)
        F[r, ou + k * d + 0] = 1.0
        b[r] = delta_max
        r += 1
        F[r, ou + k * d + 0] = -1.0
        b[r] = delta_max
        r += 1
        F[r, ou + k * d + 1] = 1.0
        b[r] = a_max
        r += 1
        F[r, ou + k * d + 1] = -1.0
        b[r] = a_max
        r += 1
    F[r:r + dims.ns_tot, os_:os_ + dims.ns_tot] = -np.eye(dims.ns_tot)
    r += dims.ns_tot
    if K:                        # λ ≥ 0 (addSafeSetIneqConstr :340-343)
        F[r:r + K, dims.off_lambda:dims.off_lambda + K] = -np.eye(K)
        r += K
    assert r == mi

    # ---- equality skeleton (reference buildEqConstr :200-226) ----
    G0 = np.zeros((me, nz))
    G0[:dims.nx_tot, :dims.nx_tot] = np.eye(dims.nx_tot)
    E = np.zeros((me, n))
    E[:n, :n] = np.eye(n)
    L0 = np.zeros(me)
    if K:                        # terminal rows + Σλ=1 (:345-357)
        tr = dims.nx_tot
        G0[tr:tr + n, N * n:(N + 1) * n] = np.eye(n)       # x_N ...
        G0[tr:tr + n, dims.off_tslack:dims.off_tslack + n] = np.eye(n)
        # (−SS block over λ columns is scattered per step)
        G0[tr + n, dims.off_lambda:dims.off_lambda + K] = 1.0
        L0[tr + n] = 1.0

    as_j = lambda a: jnp.asarray(a, dtype=dtype)  # noqa: E731
    return dims, FTOCPTemplates(
        H=as_j(H), q_const=as_j(q_const), F=as_j(F), b=as_j(b),
        G0=as_j(G0), E=as_j(E), L0=as_j(L0),
    )


def assemble_qp(
    dims: FTOCPDims,
    tmpl: FTOCPTemplates,
    dyn: StageDynamics,
    x0: jnp.ndarray,
    u_old: jnp.ndarray,
    dR,
    ss_points: Optional[jnp.ndarray] = None,   # (6, K) selected safe-set states
    qfun_sel: Optional[jnp.ndarray] = None,    # (K,) cost-to-go of those points
) -> QPData:
    """Scatter the per-step data into the templates → one QP in OSQP form.

    Pure function of the inputs; vmap over leading axes for a scenario batch.
    The OSQP form stacks [ineq; eq]: l ≤ [F; G] z ≤ u with l=−inf on ineq rows
    (reference osqp_solve_qp :259-283 conversion).
    """
    n, d, N = dims.n, dims.d, dims.N
    dt = tmpl.H.dtype

    # dynamics blocks: rows n(1+i)+[0,n), cols x_i / u_i (buildEqConstr :211-218)
    i = jnp.arange(N)
    G = tmpl.G0
    blkx = jnp.zeros((N, n, N + 1, n), dtype=dt).at[i, :, i, :].set(-dyn.A.astype(dt))
    blku = jnp.zeros((N, n, N, d), dtype=dt).at[i, :, i, :].set(-dyn.B.astype(dt))
    G = G.at[n:n * (N + 1), :dims.nx_tot].add(blkx.reshape(N * n, (N + 1) * n))
    G = G.at[n:n * (N + 1), dims.off_u:dims.off_u + dims.nu_tot].add(
        blku.reshape(N * n, N * d)
    )
    L = tmpl.L0.at[n:n * (N + 1)].set(dyn.C.astype(dt).reshape(N * n))

    q = tmpl.q_const.at[dims.off_u:dims.off_u + d].set(
        -2.0 * jnp.asarray(dR, dtype=dt) * u_old.astype(dt)
    )

    if dims.K:
        tr = dims.nx_tot
        G = G.at[tr:tr + n, dims.off_lambda:dims.off_lambda + dims.K].set(
            -ss_points.astype(dt)
        )
        q = q.at[dims.off_lambda:dims.off_lambda + dims.K].set(qfun_sel.astype(dt))

    g_eq = tmpl.E @ x0.astype(dt) + L
    A = jnp.concatenate([tmpl.F, G], axis=0)
    inf = jnp.asarray(jnp.inf, dtype=dt)
    l = jnp.concatenate([jnp.full_like(tmpl.b, -inf), g_eq])
    u = jnp.concatenate([tmpl.b, g_eq])
    return QPData(P=tmpl.H, q=q, A=A, l=l, u=u)


def shift_warm(dims: FTOCPDims, z: jnp.ndarray, y: jnp.ndarray):
    """Shift a solution one stage forward for warm-starting the next step.

    The previous optimum re-indexed to the new time origin (x_k <- x_{k+1},
    u_k <- u_{k+1}, last entries duplicated; λ/terminal blocks kept) is far
    closer to the next optimum than the unshifted iterate, cutting ADMM
    iterations. Duals are shifted blockwise the same way.
    """
    n, d, N, nc = dims.n, dims.d, dims.N, dims.nc

    def shift_rows(v, width, count):
        m = v.reshape(count, width)
        return jnp.concatenate([m[1:], m[-1:]], axis=0).reshape(-1)

    xs = shift_rows(z[: dims.nx_tot], n, N + 1)
    us = shift_rows(z[dims.off_u:dims.off_u + dims.nu_tot], d, N)
    sl = shift_rows(z[dims.off_slack:dims.off_slack + dims.ns_tot], nc, N)
    parts = [xs, us, sl]
    if dims.K:
        parts.append(z[dims.off_lambda:])
    z_s = jnp.concatenate(parts)

    # ineq rows: [lane ncN | input 4N | slack+ ncN | λ+ K]; eq rows:
    # [x0-pin + dynamics (N+1 blocks of n) | terminal n | Σλ 1]
    o = 0
    lane = shift_rows(y[o:o + nc * N], nc, N); o += nc * N
    ub = shift_rows(y[o:o + 4 * N], 4, N); o += 4 * N
    sp = shift_rows(y[o:o + nc * N], nc, N); o += nc * N
    parts = [lane, ub, sp]
    if dims.K:
        parts.append(y[o:o + dims.K])
        o += dims.K
    dyn = shift_rows(y[o:o + dims.nx_tot], n, N + 1); o += dims.nx_tot
    parts.append(dyn)
    if dims.K:
        parts.append(y[o:])
    y_s = jnp.concatenate(parts)
    return z_s, y_s


def unpack(dims: FTOCPDims, z: jnp.ndarray):
    """Split a solution vector by the canonical layout (reference :364-379).

    Returns (x_pred (N+1,6), u_pred (N,2), slack (2N,), lam (K,), tslack (n,));
    the last two are None for plain MPC.
    """
    x_pred = z[:dims.nx_tot].reshape(dims.N + 1, dims.n)
    u_pred = z[dims.off_u:dims.off_u + dims.nu_tot].reshape(dims.N, dims.d)
    slack = z[dims.off_slack:dims.off_slack + dims.ns_tot]
    if dims.K:
        lam = z[dims.off_lambda:dims.off_lambda + dims.K]
        tslack = z[dims.off_tslack:dims.off_tslack + dims.n]
        return x_pred, u_pred, slack, lam, tslack
    return x_pred, u_pred, slack, None, None
