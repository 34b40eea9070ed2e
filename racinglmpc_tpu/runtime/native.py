"""ctypes bindings for the native (C++) runtime library.

Builds ``native/librlmpc_native.so`` on first use (``make`` + g++; cached)
and exposes:

- :func:`solve_qp_admm` — float64 dense ADMM QP solver (the framework's own
  native equivalent of the reference's OSQP dependency, SURVEY §2.9); used
  as a fast host-side oracle and CPU runtime path.
- :func:`rollout` — batched Pacejka plant rollout (native equivalent of the
  reference's NumPy/BLAS plant loop, SURVEY §2.7/§2.11).

``available()`` reports whether the library could be built/loaded; callers
(tests, host tools) should skip gracefully when it is False.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "librlmpc_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True,
            capture_output=True, timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    dp = ctypes.POINTER(ctypes.c_double)
    lib.rlmpc_solve_qp_admm.restype = ctypes.c_int
    lib.rlmpc_solve_qp_admm.argtypes = [
        ctypes.c_int, ctypes.c_int, dp, dp, dp, dp, dp,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_int, dp, dp, dp,
    ]
    lib.rlmpc_rollout.restype = None
    lib.rlmpc_rollout.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_double, dp, dp, dp, dp, dp,
        ctypes.c_int, ctypes.c_double,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_c(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def solve_qp_admm(
    P: np.ndarray, q: np.ndarray, A: np.ndarray, l: np.ndarray, u: np.ndarray,
    *, max_iter: int = 1000, rho: float = 0.1, rho_eq_scale: float = 1e3,
    sigma: float = 1e-6, alpha: float = 1.6, eps_abs: float = 1e-6,
    eps_rel: float = 1e-6, scaling_iters: int = 10, refine_steps: int = 1,
) -> Tuple[np.ndarray, np.ndarray, dict]:
    """Solve one dense QP in OSQP form. Returns (x, y, info)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (g++/make missing?)")
    n, m = P.shape[0], A.shape[0]
    P = np.ascontiguousarray(P, dtype=np.float64)
    q = np.ascontiguousarray(q, dtype=np.float64)
    A = np.ascontiguousarray(A, dtype=np.float64)
    l = np.where(np.isfinite(l), l, -1e30).astype(np.float64)
    u = np.where(np.isfinite(u), u, 1e30).astype(np.float64)
    x = np.zeros(n)
    y = np.zeros(m)
    info = np.zeros(3)
    status = lib.rlmpc_solve_qp_admm(
        n, m, _as_c(P), _as_c(q), _as_c(A), _as_c(l), _as_c(u),
        max_iter, rho, rho_eq_scale, sigma, alpha, eps_abs, eps_rel,
        scaling_iters, refine_steps, _as_c(x), _as_c(y), _as_c(info),
    )
    return x, y, {
        "status": status, "pri_res": info[0], "dua_res": info[1],
        "iters": int(info[2]), "solved": status == 0,
    }


def rollout(
    x: np.ndarray, x_glob: np.ndarray, u: np.ndarray,
    vp_vals: np.ndarray, segs: np.ndarray, track_len: float,
    *, substeps: int = 100, dt_sub: float = 1e-3,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batched plant rollout. x/x_glob (B,6), u (B,2); returns next states.

    ``segs``: (nseg, 3) rows [s0, s_end, curvature]; ``vp_vals``: the 10
    vehicle parameters [m, lf, lr, Iz, Df, Cf, Bf, Dr, Cr, Br].
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (g++/make missing?)")
    x = np.ascontiguousarray(x, dtype=np.float64).copy()
    xg = np.ascontiguousarray(x_glob, dtype=np.float64).copy()
    u = np.ascontiguousarray(u, dtype=np.float64)
    vp_vals = np.ascontiguousarray(vp_vals, dtype=np.float64)
    segs = np.ascontiguousarray(segs, dtype=np.float64)
    lib.rlmpc_rollout(
        x.shape[0], substeps, dt_sub, _as_c(x), _as_c(xg), _as_c(u),
        _as_c(vp_vals), _as_c(segs), segs.shape[0], track_len,
    )
    return x, xg


def track_segs(trk) -> Tuple[np.ndarray, float]:
    """Segment table for :func:`rollout` from a models.track.Track."""
    s0 = np.asarray(trk.s0, dtype=np.float64)
    send = s0 + np.asarray(trk.seg_len, dtype=np.float64)
    cur = np.asarray(trk.curv, dtype=np.float64)
    return np.stack([s0, send, cur], axis=1), float(trk.total_len)


def vehicle_vals(vp) -> np.ndarray:
    return np.asarray(
        [vp.m, vp.lf, vp.lr, vp.Iz, vp.Df, vp.Cf, vp.Bf, vp.Dr, vp.Cr, vp.Br],
        dtype=np.float64,
    )
