"""Typed configuration tree for the TPU-native LMPC framework.

The reference scatters its configuration across literals in ``src/main.py:43-54``,
two factory functions (``src/initControllerParameters.py:4-59``), vehicle
constants (``src/fnc/simulator/SysModel.py:61-70``), and regression
hyper-parameters (``src/fnc/controller/PredictiveModel.py:18-26``). Here it is
one typed tree:

- :class:`VehicleParams` is a NamedTuple of scalars → a JAX pytree, so it can
  be vmapped/sharded to run *parameter variants* as part of the scenario batch.
- :class:`MPCConfig` / :class:`LMPCConfig` / :class:`SolverConfig` /
  :class:`SimConfig` are frozen dataclasses consumed at trace time (static
  shapes / weights baked into the compiled program).

Default values are the reference's canonical parity configuration.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import numpy as np


class VehicleParams(NamedTuple):
    """Single-track bicycle + Pacejka tire parameters.

    Defaults reproduce the 1/10-scale BARC car in the reference
    (``src/fnc/simulator/SysModel.py:61-70``). Being a NamedTuple of scalars
    this is a JAX pytree: broadcastable and batchable (leading batch dims on
    every leaf) so a scenario batch can sweep vehicle parameters.
    """

    m: float = 1.98       # mass [kg]
    lf: float = 0.125     # CoG -> front axle [m]
    lr: float = 0.125     # CoG -> rear axle [m]
    Iz: float = 0.024     # yaw inertia [kg m^2]
    Df: float = 0.8 * 1.98 * 9.81 / 2.0   # Pacejka peak, front [N]
    Cf: float = 1.25      # Pacejka shape, front
    Bf: float = 1.0       # Pacejka stiffness, front
    Dr: float = 0.8 * 1.98 * 9.81 / 2.0   # Pacejka peak, rear [N]
    Cr: float = 1.25      # Pacejka shape, rear
    Br: float = 1.0       # Pacejka stiffness, rear


def default_vehicle_params() -> VehicleParams:
    return VehicleParams()


# State / input dimensions (curvilinear frame). x = [vx, vy, wz, epsi, s, ey],
# u = [delta, a] — reference `src/initControllerParameters.py:19-20`.
NX = 6
NU = 2


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Plant / closed-loop simulation configuration.

    Reference: dt and substep discretization `src/fnc/simulator/SysModel.py:73,94`,
    noise magnitudes `:139-145`, step cap `:33` (maxSimTime=100 s / dt).
    """

    dt: float = 0.1                 # control period [s] (10 Hz)
    substeps: int = 100             # Euler substeps per control step (1 kHz)
    max_steps: int = 1000           # hard cap on control steps per lap
    noise: bool = True              # plant noise on (vx, vy, wz)
    noise_sigma: Tuple[float, float, float] = (0.01, 0.01, 0.005)
    noise_clip: float = 0.05
    noise_gain: float = 0.01
    # fused Pallas plant-rollout kernel (ops/pallas_rollout.py): the whole
    # batch's 100 substeps run VMEM-resident per control step instead of a
    # vmapped fori_loop. float32 + scalar VehicleParams only;
    # pallas_interpret forces interpreter mode (CPU tests).
    use_pallas_rollout: bool = False
    pallas_interpret: bool = False

    @property
    def delta_t(self) -> float:
        return self.dt / self.substeps


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    """LTI/LTV-MPC tuning. Reference `src/initControllerParameters.py:4-26`.

    Constraint convention (same as reference): lane bound |ey| <= ey_max with
    soft slack; input box |delta| <= delta_max, |a| <= a_max (hard).
    """

    N: int = 14
    vt: float = 0.8                            # target speed [m/s]
    Q: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0, 0.0, 100.0)
    R: Tuple[float, ...] = (1.0, 10.0)
    dR: Tuple[float, ...] = (0.0, 0.0)
    Qf: Tuple[float, ...] = (0.0,) * NX
    # slack cost [quadratic, linear] on the 2 lane constraints per stage
    # (reference Qslack = [0, 50], `initControllerParameters.py:22`)
    q_slack: Tuple[float, float] = (0.0, 50.0)
    ey_max: float = 2.0                        # lane bound used by LTI/LTV-MPC
    delta_max: float = 0.5                     # steering bound [rad]
    a_max: float = 10.0                        # accel bound [m/s^2]
    time_varying: bool = False

    @property
    def x_ref(self) -> Tuple[float, ...]:
        return (self.vt, 0.0, 0.0, 0.0, 0.0, 0.0)


@dataclasses.dataclass(frozen=True)
class LMPCConfig:
    """LMPC tuning + safe-set sizing. Reference `src/initControllerParameters.py:28-59`.

    Fixed-capacity buffer sizes replace the reference's dynamically grown
    Python lists (the central static-shape re-design).
    """

    N: int = 14
    num_ss_it: int = 4            # laps used to build the safe set
    num_ss_points: int = 48       # total safe-set points (12 per lap)
    laps: int = 44                # total laps incl. the seed laps
    Q: Tuple[float, ...] = (0.0,) * NX
    R: Tuple[float, ...] = (0.0, 0.0)
    dR: Tuple[float, float] = (5.0, 50.0)
    q_slack: Tuple[float, float] = (5.0, 25.0)   # [quadratic, linear] lane slack
    q_terminal_slack: float = 500.0              # terminal-slack quadratic weight
    ey_max: float = 0.4                          # = track half-width
    delta_max: float = 0.5
    a_max: float = 10.0

    # --- fixed-capacity buffers (TPU static shapes) ---
    # Seed (PID) runs are 1000 steps (reference maxSimTime/dt); a stored lap
    # additionally grows by addPoint appends during the following lap.
    max_laps: int = 48            # >= laps
    max_pts: int = 2048           # per-lap point capacity (lap steps + addPoint growth)
    model_laps: int = 4           # laps used by the local sys-id (trToUse)
    model_pts: int = 1024         # per-lap capacity in the sys-id store
    # addPoint extension-buffer capacity: per-step appends land here (part of
    # the scan carry) and are merged into the safe set once per lap, keeping
    # the big (max_laps, max_pts, ·) buffers loop-invariant during a lap
    # (controllers/lmpc.ExtBuffer). Sized for the longest lap (reference
    # maxSimTime/dt = 1000 steps); clipped to max_pts via ``ext_cap``.
    ext_pts: int = 1024

    # QP-failure recovery: after this many consecutive rejected solves the
    # controller applies the PID law toward fallback_vt instead of holding
    # the stale input (stuck scenarios must self-recover; SURVEY §5.3)
    fallback_after: int = 6
    fallback_vt: float = 0.8

    # local regression hyper-parameters (reference PredictiveModel.py:18-26)
    knn_max: int = 7              # MaxNumPoint per lap
    kernel_h: float = 5.0         # Epanechnikov bandwidth
    reg_lambda: float = 0.0       # ridge term in the local LS (reference: 0)
    reg_jitter: float = 1e-9      # numerical jitter for the 5x5 solves (ours)
    feat_scaling: Tuple[float, ...] = (0.1, 1.0, 1.0, 1.0, 1.0)

    # run the whole local sys-ID (kNN + WLS + kinematic rows) as one fused
    # Pallas kernel (ops/pallas_sysid.py) instead of the vmapped XLA path.
    # OPT-IN (like SolverConfig.use_pallas / SimConfig.use_pallas_rollout):
    # the TPU lowering of a hand-written kernel can silently diverge from
    # its interpret-mode tests (see ops/pallas_qp.py design notes), so the
    # default path is XLA; the bench/presets enable this explicitly and are
    # quality-gated by on-TPU closed-loop runs. Engages only on TPU with
    # float32 state and model_pts % 128 == 0 (falls back to the XLA path
    # otherwise); sysid_interpret forces interpreter mode (CPU tests).
    # Measured on v5e: the kernel alone is ~9% faster than the XLA path
    # (8.0 vs 8.9 ms, batch 256, T=512) and the full control step ~4%
    # (5837 vs 5585 solves/s, parity ~2e-5).
    use_pallas_sysid: bool = False
    sysid_interpret: bool = False

    @property
    def points_per_lap(self) -> int:
        # numSS_Points / numSS_it + 1 selected, first 12 used as SS and
        # last 12 as successors (reference PredictiveControllers.py:403-407)
        return self.num_ss_points // self.num_ss_it + 1

    # store the global-frame mirror of each lap (reference SS_glob) — used
    # only by visualization; turning it off drops 40% of the safe set's HBM
    # footprint (0.66 MB/scenario at max_pts 768), which matters at batch
    # >= 2k on one chip
    store_glob: bool = True

    @property
    def ext_cap(self) -> int:
        # flush_ext requires the extension buffer to fit inside one lap's rows
        return min(self.ext_pts, self.max_pts)

    @property
    def glob_cap(self) -> int:
        return self.max_pts if self.store_glob else 8


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Batched dense QP solver (OSQP-style ADMM + active-set polish).

    Matches OSQP's algorithmic defaults where they matter for parity with the
    reference's `osqp.setup(..., polish=True)` call
    (`src/fnc/controller/PredictiveControllers.py:275`).
    """

    max_iter: int = 250
    rho: float = 0.1
    rho_eq_scale: float = 1e3     # OSQP multiplies rho by 1e3 on equality rows
    sigma: float = 1e-6
    alpha: float = 1.6            # over-relaxation
    eps_abs: float = 1e-3         # OSQP defaults (the reference passes none)
    eps_rel: float = 1e-3
    scaling_iters: int = 10       # Ruiz equilibration sweeps (0 = off)
    # refinement sweeps when warm-started from the cached scaling. Fewer
    # sweeps (e.g. 2) are measurably faster, but refinement ALONE goes stale
    # over long LMPC sessions — observed as a mass lap-time collapse
    # (~9 s -> ~20 s) after ~17 laps at 2 sweeps in round 1. The staleness
    # guard is ``scaling_refresh_every``: every K-th solve re-equilibrates
    # from scratch with the full ``scaling_iters`` sweeps (0 = never, only
    # safe when warm == cold sweep counts). See ops/qp.FactorCache.
    scaling_warm_iters: int = 10
    scaling_refresh_every: int = 0
    adaptive_rho: bool = True
    warmup_iters: int = 25        # iterations at rho0 before the adaptation
    check_every: int = 25         # convergence-check/early-exit granularity
    polish: bool = True
    polish_delta: float = 1e-6
    polish_refine_steps: int = 3
    # iterative-refinement rounds on each ADMM x-update; essential in float32
    # where cond(K) ~ 1e6 eats ~2 digits of the factorized solve
    kkt_refine_steps: int = 1
    # Newton–Schulz KKT inverse (matmul-only; replaces batched LU on TPU):
    # residual tolerance (None = dtype default: 1e-3 f32 / 1e-9 f64) and
    # iteration cap (cold build needs ~25-30; warm refresh ~1-5)
    ns_tol: "float | None" = None
    ns_max_iters: int = 40
    # staged-precision Newton-Schulz: run the early cold-build iterations at
    # DEFAULT (1-pass bf16) then HIGH (3-pass) matmul precision, finishing
    # at HIGHEST. MEASURED NEGATIVE on the product FTOCP and kept only as a
    # recorded experiment (default OFF): on a synthetic cond~1e4 K it cuts
    # the batch-256 cold build 12.0 -> 6.8 ms, but the real scaled FTOCP K
    # has cond ~ 1e6, so ||Kinv|| ~ 1e5-1e6 and the low-precision product
    # noise (~eps_prec * ||K|| * ||X||) exceeds the O(1) residual the early
    # phase must contract — the DEFAULT phase diverges, every solve runs to
    # max_iter and is rejected (sweep_solver round 5: 1392 solves/s, 25600
    # rejects, vs 6680 healthy). Related negative, same root cause: warm-
    # starting NS from the previous step's kinv NEVER contracts on the real
    # workload — rho(I - K_new Kinv_old) ~ ||dK|| * ||Kinv|| >> 1 for any
    # real per-step drift at this conditioning (the round-3/4 "warm NS is
    # 1-3 iterations" claim was a misread; the spectral gate in
    # ops/qp._ns_inverse now measures contraction per solve and the cold
    # build is the every-step reality).
    ns_staged_precision: bool = False
    # exact block-tridiagonal KKT inverse (ops/kkt_band.py): when the caller
    # provides the FTOCP stage structure, the per-step Kinv build uses the
    # O(N b^2 n) structured factorization (GEMM-only, no conditioning
    # dependence) instead of the ~21-iteration cold Newton-Schulz build
    # (measured 14.2 -> ~7.5 ms at batch 256 on the real workload); the NS
    # guard still verifies the result and provides the fallback
    kkt_structured: bool = True
    # VMEM-resident Pallas ADMM kernel (ops/pallas_qp.py): engaged when the
    # dtype is float32, rho is fixed (adaptive_rho=False) and the backend is
    # TPU; pallas_interpret forces interpreter mode (CPU tests)
    # (scenario tiling — multiple problems per grid program — was tried and
    # removed: see the design notes in ops/pallas_qp.py)
    use_pallas: bool = False
    pallas_interpret: bool = False
    # fuse the solve prologue into the Pallas kernel: K = P + sigma I +
    # A' rho A and its Newton–Schulz inverse refresh run per scenario in
    # VMEM (with per-scenario early exit) instead of XLA-side, where the
    # vmapped NS while_loop pays the slowest lane's cold build for the
    # whole batch (measured 13.9 ms of a 43.8 ms batch-256 solve —
    # examples/profile_qp.py). Opt-in like use_pallas; requires it.
    pallas_fused_ns: bool = False
    # matmul precision of the Pallas kernel's ITERATION-loop dots
    # ("highest" = 6-pass f32 | "bf16x3" = hand-rolled 3-product bf16
    # decomposition, ~2^-16 operator error at half the MXU passes |
    # "default" = one truncated bf16 pass). Residual checks always run at
    # highest (they gate acceptance), so lowering this trades per-iteration
    # MXU passes against possibly more iterations — see ops/pallas_qp.py.
    pallas_iter_precision: str = "highest"
    # controllers accept a solution only if the unscaled primal residual is
    # below this (float32 ADMM stalls on the *dual* residual at ~1e-1 while
    # the primal solution is accurate; divergence shows up as pri >> 1e-2)
    accept_pri_res: float = 1e-2
    # --- rho-escalation rescue stage (round 4) ---
    # Root-cause fix for the late-lap rejection bursts (the round-3 16-lap
    # TPU artifact: lap 14/15 bursts of 21-41 rejected solves, lap times
    # 79 -> 123+ steps). Replaying the captured burst QPs on the real TPU
    # kernel (examples/probe_rejects.py + replay_rejects.py) showed every
    # rejected solve needs a HIGHER rho — x5 converts 30/30 into accepted
    # solves and improves accuracy vs the f64 oracle (|du0| p50 2.5e-2 ->
    # 3.8e-3), while a 10x iteration budget alone fixes 5/30. When the main
    # loop ends with unscaled primal residual > rescue_trigger (just under
    # accept_pri_res, so anything the controller would reject), rho is
    # scaled by rescue_rho_scale, the KKT inverse rebuilt (in-kernel and
    # per-scenario on the Pallas path — only failing lanes pay), and up to
    # rescue_max_iter further iterations run with a primal-only exit at
    # rescue_exit. 0 disables (the default keeps the parity path and all
    # golden tests byte-identical).
    rescue_max_iter: int = 0
    rescue_rho_scale: float = 5.0
    rescue_trigger: float = 7.5e-3
    rescue_exit: float = 1e-3

    @classmethod
    def throughput(cls) -> "SolverConfig":
        """Speed-oriented settings for float32 TPU runs: no active-set
        polish, a fixed (non-adaptive) rho so the warm Newton–Schulz
        refactorization hits on every step, and the VMEM-resident Pallas
        ADMM kernel. The iteration budget is generous because the kernel's
        per-scenario early exit makes unused budget free (measured: bench
        throughput identical at max_iter 100/200/300; the larger budget
        removes occasional hard-solve rejections).

        Round-3 tuning (examples/sweep_solver.py, one process, batch 256):
        warm Ruiz 2 sweeps + full re-equilibration every 50 solves
        (staleness-guarded; +7%), check_every 25 -> 4 (a residual check is
        3 HIGHEST dots vs 7 per iteration, so fine-grained early exit is
        nearly free and saves ~10 mean iterations; +12% more; plateau at
        3-5, down at 2) — 5519 -> 6638 solves/s, rejects 13 -> 1 per 25600.
        Quality-gated on the TPU product path: 16-lap lap-time totals
        within 0.1% of the old preset (/tmp-committed artifact in
        BENCH_solver_quality_16lap_tpu.json).

        Round-4 tuning: the rescue stage (rescue_max_iter=300) fixed the
        late-lap rejection bursts for ~0.8% throughput — quality-gated at
        the reference's full 40-lap scale: 0.46% cumulative lap-time error,
        0 rejects (BENCH_solver_quality_40lap_tpu.json). rho=0.1 is
        QUALITY-OPTIMAL and must not be lowered for speed: rho 0.03 sweeps
        +13% solves/s with p99 iters 40 (vs 68) but fails the 16-lap TPU
        quality run at 13.98% cumulative error (rho 0.05: 4.91%) — the
        early-lap sweep workload does not represent converged-lap FTOCPs.
        Earlier rescue escalation (max_iter 40/60) explodes rejections
        2 -> 2461 per 25600. The p99 iteration tail is load-bearing."""
        return cls(max_iter=300, polish=False, adaptive_rho=False,
                   use_pallas=True,
                   scaling_warm_iters=2, scaling_refresh_every=50,
                   check_every=4, rescue_max_iter=300,
                   # round 5: the structured KKT inverse is +31% solves/s at
                   # identical tolerances/iteration stats, but its accepted
                   # solutions' closed-loop quality at CONVERGED laps runs
                   # ~1 step/lap (~1.4%) slower than the NS path's — 40-lap
                   # criterion 2.18%/2.0% (two runs) vs 0.46% NS and the
                   # 1% bar, confirmed causal by a batch-8 converged-regime
                   # A/B (77.19 vs 76.20 mean steps over 64 lap-samples).
                   # The criterion-bound headline therefore keeps the NS
                   # build; throughput_max() ships the structured speed
                   # with the tradeoff documented. Tightening eps to 7e-4
                   # recovers ~0.7 of the gap but costs the whole win
                   # (7.18k solves/s ~ NS headline).
                   kkt_structured=False)

    @classmethod
    def throughput_max(cls) -> "SolverConfig":
        """Maximum-throughput float32 preset: :meth:`throughput` with the
        exact block-tridiagonal KKT inverse (ops/kkt_band.py) in place of
        the per-step Newton-Schulz cold build.

        Measured (round 5, TPU v5e, batch 256, ABBA sweeps): **8,656-8,683
        solves/s vs 6,590-6,690** for :meth:`throughput` (+31%), identical
        ADMM iteration stats (mean 26.9 / p50 24 / p99 72) and unconverged
        counts. The tradeoff is closed-loop lap-time quality at CONVERGED
        laps: ~+1 step/lap (~1.4% at 70-step laps; 40-lap cumulative
        2.18% vs the 1% parity criterion that :meth:`throughput` meets at
        0.46%). Use when step throughput or latency dominates and the
        last ~1% of converged lap time does not."""
        base = cls.throughput()
        import dataclasses as _dc
        return _dc.replace(base, kkt_structured=True)

    @classmethod
    def balanced(cls) -> "SolverConfig":
        """Budget-quality float32 TPU settings: a tighter tolerance TARGET
        than :meth:`throughput` (eps 3e-4 vs 1e-3) at roughly half the step
        rate — but NOT a tighter-delivery preset. Honesty note (round-4
        verdict item 6, measured in BENCH_solver_quality_40lap_tpu.json):
        in float32 the dual residual frequently stalls above the 3e-4
        target, so at the reference's 40-lap scale this preset applies
        unconverged-but-accepted solutions on ~59% of steps (round-5
        artifact; throughput: 4.1%). Its lap-time quality is
        nevertheless measured GOOD - 0.26% cumulative vs the oracle over 40
        laps (round 5; 0.52% round 4), final lap oracle-equal - because
        the accepted solutions' primal residuals stay under accept_pri_res
        and the lap-time criteria, not the tolerance flag, are the quality
        bar.
        ``examples/solver_quality.py`` reports ``unconverged_rate`` per
        preset so this trade is visible in every quality artifact.

        Note: unlike :meth:`throughput`, this preset keeps the default
        ``kkt_structured=True`` (the structured KKT build) — its tighter
        eps shrinks the accepted-solution spread enough that the
        structured build's converged-lap cost does not appear (round-5
        40-lap artifact: 0.26% cumulative WITH the structured build,
        matching the round-5 eps-tightening experiment)."""
        return cls(max_iter=300, polish=False, adaptive_rho=False,
                   use_pallas=True, eps_abs=3e-4, eps_rel=3e-4,
                   scaling_warm_iters=2, scaling_refresh_every=50,
                   check_every=4, rescue_max_iter=300)

    @classmethod
    def parity(cls) -> "SolverConfig":
        """Accuracy-oriented settings (float64 tests vs the vendored
        interior-point oracle reach machine precision)."""
        return cls(max_iter=1000, warmup_iters=100, check_every=100)


def np_Q(cfg) -> np.ndarray:
    return np.diag(np.asarray(cfg.Q, dtype=np.float64))


def np_R(cfg) -> np.ndarray:
    return np.diag(np.asarray(cfg.R, dtype=np.float64))
