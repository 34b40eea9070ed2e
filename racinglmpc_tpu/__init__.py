"""racinglmpc_tpu — a TPU-native Learning Model Predictive Control (LMPC) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
LMPC racing stack (urosolia/RacingLMPC): batched curvilinear-frame vehicle
rollouts, LTI/LTV system identification, FTOCP assembly with sampled-safe-set
terminal machinery, and a batched first-order QP solver — all as pure
functions over fixed-shape arrays, vmap-batched over a *scenario* axis and
sharded over a TPU device mesh.

Layout
------
- ``models``      : track geometry, Pacejka bicycle dynamics, predictive models
                    (LTI ridge regression + local weighted-kernel regression)
- ``ops``         : batched dense QP solver (ADMM + active-set polish),
                    Pallas kernels for hot paths
- ``controllers`` : PID, LTI/LTV-MPC, LMPC as pure ``(state, x) -> (state, u)``
                    step functions; FTOCP assembly
- ``runtime``     : closed-loop lap runner (lax.scan/while_loop), experiment
                    driver, checkpointing, metrics
- ``parallel``    : device mesh / sharding helpers, cross-chip collectives
- ``utils``       : typed configuration tree, PRNG helpers
- ``viz``         : host-side matplotlib plotting

Reference parity: docstrings cite the corresponding behavior in the reference
(`/root/reference/src/...` file:line) that each component reproduces.
"""

__version__ = "0.1.0"

from racinglmpc_tpu.utils.config import (  # noqa: F401
    VehicleParams,
    MPCConfig,
    LMPCConfig,
    SolverConfig,
    default_vehicle_params,
)
from racinglmpc_tpu.models.track import Track, make_track  # noqa: F401
