from racinglmpc_tpu.utils.config import (  # noqa: F401
    VehicleParams,
    MPCConfig,
    LMPCConfig,
    SolverConfig,
    SimConfig,
    default_vehicle_params,
)
