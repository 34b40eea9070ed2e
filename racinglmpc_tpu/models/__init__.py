from racinglmpc_tpu.models.track import (  # noqa: F401
    Track,
    make_track,
    curvature,
    global_position,
    tangent_angle,
    local_position,
)
from racinglmpc_tpu.models.dynamics import plant_step, PlantState  # noqa: F401
