from racinglmpc_tpu.parallel.mesh import (  # noqa: F401
    SCENARIO_AXIS,
    cross_scenario_metrics,
    init_multi_host,
    make_mesh,
    replicated_sharding,
    scenario_sharding,
    shard_scenario_tree,
)
