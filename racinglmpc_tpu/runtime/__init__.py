from racinglmpc_tpu.runtime.loop import LapResult, run_lap, run_lap_batch  # noqa: F401
