"""BASELINE-preset smoke tests (scaled down; full scale runs on TPU and is
recorded as BENCH_<preset>.json artifacts)."""
import numpy as np
import pytest

from racinglmpc_tpu.runtime import presets


def test_preset_table_covers_baseline_configs():
    assert set(presets.PRESETS) == {
        "config1_pid", "config2_lti", "config3_ltv", "config4_lmpc",
        "config5_lmpc_4k",
    }


@pytest.mark.slow
def test_config5_structure_smoke():
    """config5's memory shape (store_glob off, offload_laps, tight chunks)
    runs end-to-end at toy scale and still learns."""
    out = presets.run_preset("config5_lmpc_4k", scale_batch=2 / 4096,
                             n_laps=3)
    assert out["laps_completed"] == out["batch"] == 2
    lt = out["mean_lap_times_s"]
    assert len(lt) == 3 and lt[-1] < lt[0]
    # offloaded trajectories live on host (numpy) — covered implicitly by
    # run_preset's summary math; lap times finite
    assert np.all(np.isfinite(lt))
