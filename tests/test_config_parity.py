"""Pin the config tree's defaults to the reference's canonical constants.

These are the literals from `src/main.py:43-54`,
`src/initControllerParameters.py:4-59`, `src/fnc/simulator/SysModel.py:61-73,94`,
`src/fnc/simulator/Track.py:31-40,133`, and
`src/fnc/controller/PredictiveModel.py:18-26` (SURVEY.md §2.2/§2.7/§2.8,
BASELINE.md). A drive-by edit to a default silently changes the parity
configuration every other test assumes; this test makes that loud.
"""
import numpy as np

from racinglmpc_tpu.models import track as track_mod
from racinglmpc_tpu.utils.config import (
    LMPCConfig,
    MPCConfig,
    SimConfig,
    VehicleParams,
)


def test_vehicle_params_reference_defaults():
    vp = VehicleParams()
    assert (vp.m, vp.lf, vp.lr, vp.Iz) == (1.98, 0.125, 0.125, 0.024)
    assert vp.Df == vp.Dr == 0.8 * 1.98 * 9.81 / 2.0
    assert (vp.Cf, vp.Bf, vp.Cr, vp.Br) == (1.25, 1.0, 1.25, 1.0)


def test_sim_config_reference_defaults():
    sc = SimConfig()
    assert (sc.dt, sc.substeps, sc.max_steps) == (0.1, 100, 1000)
    assert sc.delta_t == 0.001
    assert sc.noise_sigma == (0.01, 0.01, 0.005)
    assert (sc.noise_clip, sc.noise_gain) == (0.05, 0.01)


def test_mpc_config_reference_defaults():
    mc = MPCConfig()
    assert (mc.N, mc.vt) == (14, 0.8)
    assert mc.Q == (1.0, 1.0, 1.0, 1.0, 0.0, 100.0)
    assert mc.R == (1.0, 10.0)
    assert mc.q_slack == (0.0, 50.0)
    assert (mc.delta_max, mc.a_max) == (0.5, 10.0)
    assert mc.x_ref == (0.8, 0.0, 0.0, 0.0, 0.0, 0.0)


def test_lmpc_config_reference_defaults():
    lc = LMPCConfig()
    assert (lc.N, lc.num_ss_it, lc.num_ss_points, lc.laps) == (14, 4, 48, 44)
    assert lc.points_per_lap == 13  # numSS_Points/numSS_it + 1
    assert lc.dR == (5.0, 50.0)
    assert lc.q_slack == (5.0, 25.0)
    assert lc.q_terminal_slack == 500.0
    assert lc.ey_max == 0.4  # track half-width
    assert (lc.model_laps, lc.knn_max, lc.kernel_h) == (4, 7, 5.0)
    assert lc.feat_scaling == (0.1, 1.0, 1.0, 1.0, 1.0)
    assert lc.max_laps >= lc.laps


def test_track_reference_geometry():
    trk = track_mod.make_track()
    np.testing.assert_allclose(float(trk.total_len), 19.2296, atol=1e-3)
    np.testing.assert_allclose(float(trk.half_width), 0.4, atol=1e-6)
    # max |curvature| = 0.698 m^-1 (SURVEY §6, verified by executing Track.py)
    np.testing.assert_allclose(
        float(np.max(np.abs(np.asarray(trk.curv)))), 0.698, atol=2e-3
    )
