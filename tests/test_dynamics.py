"""Plant dynamics: closed-form oracles + float64 NumPy parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racinglmpc_tpu.models import track as T
from racinglmpc_tpu.models.dynamics import PlantState, plant_step
from racinglmpc_tpu.utils.config import SimConfig, VehicleParams

from tests.oracles import ref_plant


@pytest.fixture(scope="module")
def trk():
    return T.make_track(dtype=jnp.float64)


VP = VehicleParams()
CFG = SimConfig(noise=False)


def _state(x, x_glob=None):
    x = jnp.asarray(x, dtype=jnp.float64)
    if x_glob is None:
        x_glob = jnp.asarray([x[0], x[1], x[2], 0.0, 0.0, 0.0], dtype=jnp.float64)
    return PlantState(x=x, x_glob=jnp.asarray(x_glob, dtype=jnp.float64))


def test_pure_longitudinal_closed_form(trk):
    # vy = wz = delta = 0 -> tire forces vanish; Euler gives exact linear vx.
    st = _state([0.5, 0, 0, 0, 0, 0])
    out = plant_step(st, jnp.asarray([0.0, 1.0]), VP, trk, CFG)
    assert np.isclose(float(out.x[0]), 0.6, atol=1e-12)
    # s = sum dT*vx_i = dT*(100*0.5 + a*dT*(0+...+99))
    s_exp = 0.001 * (100 * 0.5 + 1.0 * 0.001 * 4950)
    assert np.isclose(float(out.x[4]), s_exp, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.x)[[1, 2, 3, 5]], 0.0, atol=1e-15)
    # global frame: X advances identically, Y stays 0
    assert np.isclose(float(out.x_glob[4]), s_exp, atol=1e-12)
    assert np.isclose(float(out.x_glob[5]), 0.0, atol=1e-15)


def test_parity_vs_numpy_oracle(trk):
    rng = np.random.default_rng(1)
    curv_fn = ref_plant.np_curvature_fn(trk)
    for _ in range(5):
        x = np.array([
            rng.uniform(0.3, 2.0), rng.uniform(-0.2, 0.2), rng.uniform(-0.5, 0.5),
            rng.uniform(-0.2, 0.2), rng.uniform(0.0, 18.0), rng.uniform(-0.3, 0.3),
        ])
        g = np.array([x[0], x[1], x[2], rng.uniform(-3, 3), rng.uniform(-2, 2), rng.uniform(-2, 2)])
        u = np.array([rng.uniform(-0.4, 0.4), rng.uniform(-2, 2)])
        ref_x, ref_g = ref_plant.plant_step(x, g, u, curv_fn)
        out = plant_step(_state(x, g), jnp.asarray(u), VP, trk, CFG)
        np.testing.assert_allclose(np.asarray(out.x), ref_x, atol=1e-10)
        np.testing.assert_allclose(np.asarray(out.x_glob), ref_g, atol=1e-10)


def test_noise_deterministic_and_bounded(trk):
    st = _state([0.5, 0, 0, 0, 0, 0])
    cfg = SimConfig(noise=True)
    u = jnp.asarray([0.1, 0.5])
    k = jax.random.PRNGKey(0)
    a = plant_step(st, u, VP, trk, cfg, key=k)
    b = plant_step(st, u, VP, trk, cfg, key=k)
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
    clean = plant_step(st, u, VP, trk, SimConfig(noise=False), key=k)
    d = np.abs(np.asarray(a.x - clean.x))
    assert (d[:3] <= 0.01 * 0.05 + 1e-12).all() and (d[:3] > 0).any()
    np.testing.assert_allclose(d[3:], 0.0, atol=1e-15)
    # noise never touches the global frame (reference adds it to cur_x only)
    np.testing.assert_array_equal(np.asarray(a.x_glob), np.asarray(clean.x_glob))


def test_vmap_batch(trk):
    xs = jnp.stack([jnp.asarray([0.5 + 0.1 * i, 0, 0, 0, 0, 0], dtype=jnp.float64) for i in range(4)])
    st = PlantState(x=xs, x_glob=xs.at[:, 3:].set(0.0))
    u = jnp.tile(jnp.asarray([0.0, 1.0]), (4, 1))
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    out = jax.vmap(lambda s, uu, k: plant_step(s, uu, VP, trk, CFG, k))(st, u, keys)
    assert out.x.shape == (4, 6)
    np.testing.assert_allclose(np.asarray(out.x[:, 0]), np.asarray(xs[:, 0] + 0.1), atol=1e-12)
