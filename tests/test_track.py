"""Track geometry: hand-derived oracles + geometric invariants.

Oracle values are hand-computed from the reference L-track spec
(Track.py:31-40): segment s-ranges and curvatures, total length 19.2296 m
(verified by executing the reference, see BASELINE.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racinglmpc_tpu.models import track as T

PI = np.pi
KC = PI / 4.5  # curvature magnitude of the arc segments (1/r, r = 4.5/pi)


@pytest.fixture(scope="module")
def trk():
    return T.make_track(dtype=jnp.float64)


def test_total_length(trk):
    assert np.isclose(float(trk.total_len), 19.2296, atol=2e-4)


def test_segment_table(trk):
    # s0 boundaries: 0, 1, 5.5, 7.75, 12.25, 12.25+9/pi, +2.25
    exp_s0 = [0.0, 1.0, 5.5, 7.75, 12.25, 12.25 + 9 / PI, 14.5 + 9 / PI]
    np.testing.assert_allclose(np.asarray(trk.s0), exp_s0, atol=1e-12)
    exp_k = [0.0, KC, -KC, KC, 0.0, KC, 0.0]
    np.testing.assert_allclose(np.asarray(trk.curv), exp_k, atol=1e-12)


@pytest.mark.parametrize(
    "s,expected",
    [
        (0.5, 0.0), (3.0, KC), (6.0, -KC), (10.0, KC),
        (13.0, 0.0), (16.0, KC), (18.5, 0.0),
    ],
)
def test_curvature_lookup(trk, s, expected):
    assert np.isclose(float(T.curvature(trk, jnp.asarray(s))), expected, atol=1e-12)


def test_curvature_wraps(trk):
    L = float(trk.total_len)
    s = jnp.asarray([0.5, 3.0, 13.0, 16.0])
    np.testing.assert_allclose(
        np.asarray(T.curvature(trk, s + L)), np.asarray(T.curvature(trk, s)), atol=1e-12
    )


def test_track_closes_at_origin(trk):
    L = float(trk.total_len)
    x, y = T.global_position(trk, jnp.asarray(L - 1e-9), jnp.asarray(0.0))
    assert abs(float(x)) < 1e-6 and abs(float(y)) < 1e-6
    x0, y0 = T.global_position(trk, jnp.asarray(0.0), jnp.asarray(0.0))
    assert abs(float(x0)) < 1e-12 and abs(float(y0)) < 1e-12


def test_global_position_continuous(trk):
    L = float(trk.total_len)
    s = jnp.linspace(0.0, L - 1e-9, 4000)
    x, y = T.global_position(trk, s, jnp.zeros_like(s))
    gaps = np.hypot(np.diff(np.asarray(x)), np.diff(np.asarray(y)))
    ds = L / 4000
    assert gaps.max() < 2.0 * ds  # no jumps at segment boundaries


def test_centerline_arclength(trk):
    # arc length along the centerline equals s
    L = float(trk.total_len)
    s = jnp.linspace(0.0, L - 1e-9, 20000)
    x, y = T.global_position(trk, s, jnp.zeros_like(s))
    arclen = np.sum(np.hypot(np.diff(np.asarray(x)), np.diff(np.asarray(y))))
    assert np.isclose(arclen, L, rtol=1e-5)


def test_local_global_roundtrip(trk):
    rng = np.random.default_rng(0)
    L = float(trk.total_len)
    s = rng.uniform(0.05, L - 0.05, size=200)
    ey = rng.uniform(-0.35, 0.35, size=200)
    X, Y = T.global_position(trk, jnp.asarray(s), jnp.asarray(ey))
    psi = T.tangent_angle(trk, jnp.asarray(s))
    loc = jax.vmap(lambda a, b, c: T.local_position(trk, a, b, c))(X, Y, psi)
    s_r, ey_r, epsi_r, ok = (np.asarray(v) for v in loc)
    assert ok.all()
    # segment-boundary points can legitimately resolve to the adjacent segment
    s_err = np.minimum(np.abs(s_r - s), L - np.abs(s_r - s))
    np.testing.assert_array_less(s_err, 1e-6)
    np.testing.assert_allclose(ey_r, ey, atol=1e-8)
    np.testing.assert_allclose(epsi_r, 0.0, atol=1e-8)


def test_local_position_rejects_far_point(trk):
    *_, ok = T.local_position(trk, jnp.asarray(50.0), jnp.asarray(50.0), jnp.asarray(0.0))
    assert not bool(ok)


def test_jit_and_vmap(trk):
    f = jax.jit(lambda s: T.curvature(trk, s))
    assert np.isclose(float(f(jnp.asarray(3.0))), KC)
    g = jax.jit(jax.vmap(lambda s, e: T.global_position(trk, s, e)))
    x, y = g(jnp.asarray([0.5, 3.0]), jnp.asarray([0.1, -0.1]))
    assert x.shape == (2,)
