"""shift_warm layout correctness: blocks move by exactly one stage."""
import jax.numpy as jnp
import numpy as np

from racinglmpc_tpu.controllers import ocp


def test_shift_warm_lmpc_layout():
    dims = ocp.FTOCPDims(N=14, K=48)
    z = jnp.arange(dims.nz, dtype=jnp.float64)
    y = jnp.arange(dims.mi + dims.me, dtype=jnp.float64) + 1000.0
    zs, ys = ocp.shift_warm(dims, z, y)
    zs, ys = np.asarray(zs), np.asarray(ys)

    # states shift by one block of 6; last block duplicated
    np.testing.assert_array_equal(zs[:84], np.arange(6, 90))
    np.testing.assert_array_equal(zs[84:90], np.arange(84, 90))
    # inputs shift by one block of 2
    np.testing.assert_array_equal(zs[90:116], np.arange(92, 118))
    np.testing.assert_array_equal(zs[116:118], np.arange(116, 118))
    # slacks shift by one block of 2
    np.testing.assert_array_equal(zs[118:144], np.arange(120, 146))
    # λ and terminal slack unchanged
    np.testing.assert_array_equal(zs[146:], np.arange(146, 200))

    # ineq duals: lane block (2 per stage) shifts
    np.testing.assert_array_equal(ys[:26], 1000 + np.arange(2, 28))
    # eq dynamics duals (after 160 ineq rows) shift by one block of 6
    np.testing.assert_array_equal(ys[160:160 + 84], 1000 + np.arange(166, 250))
    # Σλ row kept
    assert ys[-1] == 1000 + dims.mi + dims.me - 1
    assert zs.shape == z.shape and ys.shape == y.shape


def test_shift_warm_mpc_layout():
    dims = ocp.FTOCPDims(N=14, K=0)
    z = jnp.arange(dims.nz, dtype=jnp.float64)
    y = jnp.arange(dims.mi + dims.me, dtype=jnp.float64)
    zs, ys = ocp.shift_warm(dims, z, y)
    assert zs.shape == z.shape and ys.shape == y.shape
    np.testing.assert_array_equal(np.asarray(zs)[:84], np.arange(6, 90))
