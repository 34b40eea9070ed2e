"""Smoke tests for the driver entry points in ``__graft_entry__.py``.

The driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip(n)`` on a virtual n-device CPU mesh; these tests pin both
surfaces so a refactor can't silently break the round gate. The conftest
already forces the 8-virtual-device CPU backend, which also exercises the
module's device-count handling.
"""
import jax
import pytest


def test_entry_is_jittable():
    import __graft_entry__ as g

    fn, args = g.entry()
    # abstract evaluation only: catches tracing/shape errors without paying
    # the full compile
    u_shape, feas_shape = jax.eval_shape(fn, *args)
    assert u_shape.shape == (4, 2)
    assert feas_shape.shape == (4,)


@pytest.mark.slow
def test_dryrun_multichip_executes():
    import __graft_entry__ as g

    # asserts internally: finite controls, correct device count
    g.dryrun_multichip(4)
