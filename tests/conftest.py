"""Test configuration: force CPU with 8 virtual devices and enable x64.

All sharding/collective tests run on a fake 8-device CPU mesh
(``xla_force_host_platform_device_count``); the same code runs unchanged on
real TPU slices. x64 is enabled so parity tests against the float64 NumPy
oracles are meaningful; framework code is dtype-agnostic.
"""
import os

# hard-override: the dev environment pre-sets JAX_PLATFORMS to the TPU tunnel;
# unit/parity tests always run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# sitecustomize may have imported jax already (axon TPU plugin); the backend
# is not initialized until first use, so this still forces CPU for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
