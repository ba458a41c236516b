"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-device sharding behaviour is exercised the way the reference
exercises MPI (every unit test at np=1..4, unit_tests.py:29-37): by
running the same code over several virtual devices on one host.

Note: this environment's sitecustomize imports jax at interpreter start
with JAX_PLATFORMS=axon (a tunnelled TPU); we must override the platform
via jax.config *before any backend is initialised*, not via os.environ.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
