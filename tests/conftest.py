"""Test configuration: CPU platform with 8 virtual devices, float64.

Mirrors the reference's global float64 fixture
(``tests/linpde_gp/conftest.py:1-3``) and adds the virtual multi-device
mesh used by the ``parallel`` tests (the driver validates real multi-chip
sharding separately via ``__graft_entry__.dryrun_multichip``).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
