"""Test configuration: force an 8-device CPU platform before JAX loads.

Multi-chip sharding paths are validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``); real-TPU behavior is covered
by the benchmark driver, not the unit suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any ambient TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The ambient TPU platform plugin ("axon") ignores the JAX_PLATFORMS env var,
# so pin the platform through the config API as well.
import jax

jax.config.update("jax_platforms", "cpu")

