"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding
(`nnc_tpu.parallel`) is exercised without TPU hardware. These env vars must be
set before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset a TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some environments register a TPU platform plugin that wins over the env
# var; pin the platform through jax.config as well (before backend init).
import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
