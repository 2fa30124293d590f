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

# Persistent compilation cache: the suite is XLA-compile-dominated on the
# 1-core CI env (~16 min cold); cached reruns skip recompiles entirely.
# Keys include jaxlib version/flags/HLO, so stale hits are not a concern.
_cache_dir = os.environ.get("NNC_TPU_JAX_CACHE",
                            os.path.expanduser("~/.cache/nnc_tpu_jax"))
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:  # older jaxlib without the knobs: run uncached
    pass

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
