"""Backend-selection helper for CLI tools.

When a JAX platform plugin (e.g. the axon TPU tunnel) is installed, its
registration wins over the ``JAX_PLATFORMS`` environment variable: asking
for ``JAX_PLATFORMS=cpu`` still initializes the plugin backend, which both
ignores the user's explicit choice and *hangs inside C* at init when the
plugin's tunnel is down (un-interruptible by SIGTERM). Mirroring the env
var into ``jax.config`` before first backend use restores the documented
behavior. Call this at tool startup, before any JAX array is created.

Tests do NOT use this (their conftest pins cpu explicitly); it exists for
``compress_nerf.py`` and the ``tools/`` scripts.
"""
import os


def honor_jax_platforms_env() -> None:
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
