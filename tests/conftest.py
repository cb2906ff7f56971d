"""Test harness: force an 8-device virtual CPU backend before jax is used.

Multi-device sharding tests run on a simulated mesh via
``--xla_force_host_platform_device_count`` (SURVEY.md §4).  Note this
environment force-registers an experimental 'axon' TPU platform that
overrides JAX_PLATFORMS env settings, so we pin via jax.config directly.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
