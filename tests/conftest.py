"""Test harness: force an 8-device virtual CPU backend before jax loads.

Multi-device sharding tests run on a simulated mesh via
``--xla_force_host_platform_device_count`` (SURVEY.md §4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
