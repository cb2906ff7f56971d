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

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Fast / full lanes (VERDICT r3 "do this" #7).  The heavyweight torch-oracle
# and full-protocol tests are marked @pytest.mark.slow; a plain full-suite
# run (`pytest tests/ -q`) skips them to keep the pre-commit lane under
# ~5 minutes.  The full lane is unchanged and runs when ANY of:
#   - RPO_TPU_FULL_TESTS=1 pytest tests/ -q
#   - pytest -m slow   (just the slow ones) / -m "slow or not slow" (all)
#   - a targeted invocation naming a file, test id, or -k expression
#     (running tests/test_full_protocol_parity.py or -k <slow test name>
#     directly must run it, not skip it)
# ---------------------------------------------------------------------------


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavyweight oracle/protocol test (full lane only)"
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RPO_TPU_FULL_TESTS") == "1":
        return
    if config.getoption("-m"):
        return  # an explicit marker expression wins
    if config.getoption("-k"):
        return  # tests explicitly selected by name must run, not skip
    args = [a for a in config.args if not a.startswith("-")]
    if any(".py" in a or "::" in a for a in args):
        return  # targeted run: execute exactly what was asked
    skip = pytest.mark.skip(
        reason="slow lane (RPO_TPU_FULL_TESTS=1 or target the file to run)"
    )
    n = 0
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
            n += 1
    if n:
        print(
            f"\n[conftest] fast lane: skipping {n} slow tests "
            "(RPO_TPU_FULL_TESTS=1 for the full lane)"
        )
