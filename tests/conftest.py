"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via
``--xla_force_host_platform_device_count`` (the reference has no multi-device
tests at all; see SURVEY.md section 4). Environment variables must be set
before jax initializes, hence at module import time here.
"""

import os

# force CPU: the harness presets JAX_PLATFORMS to the TPU tunnel (and may
# pre-import jax via sitecustomize, so the env var alone is read too late) —
# tests must run on the virtual multi-device CPU backend (and use f64 oracles).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may already be imported (sitecustomize), in which case it captured
# JAX_PLATFORMS at import; config.update works any time before backend init.
jax.config.update("jax_platforms", "cpu")

# Double precision for the math-oracle tests (production code sets dtypes
# explicitly, so this only widens default-dtype test arrays).
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", "tests must not run on the TPU tunnel"
assert jax.device_count() == 8, "tests expect the virtual 8-device CPU mesh"

import pytest  # noqa: E402

# Fast correctness tier: `pytest -m quick` gives a green/red signal in
# ~2 min on a 1-core host (the full suite takes ~9 min serially). Whole
# modules listed here are auto-marked; individual tests elsewhere can still
# opt in with @pytest.mark.quick.
_QUICK_MODULES = {
    "test_lie",
    "test_camera",
    "test_augment_ops",
    "test_data",
    "test_labeler",
    "test_cli_logging",
    "test_maxpool_vjp",
    "test_native_io",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
