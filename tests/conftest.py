"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

This is the TPU answer to "distributed tests without a cluster" — pjit/mesh
code paths run against 8 virtual host devices (SURVEY.md §4 plan).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg():
    from shgvqa_tpu.configs.config import tiny_test_config

    return tiny_test_config()
