"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

This is the TPU answer to "distributed tests without a cluster" — pjit/mesh
code paths run against 8 virtual host devices (SURVEY.md §4 plan).
"""

import os

# Hard overrides: the environment ships JAX_PLATFORMS=axon and a
# sitecustomize that registers the TPU plugin whenever PALLAS_AXON_POOL_IPS
# is set — setdefault is not enough to get a CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The sitecustomize has ALREADY registered the axon plugin by the time this
# file runs (interpreter startup) and forces jax_platforms="axon,cpu"; point
# the config back at cpu before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg():
    from shgvqa_tpu.configs.config import tiny_test_config

    return tiny_test_config()
