import os
import pathlib

import pytest

# Force the host CPU backend with a virtual 8-device mesh so sharding tests
# exercise real multi-device code paths. The container's sitecustomize
# imports jax (axon TPU backend) before conftest runs, so environment
# variables alone are too late — but backends are not initialized yet, so
# jax.config still wins if we update it before the first device lookup.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
REFERENCE_RESOURCES = pathlib.Path("/root/reference/resources")


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the host CPU backend, got "
        f"{jax.devices()}")


@pytest.fixture(scope="session")
def fixtures():
    return FIXTURES


@pytest.fixture(scope="session")
def ecoli_dir():
    if not REFERENCE_RESOURCES.exists():
        pytest.skip("reference resources not available")
    return REFERENCE_RESOURCES
