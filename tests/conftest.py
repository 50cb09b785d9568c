"""Test configuration: CPU backend with 8 virtual devices, x64 enabled.

Mirrors the reference's test philosophy (SURVEY.md §4): tests compile the real kernels (here:
Pallas interpret mode — the TPU analog of "the test binary compiles the production .cu sources",
tests/CMakeLists.txt:57-62) and validate numerically against analytical oracles.  The virtual
8-device mesh gives the distributed coverage the reference never had (its MPI paths were
validated only operationally)."""

import os
import re

# Must be set before the first jax backend initialization.  The suite is designed for the
# virtual 8-device CPU mesh; set TPUSPARSE_TEST_TPU=1 to run it against real hardware instead.
_USE_TPU = os.environ.get("TPUSPARSE_TEST_TPU") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    # force EXACTLY 8 virtual devices, overriding any pre-existing count (a CI image with
    # device_count=4 would otherwise fail every test on the device-count assert)
    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _USE_TPU:
    # Some environments pre-register an accelerator platform at interpreter start
    # (sitecustomize); the config update overrides it even then.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)


@pytest.fixture(scope="session", autouse=True)
def _verify_virtual_devices():
    if not _USE_TPU:
        assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"
