"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the standard JAX trick for
validating multi-chip sharding without a pod).  The axon TPU plugin in
this environment overrides the JAX_PLATFORMS env var, so the platform is
forced through jax.config after import; the host-device-count flag still
has to be set before backends initialize.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if os.environ.get("CHROMOSIGHT_TPU_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

from chromosight_tpu.config import init_compilation_cache

init_compilation_cache()

DATA_DIR = pathlib.Path(__file__).parents[1] / "data_test"


@pytest.fixture(scope="session")
def example_cool():
    return str(DATA_DIR / "example.cool")


@pytest.fixture(scope="session")
def example_bed2():
    return str(DATA_DIR / "example.bed2")
