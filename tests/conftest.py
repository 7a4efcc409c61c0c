"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multi-chip
path; benchmarks run on the real chip). Env vars must be set before jax import.
"""
import os
import pathlib

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (when present) force-selects itself via
# jax.config at interpreter start, overriding JAX_PLATFORMS; undo that so
# tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
REF_TOY = FIXTURES / "ref_toy"
TOY_SIGS = pathlib.Path("/root/reference/test/toy")


@pytest.fixture(scope="session")
def ref_toy_dir():
    return REF_TOY


@pytest.fixture(scope="session")
def toy_sig_dir():
    if not TOY_SIGS.exists():
        pytest.skip("reference toy signatures not available")
    return TOY_SIGS
