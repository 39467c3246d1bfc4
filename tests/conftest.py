"""Test configuration: force CPU JAX with a virtual 8-device mesh so the
multi-chip sharding paths compile and run without TPU hardware (the analog of
the reference's threads=>2 golden re-runs in test/test.pl)."""

import os

# force CPU regardless of the ambient JAX_PLATFORMS (the driver machine
# points it at the tunnelled TPU, where every new shape costs a 20-40 s
# compile and only one process can hold the chip); the axon sitecustomize
# overrides the env var via jax.config, so override it back the same way.
# Set SAMTPU_TEST_TPU=1 to run the suite on real hardware.
if not os.environ.get("SAMTPU_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def ref_dir():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    return REFERENCE
