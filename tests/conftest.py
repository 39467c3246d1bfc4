"""Test configuration: force CPU JAX with a virtual 8-device mesh so the
multi-chip sharding paths compile and run without TPU hardware (the analog of
the reference's threads=>2 golden re-runs in test/test.pl)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
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
