"""Test configuration.

Device-path tests run on a virtual 8-device CPU mesh so multi-chip
sharding is exercised without TPU hardware.  These env vars must be set
before the first ``import jax`` anywhere in the test process, and must
*override* the session's platform (the environment pins JAX_PLATFORMS
to the TPU tunnel); set NXS_TEST_PLATFORM to test on other platforms.
"""

import os
import sys

_platform = os.environ.get("NXS_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The jaxtyping pytest plugin imports jax before this conftest runs,
# which snapshots JAX_PLATFORMS into jax.config before we can set the
# environment -- override the config value directly (the XLA backend
# itself is not initialized until first use, so this still applies).
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running stress test (deselect with "
        "-m 'not slow')")
