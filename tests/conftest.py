"""Test config: run everything on CPU with 8 virtual devices.

Note: this image force-registers the `axon` TPU PJRT plugin via
sitecustomize, and JAX_PLATFORMS is pinned to axon — so instead of fighting
the platform selection we keep the plugin and pin the *default device* to
CPU (the cpu backend coexists).  Mesh tests grab `jax.devices("cpu")`
explicitly.  Env vars must be set before jax initializes any backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon register hook sets the *config* key jax_platforms="axon,cpu"
# (env JAX_PLATFORMS is overridden), so restricting platforms must also go
# through jax.config.  "cpu" alone keeps the tunneled-TPU PJRT client from
# ever initializing — CPU tests must not be hostage to tunnel health (a
# wedged tunnel aborted a full suite run mid-flight in round 2).
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:  # backends already up (e.g. driver-embedded run)
    pass

jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running parity tests")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_SLOW"):
        return
    skip_slow = pytest.mark.skip(reason="slow; set RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.local_devices(backend="cpu")
