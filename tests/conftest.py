"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via
--xla_force_host_platform_device_count (the analogue of the reference's
multi-container Docker simulation, README.md:232-268); real-TPU perf runs
live in bench.py, not the test suite.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# all Pallas kernels run in interpreter mode on CPU
os.environ.setdefault("PRIMA_PALLAS_INTERPRET", "1")
os.environ["JAX_PLATFORMS"] = "cpu"

# jax may already be imported by the environment's sitecustomize with
# JAX_PLATFORMS pointing at a TPU plugin; override via config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    import jax

    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
