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
# persistent compile cache: the suite's wall time is dominated by XLA CPU
# compilation of the same tiny-model programs every run — cache them across
# runs (keyed by HLO hash; PRIMA_TEST_NO_CACHE=1 disables)
if not os.environ.get("PRIMA_TEST_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("PRIMA_TEST_CACHE_DIR",
                                     "/tmp/prima_test_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (multi-process ring/server e2e tiers)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: >30s multi-process/e2e tests (run with --runslow "
        "or PRIMA_SLOW_TESTS=1; CI runs both tiers, see ci/run.sh)")
    config.addinivalue_line(
        "markers", "timeout(seconds): hard wall-clock cap, enforced via "
        "SIGALRM (pytest-timeout is not installed in this image); a hung "
        "multi-process test fails instead of wedging CI")


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    """Enforce @pytest.mark.timeout(N) with SIGALRM (main-thread only).
    Blocking syscalls (queue.get, socket recv, subprocess join) are
    interrupted; the test fails with a TimeoutError."""
    import signal

    marker = item.get_closest_marker("timeout")
    if marker is None or not marker.args or not hasattr(signal, "SIGALRM"):
        yield
        return
    seconds = int(marker.args[0])

    def _on_alarm(signum, frame):
        raise TimeoutError(
            f"test exceeded the {seconds}s @pytest.mark.timeout cap")

    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("PRIMA_SLOW_TESTS"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow (or "
                            "PRIMA_SLOW_TESTS=1) — ci/run.sh runs it")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def cpu_devices():
    import jax

    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
