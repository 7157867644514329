"""Test env: force CPU with 8 virtual devices so multi-chip sharding tests run
without TPU hardware (SURVEY.md §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The runtime image pre-imports jax from sitecustomize (TPU plugin
# registration), so jax.config may already hold the TPU platform — override
# it before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# ---------------------------------------------------------------- slow tier
# Fast per-commit gate: `python -m pytest tests/ -m "not slow" -q` (< 90 s on
# the CPU mesh). Tests measured >= 3.5 s live in slow_tests.txt (one id per
# line); the full suite stays the pre-push gate. Regenerate the list with
# --durations=0 after big suite changes.
_SLOW_PATH = os.path.join(os.path.dirname(__file__), "slow_tests.txt")


def _slow_ids():
    try:
        with open(_SLOW_PATH) as f:
            return {ln.strip() for ln in f
                    if ln.strip() and not ln.startswith("#")}
    except OSError:
        return set()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy test (>= 3.5 s); excluded by -m 'not slow'")


def pytest_collection_modifyitems(config, items):
    slow = _slow_ids()
    if not slow:
        return
    for item in items:
        # item.nodeid is repo-relative like "tests/test_x.py::test_y[p]"
        if item.nodeid in slow:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def assets():
    from ray_tracer_2_tpu.assets.manager import AssetManager
    return AssetManager()


def require_asset(assets, rel_path):
    from ray_tracer_2_tpu.assets.manager import AssetNotFound
    try:
        return assets.resolve(rel_path)
    except AssetNotFound:
        pytest.skip(f"asset {rel_path} not available")


_EXIT_STATUS = [0]


def pytest_sessionfinish(session, exitstatus):
    _EXIT_STATUS[0] = int(exitstatus)


def pytest_unconfigure(config):
    """Skip interpreter teardown: with many suites in one process the CPU
    PJRT client's destructor intermittently aborts at exit ("FATAL:
    exception not rethrown" from a cancelled C++ thread) AFTER all tests
    have passed and the summary printed — which would turn a green run
    into exit 134. Everything that matters (results, summary, exit status)
    is final by unconfigure time; hard-exit with pytest's own status
    instead of letting the plugin teardown race."""
    import sys as _sys

    _sys.stdout.flush()
    _sys.stderr.flush()
    os._exit(_EXIT_STATUS[0])
