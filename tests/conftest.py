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
