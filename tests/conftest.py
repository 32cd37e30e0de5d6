"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere, so this conftest is
the very first import of the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

import jax  # noqa: E402

# NOTE: the JAX_PLATFORMS env var is overridden by the TPU plugin in this
# environment; the config update is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402

REFERENCE_MESHES = "/root/reference/Mesh_files"


@pytest.fixture(scope="session")
def ref_meshdir():
    if not os.path.isdir(REFERENCE_MESHES):
        pytest.skip("reference mesh fixtures not available")
    return REFERENCE_MESHES
