"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests use XLA's
host-platform device virtualization (the standard JAX single-host
substitute for a TPU pod slice)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# persistent compilation cache: the traversal while-loops are expensive to
# compile; cache across test runs
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_webgpu_raytracing_tpu"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The TPU tunnel plugin force-selects its own platform at import time,
# overriding JAX_PLATFORMS; config.update after import wins.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_assets():
    """Paths to the bundled scene assets (pure data, read-only)."""
    base = "/root/reference/assets"
    obj = os.path.join(base, "raytraced-scene.obj")
    mtl = os.path.join(base, "raytraced-scene.mtl")
    if not (os.path.exists(obj) and os.path.exists(mtl)):
        pytest.skip("reference assets not available")
    return obj, mtl


@pytest.fixture(scope="session")
def cornell_scene(reference_assets):
    from webgpu_raytracing_tpu.models import load_scene

    obj, mtl = reference_assets
    return load_scene(obj, mtl)


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)
