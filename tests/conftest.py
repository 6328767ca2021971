"""Test config: run JAX on a virtual 8-device CPU mesh so sharding
tests exercise real multi-device paths without TPU hardware."""
import os

# hard override: the image's sitecustomize registers the axon TPU
# backend and pins jax.config jax_platforms='axon,cpu' at interpreter
# start, which overrides the env var — so set BOTH the flags and the
# config (after import, before first backend use).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_SCHEMES = "/root/reference/schemes"


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules. Two independent
    single-process full-suite runs segfaulted inside XLA
    backend_compile at ~60% (round-4 VERDICT): each module compiles
    dozens of large interpret-mode programs and the cumulative
    executable footprint in one process crossed some CPU-backend
    cliff. Modules don't share program shapes, so clearing at module
    teardown costs nothing and keeps the single-process invocation
    viable; scripts/run_tests.py (one process per file) remains the
    documented full-suite entrypoint."""
    yield
    jax.clear_caches()
