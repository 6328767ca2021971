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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_SCHEMES = "/root/reference/schemes"
