"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding tests use these virtual devices; the driver separately
dry-runs the multichip path (see __graft_entry__.py).
"""

import os

# The session environment pre-sets JAX_PLATFORMS=axon (the real TPU tunnel)
# and something at interpreter startup pins jax_platforms="axon,cpu",
# ignoring the env var — so force the config directly after import.
os.environ["JAX_PLATFORMS"] = "cpu"
# tests must not share the persistent compilation cache with TPU/serving
# runs: XLA:CPU AOT artifacts compiled under different machine-feature
# flags load with "could lead to SIGILL" warnings (api.preload_models
# enables the cache by default; empty disables it)
os.environ["VALLEX_COMPILE_CACHE"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
