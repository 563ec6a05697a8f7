"""Test configuration: run JAX on CPU with 8 virtual devices so multi-chip
sharding logic is exercised without a TPU pod (SURVEY.md §4)."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# This image's sitecustomize forces jax_platforms="axon,cpu" (the TPU
# tunnel), overriding the env var — override it back at the config level
# BEFORE any backend initializes, else "CPU" tests silently run on the
# remote TPU (slow, and fp32 matmuls take bf16 passes breaking parity).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
