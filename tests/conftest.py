"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-host/multi-chip logic is tested single-process the way SURVEY.md
§4 prescribes: `xla_force_host_platform_device_count=8` + CPU platform,
so sharding/collective paths execute in CI without a pod. Must run
before jax initializes.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Force CPU: the session env pins JAX_PLATFORMS to the TPU tunnel, which
# must not be claimed (or depended on) by unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pytest plugins can import jax before this conftest runs, in which case
# jax.config already captured the session's JAX_PLATFORMS (the TPU
# tunnel) and the env var above is ignored — tests would then silently
# run on one real TPU chip with MXU default (bf16) matmul precision and
# fail tight fp32 tolerances. Update the live config too (a no-op if the
# env var was picked up; an error only if a backend was already
# initialized, which we want loudly).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
