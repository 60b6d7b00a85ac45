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
