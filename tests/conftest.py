"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding paths (shard_map/pjit over a Mesh) are validated on
virtual CPU devices, the TPU analog of testing DD-PPO without a cluster
(SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
