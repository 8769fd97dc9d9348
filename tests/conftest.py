"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths (shard_map/pjit over a Mesh) are validated on
virtual CPU devices, the TPU analog of testing DD-PPO without a cluster
(SURVEY.md §4).

The axon sitecustomize registers the TPU backend and sets
jax_platforms="axon,cpu" programmatically, overriding the JAX_PLATFORMS env
var — so the CPU override must go through jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
