"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths (shard_map/pjit over a Mesh) are validated on
virtual CPU devices, the TPU analog of testing DD-PPO without a cluster
(SURVEY.md §4).

The axon sitecustomize registers the TPU backend and sets
jax_platforms="axon,cpu" programmatically, overriding the JAX_PLATFORMS env
var — so the CPU override must go through jax.config after import.

Test tiers: the default run (`pytest -q`) executes the fast tier; the
compile-heavy trainer/sharding integration tests are marked `slow`
(module-level pytestmark) and run with `pytest -m ""` or `-m slow`.
A persistent XLA compilation cache under tests/.jax_cache makes repeat
full-tier runs cheap (the first run pays the compiles).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# the XLA:CPU AOT cache loader logs a spurious machine-feature-mismatch error
# (prefer-no-scatter/gather hints) on every cache hit; silence C++ logging
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# Build the native shm transport lib before collection (the shm tests use a
# module-level skipif evaluated at import), so they run wherever a C++
# toolchain exists instead of silently skipping. Cached: make is a no-op when
# libobsring.so is newer than obs_ring.cpp.
import shutil  # noqa: E402
import subprocess  # noqa: E402

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "vlnce_tpu", "native")
if shutil.which("g++") and os.path.isdir(_NATIVE_DIR):
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True, timeout=120
        )
    except (subprocess.SubprocessError, OSError) as exc:  # pragma: no cover
        import warnings

        warnings.warn(f"native libobsring.so build failed ({exc}); shm tests will skip")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# restore the committed seed entries (fingerprint-guarded — see
# vlnce_tpu/utils/cache_seed.py) so the dryrun-family programs the slow-tier
# 2-process tests recompile are warm even on a fresh clone
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vlnce_tpu.utils.cache_seed import seed_cache  # noqa: E402

seed_cache(_CACHE_DIR)
