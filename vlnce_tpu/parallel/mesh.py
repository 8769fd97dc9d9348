"""Device mesh construction and sharding helpers.

The scaling story (SURVEY.md §2.5, §5.8): the reference's only model-level
parallelism is decentralized data-parallel DD-PPO over NCCL ranks. Here that
becomes ONE data-parallel mesh axis over TPU chips with XLA collectives over
ICI; a MODEL axis is declared for future growth but stays size 1 for these
model families. Gradient allreduce = lax.pmean inside shard_map — no process
groups, no NCCL.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vlnce_tpu.utils.logging import logger

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_devices: Optional[int] = None, model_parallel: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    assert n % model_parallel == 0, f"{n} devices not divisible by model={model_parallel}"
    grid = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def mesh_from_config(config) -> Mesh:
    data = config.TPU.MESH.DATA
    model = max(1, int(config.TPU.MESH.MODEL))
    num = None if data in (-1, None) else int(data) * model
    return make_mesh(num_devices=num, model_parallel=model)


def resolve_training_mesh(config) -> Optional[Mesh]:
    """Mesh for data-parallel training, per TPU.MESH.DATA:

    - 0 or 1: single-device (returns None)
    - -1 (auto): all visible devices; None when only one is visible
    - k > 1: exactly k data shards — RAISES when that many devices are not
      available. A config that asks for multi-chip must not silently run
      single-chip.
    """
    data = int(config.TPU.MESH.DATA)
    model = max(1, int(config.TPU.MESH.MODEL))
    n_avail = len(jax.devices())
    if data in (0, 1):
        return None
    if data == -1:
        n = (n_avail // model) * model
        if n // model <= 1:
            return None
        return make_mesh(num_devices=n, model_parallel=model)
    need = data * model
    if need > n_avail:
        raise RuntimeError(
            f"TPU.MESH.DATA={data} (x MODEL={model}) requires {need} devices "
            f"but only {n_avail} are visible ({jax.devices()}); set "
            f"TPU.MESH.DATA=-1 for auto or 1 to force single-device"
        )
    return make_mesh(num_devices=need, model_parallel=model)


def shrink_mesh_for_batch(mesh: Optional[Mesh], batch_size: int,
                          tag: str = "env scan") -> Optional[Mesh]:
    """Largest data mesh whose width divides `batch_size`, or None.

    Env-sharded device scans (scan-eval, rollout collection, on-device
    DAgger) need the env axis to split evenly over the data axis; a mesh
    the batch doesn't divide is shrunk to the gcd (with a warning) rather
    than silently running replicated or erroring — matching scan-eval's
    round-2 behavior, now shared by every env-sharded path.

    Multi-process JAX always returns None: a collection scan feeds
    process-local host arrays, which cannot enter a jit whose in_shardings
    span non-addressable devices — each rank scans its own shard locally
    and the cross-process assembly happens at the train step
    (prepare_global_batch)."""
    if mesh is None or batch_size <= 0:
        return None
    if jax.process_count() > 1:
        return None
    n_data = mesh.shape[DATA_AXIS]
    if n_data <= 1:
        return None
    if batch_size % n_data == 0:
        return mesh
    g = math.gcd(batch_size, n_data)
    if g <= 1:
        return None
    logger.warning(
        f"{tag}: batch {batch_size} doesn't divide the {n_data}-way data "
        f"mesh; using a {g}-way mesh"
    )
    return make_mesh(num_devices=g)


def resident_mesh_for_batch(mesh: Optional[Mesh], batch_size: int,
                            tag: str = "resident pipeline") -> Optional[Mesh]:
    """All-or-nothing mesh gate for the RESIDENT pipelines (collection ->
    HBM bank/batch -> train step): every stage must share ONE device set
    (mixing placements is an error in JAX, not a reshard), so a shrunk
    sub-mesh is never acceptable — the env batch either divides the full
    training mesh or the scan falls back to single-device (the emitted
    arrays stay uncommitted and the sharded step reshards per batch).
    Multi-process JAX always falls back: each rank collects/renders its own
    shard locally (see shrink_mesh_for_batch)."""
    if mesh is None or batch_size <= 0:
        return None
    if jax.process_count() > 1:
        logger.info(
            f"{tag}: multi-process run — collecting per-process rank slices "
            f"locally; the sharded train step stitches global batches"
        )
        return None
    n_data = mesh.shape[DATA_AXIS]
    if n_data <= 1:
        return None
    if batch_size % n_data == 0:
        return mesh
    logger.warning(
        f"{tag}: batch {batch_size} doesn't divide the {n_data}-way data "
        f"mesh; running the scan single-device (training stays sharded). "
        f"Make the batch a multiple of the data width to shard it."
    )
    return None


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))
