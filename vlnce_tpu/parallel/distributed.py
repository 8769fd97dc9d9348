"""Multi-host initialization (DD-PPO's SLURM plumbing, TPU-shaped).

The reference joins an NCCL process group from SLURM env vars
(init_distrib_slurm, reference ddppo_waypoint_trainer.py:310). On TPU pods
the analog is jax.distributed: one process per host, chips per host form the
local devices, and the global mesh spans all hosts over ICI/DCN. The
shard_map train steps in vlnce_tpu/parallel and vlnce_tpu/rl/ppo.py work
unchanged on a multi-host mesh — XLA partitions the collectives.
"""

from __future__ import annotations

import os
from typing import Optional

from vlnce_tpu.utils.logging import logger


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from explicit args, SLURM, or TPU-pod env.

    Returns True when a multi-process runtime was initialized. Safe to call
    on single-host runs (no-op)."""
    import jax

    if coordinator_address is None:
        # SLURM convention (reference init_distrib_slurm analog)
        if "SLURM_JOB_NODELIST" in os.environ and "SLURM_PROCID" in os.environ:
            main = os.environ["SLURM_JOB_NODELIST"].split(",")[0].replace("[", "").split("-")[0]
            coordinator_address = f"{main}:8476"
            num_processes = int(os.environ.get("SLURM_NTASKS", 1))
            process_id = int(os.environ["SLURM_PROCID"])
        elif "COORDINATOR_ADDRESS" in os.environ:
            coordinator_address = os.environ["COORDINATOR_ADDRESS"]
            num_processes = int(os.environ.get("NUM_PROCESSES", 1))
            process_id = int(os.environ.get("PROCESS_ID", 0))
        else:
            return False  # single host; jax.devices() already spans local chips

    if num_processes in (None, 1):
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        f"jax.distributed initialized: process {process_id}/{num_processes} "
        f"({jax.local_device_count()} local of {jax.device_count()} global devices)"
    )
    return True


def world_rank() -> int:
    import jax

    return jax.process_index()


def world_size() -> int:
    import jax

    return jax.process_count()


def rank_slice(items, rank=None, nproc=None) -> list:
    """Per-rank strided data shard with wrap-padding so EVERY rank gets the
    same count (torch DistributedSampler semantics, reference
    ddppo_waypoint_trainer.py rank topology): unequal shards would give
    ranks different batch counts and deadlock the first collective the
    shorter rank never joins. Single-process: identity. Wrapped duplicates
    appear only when len(items) % nproc != 0."""
    import jax

    items = list(items)
    if nproc is None:
        nproc = jax.process_count()
    if nproc <= 1 or not items:
        return items
    if rank is None:
        rank = jax.process_index()
    per = -(-len(items) // nproc)
    return [items[(rank + i * nproc) % len(items)] for i in range(per)]
