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


# ------------------------------------------------------- dispatch alignment
# Monotonic barrier-id counter: coordination-service barrier ids are
# single-use, and SPMD ranks reach sync points in identical order, so a
# per-process counter yields matching ids on every rank. A sequence mismatch
# (a real SPMD divergence bug) surfaces as a barrier timeout naming both
# sides' tags rather than a silent wrong pairing.
_BARRIER_SEQ = 0


def sync_ranks(tag: str, timeout_s: float = 600.0) -> None:
    """Align all processes at a named barrier via the JAX coordination
    service (pure gRPC — involves no device collective, so it cannot itself
    hit the deadline it exists to protect).

    Why this exists: XLA:CPU's cross-process (Gloo) collectives give every
    new communicator context ~30 s from the FIRST rank reaching it for the
    other ranks to arrive at the matching execution. A collective program's
    first dispatch follows its per-rank jit compile, and compile wall time
    can skew ranks by minutes on busy hosts — so the first collective of a
    freshly-compiled program can time out spuriously. Production steps
    therefore compile FIRST, barrier HERE, then dispatch (see
    align_collective_step). On TPU pods the same call bounds startup skew
    across hosts for free. Single-process: no-op.

    Reference analog: the implicit rank sync of torch.distributed's first
    DDP bucket allreduce (reference ddppo_waypoint_trainer.py:310-370)."""
    import jax

    if jax.process_count() <= 1:
        return
    global _BARRIER_SEQ
    _BARRIER_SEQ += 1
    try:
        # private API (jax<=0.9 layout): the coordination-service client's
        # barrier is pure gRPC, which is exactly what this function needs.
        # Guarded because jax._src carries no stability guarantee.
        from jax._src import distributed as _distributed

        client = _distributed.global_state.client
        assert client is not None, "multi-process JAX without a coordination client"
        client.wait_at_barrier(f"vlnce:{_BARRIER_SEQ}:{tag}", int(timeout_s * 1000))
    except (ImportError, AttributeError):
        # public fallback: sync_global_devices barriers via a tiny device
        # collective. Weaker (the collective itself is subject to the
        # communicator deadline this barrier exists to protect), but its
        # trivial program compiles in milliseconds on every rank, so the
        # skew it sees is gRPC-scale, not big-program-compile-scale.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"vlnce:{_BARRIER_SEQ}:{tag}")


# --------------------------------------------------------- compile leader
# Opt-in (VLNCE_COMPILE_LEADER=1, set by launchers that KNOW all ranks share
# one host and one persistent XLA compile cache — e.g. mp_smoke's localhost
# rank pairs): rank 0 compiles each aligned step alone at full speed while
# followers wait on a coordination-service key, then compile from the
# persistent cache rank 0 just wrote. On a shared host this halves the
# dominant cold-start cost (N ranks otherwise compile the SAME program
# concurrently, each at 1/N speed). On real pods (no shared cache) leave it
# off: serializing genuinely-parallel per-host compiles would slow startup.


def _leader_mode() -> bool:
    return os.environ.get("VLNCE_COMPILE_LEADER") == "1"


def _coord_client():
    """The coordination-service client (private API, guarded — same access
    pattern as sync_ranks' primary path). None when unavailable."""
    try:
        from jax._src import distributed as _distributed

        return _distributed.global_state.client
    except (ImportError, AttributeError):
        return None


def _kv_set(key: str) -> None:
    client = _coord_client()
    if client is None:
        return
    try:
        client.key_value_set(key, "1")
    except Exception:  # followers degrade to the plain compile race
        pass


def _kv_wait(key: str, timeout_s: float = 900.0) -> None:
    client = _coord_client()
    if client is None:
        return
    try:
        client.blocking_key_value_get(key, int(timeout_s * 1000))
    except Exception:  # timeout/unavailable: compile anyway (correct, slower)
        pass


class _AlignedStep:
    """Wraps a jitted collective step so each new shape signature is
    AOT-compiled on every rank and then barrier-aligned (sync_ranks) BEFORE
    its first dispatch — collapsing compile-time skew to gRPC latency so the
    Gloo/ICI communicator handshake at execution start always sees all ranks
    within its deadline. Subsequent calls hit the compiled executable
    directly. Donation and shardings are preserved (jit's lower/compile).
    With VLNCE_COMPILE_LEADER=1, followers additionally wait for rank 0's
    compile to land in the shared persistent cache before compiling (see
    _leader_mode above); degrades to the plain race when the coordination
    client is unavailable."""

    def __init__(self, jitted, tag: str):
        self._fn = jitted
        self._tag = tag
        self._compiled = {}

    @staticmethod
    def _signature(args):
        import jax

        def leaf_sig(x):
            if hasattr(x, "shape"):
                return (tuple(x.shape), str(getattr(x, "dtype", "?")))
            if isinstance(x, (bool, int, float, complex)):
                # jit avals: python scalars trace by weak dtype, not value
                return ("py", type(x).__name__)
            return repr(x)

        # the treedef is part of the key: two calls with identical leaf
        # shapes but different dict keys / nesting are different programs
        leaves, treedef = jax.tree_util.tree_flatten(args)
        return (str(treedef), tuple(leaf_sig(x) for x in leaves))

    def __call__(self, *args):
        import jax

        key = self._signature(args)
        compiled = self._compiled.get(key)
        if compiled is None:
            seq = len(self._compiled) + 1
            kv_key = f"vlnce_compiled:{self._tag}:{seq}"
            leader = _leader_mode() and jax.process_count() > 1
            if leader and jax.process_index() > 0:
                _kv_wait(kv_key)
            compiled = self._fn.lower(*args).compile()
            self._compiled[key] = compiled
            if leader and jax.process_index() == 0:
                _kv_set(kv_key)
            sync_ranks(f"{self._tag}/{len(self._compiled)}")
        return compiled(*args)


def align_collective_step(jitted, tag: str):
    """Production wrapper for jitted steps whose execution opens a
    cross-PROCESS collective channel. Multi-process: returns an _AlignedStep
    (compile -> barrier -> dispatch). Single-process: returns the jitted
    function unchanged — zero overhead and identical single-chip behavior."""
    import jax

    if jax.process_count() <= 1:
        return jitted
    return _AlignedStep(jitted, tag)
