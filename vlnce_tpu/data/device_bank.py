"""Device-resident trajectory bank: collected DAgger features stay in HBM
and feed the jitted IL update directly.

The store-backed DAgger loop pays the wire twice per trajectory: collected
frozen-encoder features cross device->host into the trajectory store, then
the train loop re-uploads them (the reference does the same through LMDB,
dagger_trainer.py:341-372 then 539-567 — unavoidable there, since collection
and training run on different devices). On TPU both halves are the same
chip, so the bank keeps every collected step resident as ragged rows

    data[k]   : [S_pad, F]  per-step feature rows (time-flattened, f16
                storage dtype; padding rows hold the obs fill value 1.0 to
                match host collate semantics, data/collate.py:65)
    prev/oracle: [S_pad]    int32 action rows
    instruction: [E_pad, L] per-episode (constant over an episode)

with host-side (offsets, lengths). Batches are assembled ON DEVICE by one
module-level jitted gather per (T_bucket, N) shape, emitting exactly the
collate_episodes payload (obs [T*N, ...], prev [T*N,1], masks [T*N,1],
corrected [T,N], weights [T,N]) — so the production train step and its
sharded shard_map variant consume bank batches unchanged, and batch
composition comes from the SAME iterate_episode_keys stream as the store
iterator (loss parity by construction).

The trajectory store becomes an optional archival sink off the critical
path (write_to_store).
"""

from __future__ import annotations

import random
from functools import partial
from typing import Dict, Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vlnce_tpu.data.collate import LENGTH_QUANTUM, iterate_episode_keys


# banks round their row/episode counts up to these quanta so the gather jit
# compiles once per (T_bucket, N) and is REUSED across DAgger iterations and
# bank rebuilds (distinct shapes would otherwise retrace every iteration —
# 13s per retrace on a remote-attached chip, PERFORMANCE.md)
ROW_QUANTUM = 2048
EPISODE_QUANTUM = 64


def _gather_core(
    data, prev, oracle, instruction, offsets, lengths, trash, idx, coef,
    *, T_b: int, N: int, feat_shapes: tuple, instr_uuid: str,
    time_major: bool = False,
):
    """One training batch from bank rows: the exact collate_episodes payload
    (obs [T*N, ...], prev [T*N,1], masks [T*N,1], corrected [T,N],
    weights [T,N]) — or, with time_major, the train step's native layout
    (obs [T,N,...], prev/masks [T,N]; the reshape is free inside the jit,
    while the flat payload costs the consumer one eager reshape dispatch
    per leaf on a remote-attached chip). Plain traceable function: called
    by the module-level _gather_impl jit AND inside the epoch-scan body
    (build_epoch_scan), where one lax.scan fuses gather+update per batch."""
    shapes = dict(feat_shapes)
    off = jnp.take(offsets, idx)
    ln = jnp.take(lengths, idx)
    t = jnp.arange(T_b, dtype=jnp.int32)[:, None]
    valid = t < ln[None, :]
    row = jnp.where(valid, off[None, :] + t, trash)
    flat = row.reshape(-1)
    lead = (T_b, N) if time_major else (T_b * N,)
    obs = {}
    for k, v in data.items():
        g = jnp.take(v, flat, axis=0)
        if g.dtype == jnp.float16:
            g = g.astype(jnp.float32)  # f16 was only the storage dtype
        obs[k] = g.reshape(lead + shapes[k])
    corrected = jnp.take(oracle, flat).reshape(T_b, N)
    prev_b = jnp.take(prev, flat).reshape(T_b, N)
    # inflection weights on device (data/collate.py:30-37 semantics: coef at
    # t=0 and wherever the oracle action changes, 0 on padding)
    change = jnp.concatenate(
        [jnp.ones((1, N), bool), corrected[1:] != corrected[:-1]], axis=0
    )
    weights = jnp.where(change, coef, 1.0) * valid.astype(jnp.float32)
    masks = jnp.ones((T_b, N), jnp.float32).at[0].set(0.0)
    instr = jnp.broadcast_to(
        jnp.take(instruction, idx, axis=0)[None],
        (T_b, N) + instruction.shape[1:],
    )
    obs[instr_uuid] = instr.reshape(lead + instruction.shape[1:])
    if time_major:
        return obs, prev_b, masks, corrected, weights
    return (
        obs,
        prev_b.reshape(-1, 1),
        masks.reshape(-1, 1),
        corrected,
        weights,
    )


# the per-batch dispatch path: a single module-level jit whose cache keys on
# shapes, never on bank identity, so rebuilt banks reuse compiled gathers
_gather_impl = partial(
    jax.jit, static_argnames=("T_b", "N", "feat_shapes", "instr_uuid", "time_major")
)(_gather_core)


def build_epoch_scan(module, optimizer, num_layers: int, hidden: int, mesh,
                     T_b: int, N: int, feat_shapes: tuple, instr_uuid: str):
    """A whole RUN of training batches as ONE device program
    (TPU.RESIDENT_EPOCH_SCAN): lax.scan over the [K, N] episode-index
    matrix, each step gathering its batch from the resident bank and
    applying the IL update in place — zero host dispatches between batches
    (the per-batch path pays gather + train dispatch round trips each, the
    dominant cost on a remote-attached chip once the data is resident).
    Losses come back as [K] arrays, read once per run.

    The update math is the production step's (_make_loss_and_grads — the
    same shard_map/psum closure when a mesh is active), so per-batch and
    fused-epoch training produce the same parameter trajectory; only
    dispatch granularity changes. jit keys on (bank shapes, K), so runs
    re-use compiles across DAgger iterations until the bank grows past a
    ROW_QUANTUM boundary."""
    import optax

    from vlnce_tpu.parallel.il_step import _make_loss_and_grads

    loss_and_grads = _make_loss_and_grads(module, num_layers, hidden, mesh)

    def epoch(params, optim_state, data, prev, oracle, instruction,
              offsets, lengths, trash, idxs, coef):
        def body(carry, idx):
            params, optim_state = carry
            obs, prev_b, masks, corrected, weights = _gather_core(
                data, prev, oracle, instruction, offsets, lengths, trash,
                idx, coef, T_b=T_b, N=N, feat_shapes=feat_shapes,
                instr_uuid=instr_uuid, time_major=True,
            )
            grads, loss, action_loss, aux_loss = loss_and_grads(
                params, obs, prev_b, masks, corrected, weights
            )
            updates, optim_state = optimizer.update(grads, optim_state, params)
            params = optax.apply_updates(params, updates)
            return (params, optim_state), (loss, action_loss, aux_loss)

        (params, optim_state), losses = jax.lax.scan(
            body, (params, optim_state), idxs
        )
        return params, optim_state, losses

    # the fused epoch psums over the mesh like every other production
    # cross-process step, and is typically the LONGEST compile of all — so
    # it needs the same compile->barrier->dispatch alignment (multi-process
    # only; single-process returns the jit unchanged)
    from vlnce_tpu.parallel.distributed import align_collective_step

    return align_collective_step(
        jax.jit(epoch, donate_argnums=(0, 1)), f"epoch_scan_T{T_b}n{N}"
    )


def run_fused_epoch(params, optim_state, riter: "ResidentBatchIterator",
                    module, optimizer, num_layers: int, hidden: int, mesh,
                    cache: Dict[tuple, object]):
    """Execute one training epoch through build_epoch_scan programs — THE
    fused-epoch runner, shared by DaggerTrainer._run_fused_epoch and
    bench.py so the benchmark times exactly the production code path.
    `cache` maps (T_b, N, K) -> compiled epoch program (caller-owned, so
    its lifetime follows the trainer/bench run). Returns (params,
    optim_state, [(loss, action_loss, aux_loss)] per batch) with ONE
    readback per run."""
    bank = riter.bank
    out = []
    for T_b, idxs in riter.epoch_runs():
        K, N = idxs.shape
        key = (T_b, N, K)
        fn = cache.get(key)
        if fn is None:
            fn = build_epoch_scan(
                module, optimizer, num_layers, hidden, mesh, T_b, N,
                feat_shapes=tuple(sorted(
                    (k, tuple(v)) for k, v in bank.feat_shapes.items()
                )),
                instr_uuid=bank.instr_uuid,
            )
            cache[key] = fn
        params, optim_state, losses = fn(
            params, optim_state, *bank.epoch_scan_args(idxs, riter.coef)
        )
        loss, action_loss, aux_loss = jax.device_get(losses)
        out.extend(zip(
            np.asarray(loss).tolist(),
            np.asarray(action_loss).tolist(),
            np.asarray(aux_loss).tolist(),
        ))
    return params, optim_state, out


def _pow2_chunks(n: int):
    """Split a run length into descending power-of-2 chunk sizes (13 ->
    8, 4, 1): the epoch jit compiles once per (T_b, N, K), and power-of-2 Ks
    bound the compile cache at log2(run) entries with zero wasted compute
    (padding the scan would spend real FLOPs on dummy updates)."""
    sizes = []
    while n > 0:
        k = 1 << (n.bit_length() - 1)
        sizes.append(k)
        n -= k
    return sizes


@partial(jax.jit, static_argnames=("pad_n",))
def _assemble_rows(row_chunks, prev_chunks, oracle_chunks, *, pad_n: int):
    """Concatenate per-chunk row blocks + the padding tail in ONE dispatch.

    Eager per-chunk jnp.concatenate/jnp.ones calls each pay a full dispatch
    round trip on a remote-attached chip (~0.3-2s apiece — the same rule
    that mandates one-device_put uploads); fusing assembly into a single
    jitted call keeps bank construction off the wire. jit's own cache keys
    on the chunk-shape tree, so repeated DAgger iterations reuse the
    compiled program."""
    first = row_chunks[0]
    data = {
        k: jnp.concatenate(
            [c[k] for c in row_chunks]
            + [jnp.ones((pad_n,) + first[k].shape[1:], first[k].dtype)],
            axis=0,
        )
        for k in first
    }
    prev = jnp.concatenate(
        list(prev_chunks) + [jnp.zeros((pad_n,), jnp.int32)], axis=0
    )
    oracle = jnp.concatenate(
        list(oracle_chunks) + [jnp.zeros((pad_n,), jnp.int32)], axis=0
    )
    return data, prev, oracle


def _round_up(n: int, quantum: int) -> int:
    return -(-n // quantum) * quantum


def _put(tree, mesh):
    """device_put a host pytree: plain (uncommitted) without a mesh, else
    mesh-REPLICATED — bank arrays must share one device set with the sharded
    collection/pack outputs they join in the gather jit (mixing placements
    is an error in JAX, not a reshard)."""
    if mesh is None:
        return jax.device_put(tree)
    from vlnce_tpu.parallel.mesh import replicated

    repl = replicated(mesh)
    return jax.device_put(tree, jax.tree_util.tree_map(lambda _: repl, tree))


def _pad_host(arr: np.ndarray, target: int, fill) -> np.ndarray:
    pad = [(0, target - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=fill)


class DeviceTrajectoryBank:
    """Ragged per-step rows in HBM + host-side episode index.

    Row arrays arrive already padded (interleaved chunk-tail padding is fine
    — offsets are absolute); `trash_index` names any padding row holding the
    obs fill value 1.0. Instruction/offsets/lengths are kept un-padded on
    the host and padded to EPISODE_QUANTUM on device."""

    def __init__(
        self,
        data: Dict[str, jnp.ndarray],
        prev: jnp.ndarray,
        oracle: jnp.ndarray,
        instr_host: np.ndarray,
        offsets: np.ndarray,
        lengths: np.ndarray,
        feat_shapes: Dict[str, tuple],
        trash_index: int,
        instr_uuid: str = "instruction",
        mesh=None,
    ):
        self.data = data
        self.prev = prev
        self.oracle = oracle
        self.mesh = mesh
        self._instr_host = np.asarray(instr_host)
        self.offsets = np.asarray(offsets, np.int64)
        self.lengths = np.asarray(lengths, np.int64)
        self.feat_shapes = dict(feat_shapes)
        self.trash_index = int(trash_index)
        self.instr_uuid = instr_uuid
        E_pad = _round_up(max(len(self.offsets), 1), EPISODE_QUANTUM)
        self.instruction, self._offsets_d, self._lengths_d = _put((
            _pad_host(self._instr_host, E_pad, 0),
            _pad_host(self.offsets.astype(np.int32), E_pad, 0),
            _pad_host(self.lengths.astype(np.int32), E_pad, 0),
        ), mesh)

    # ------------------------------------------------------------- properties
    def __len__(self) -> int:
        return int(self.offsets.shape[0])

    @property
    def num_steps(self) -> int:
        return int(self.lengths.sum())

    def nbytes(self) -> int:
        total = 0
        for v in self.data.values():
            total += v.size * v.dtype.itemsize
        for v in (self.prev, self.oracle, self.instruction):
            total += v.size * v.dtype.itemsize
        return int(total)

    # ------------------------------------------------------------ constructors
    @classmethod
    def from_rows(
        cls,
        row_chunks: List[Dict[str, jnp.ndarray]],
        prev_chunks: List[jnp.ndarray],
        oracle_chunks: List[jnp.ndarray],
        instr_chunks: List[np.ndarray],
        lengths: List[int],
        feat_shapes: Dict[str, tuple],
        instr_uuid: str = "instruction",
        mesh=None,
    ) -> "DeviceTrajectoryBank":
        """Assemble from per-chunk device row blocks (episode-major rows,
        padding rows allowed at each chunk's tail — offsets skip them).
        With `mesh`, the chunks arrive mesh-replicated (sharded collection's
        pack emits them that way) and the bank stays on the mesh."""
        keys = list(row_chunks[0].keys())
        n_rows = sum(int(c[keys[0]].shape[0]) for c in row_chunks)
        target = _round_up(n_rows + 1, ROW_QUANTUM)  # >=1 padding row (trash)
        pad_n = target - n_rows
        data, prev, oracle = _assemble_rows(
            tuple(row_chunks), tuple(prev_chunks), tuple(oracle_chunks),
            pad_n=pad_n,
        )
        # chunk tails may carry bucket-padding rows: offsets are cumulative
        # over the CHUNK row counts, with episode rows packed at each front
        offsets, lengths_arr = [], np.asarray(lengths, np.int64)
        base = 0
        li = 0
        for ci, chunk in enumerate(row_chunks):
            n_chunk = int(chunk[keys[0]].shape[0])
            n_eps = len(instr_chunks[ci])
            cursor = base
            for _ in range(n_eps):
                offsets.append(cursor)
                cursor += int(lengths_arr[li])
                li += 1
            base += n_chunk
        instr_host = np.concatenate(instr_chunks, axis=0)
        return cls(
            data, prev, oracle, instr_host,
            np.asarray(offsets, np.int64), lengths_arr, feat_shapes,
            trash_index=n_rows, instr_uuid=instr_uuid, mesh=mesh,
        )

    @classmethod
    def from_store(cls, reader, instr_uuid: str = "instruction",
                   mesh=None, indices=None) -> "DeviceTrajectoryBank":
        """Upload a whole trajectory store once (preload_lmdb_features with
        the resident trainer): one device_put for all rows (mesh-replicated
        when a data mesh is active). `indices` selects an episode subset —
        multi-process trainers pass their rank slice so each process banks
        only its shard."""
        host_rows: Dict[str, List[np.ndarray]] = {}
        prev_rows, oracle_rows, instrs, lengths = [], [], [], []
        feat_shapes: Dict[str, tuple] = {}
        for i in (range(len(reader)) if indices is None else indices):
            obs, prev, oracle = reader.get(i)
            T = len(prev)
            lengths.append(T)
            for k, v in obs.items():
                v = np.asarray(v)
                if k == instr_uuid:
                    instrs.append(v[0])
                    continue
                feat_shapes[k] = tuple(v.shape[1:])
                host_rows.setdefault(k, []).append(v.reshape(T, -1))
            prev_rows.append(np.asarray(prev, np.int32))
            oracle_rows.append(np.asarray(oracle, np.int32))
        n_rows = int(np.sum(lengths))
        target = _round_up(n_rows + 1, ROW_QUANTUM)
        pad_n = target - n_rows
        data_h = {
            k: np.concatenate(
                rows + [np.ones((pad_n,) + rows[0].shape[1:], rows[0].dtype)]
            )
            for k, rows in host_rows.items()
        }
        prev_h = np.concatenate(prev_rows + [np.zeros((pad_n,), np.int32)])
        oracle_h = np.concatenate(oracle_rows + [np.zeros((pad_n,), np.int32)])
        instr_h = np.stack(instrs)
        offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        data, prev, oracle = _put((data_h, prev_h, oracle_h), mesh)
        return cls(
            data, prev, oracle, instr_h, offsets,
            np.asarray(lengths), feat_shapes,
            trash_index=n_rows, instr_uuid=instr_uuid, mesh=mesh,
        )

    def extend(self, other: "DeviceTrajectoryBank") -> "DeviceTrajectoryBank":
        """Concatenate two banks (DAgger aggregates data across iterations).
        Row blocks stay padded (offsets are absolute), so the combined row
        count remains a ROW_QUANTUM multiple."""
        assert self.data.keys() == other.data.keys()
        s = int(self.prev.shape[0])  # my full (padded) row count
        data = {
            k: jnp.concatenate([self.data[k], other.data[k]], axis=0)
            for k in self.data
        }
        prev = jnp.concatenate([self.prev, other.prev], axis=0)
        oracle = jnp.concatenate([self.oracle, other.oracle], axis=0)
        instr_host = np.concatenate([self._instr_host, other._instr_host], axis=0)
        offsets = np.concatenate([self.offsets, other.offsets + s])
        lengths = np.concatenate([self.lengths, other.lengths])
        return DeviceTrajectoryBank(
            data, prev, oracle, instr_host, offsets, lengths,
            self.feat_shapes, trash_index=self.trash_index,
            instr_uuid=self.instr_uuid, mesh=self.mesh,
        )

    # ---------------------------------------------------------------- gather
    def gather_batch(self, episode_ids: List[int], coef: float,
                     length_quantum: int = LENGTH_QUANTUM,
                     time_major: bool = False) -> Tuple:
        """One training batch, assembled on device: the exact
        collate_episodes payload for the given episodes (time_major: the
        train step's [T, N, ...] layout instead, same values)."""
        N = len(episode_ids)
        T_b = int(self.lengths[np.asarray(episode_ids)].max())
        if length_quantum > 1:
            T_b = int(-(-T_b // length_quantum) * length_quantum)
        return _gather_impl(
            self.data, self.prev, self.oracle, self.instruction,
            self._offsets_d, self._lengths_d,
            np.int32(self.trash_index),
            np.asarray(episode_ids, np.int32),  # ships with the dispatch
            np.float32(coef),
            T_b=T_b, N=N,
            feat_shapes=tuple(sorted(
                (k, tuple(v)) for k, v in self.feat_shapes.items()
            )),
            instr_uuid=self.instr_uuid,
            time_major=time_major,
        )

    def epoch_scan_args(self, idxs: np.ndarray, coef: float) -> Tuple:
        """Positional device/host args for a build_epoch_scan program (after
        params/optim_state): bank arrays + the [K, N] index matrix + coef.
        The host leaves ship with the dispatch (no standalone uploads)."""
        return (
            self.data, self.prev, self.oracle, self.instruction,
            self._offsets_d, self._lengths_d, np.int32(self.trash_index),
            np.asarray(idxs, np.int32), np.float32(coef),
        )

    # --------------------------------------------------------------- archive
    def write_to_store(self, writer, fp16: bool = False,
                       commit_every: int = 500) -> int:
        """Archive the bank into a trajectory store (OFF the training
        critical path) in the exact schema the host collection loop writes
        (trainers/dagger_trainer.py flush_episode)."""
        data_h = jax.device_get(self.data)
        prev_h = np.asarray(jax.device_get(self.prev))
        oracle_h = np.asarray(jax.device_get(self.oracle))
        for e in range(len(self)):
            lo = int(self.offsets[e])
            T = int(self.lengths[e])
            obs: Dict[str, np.ndarray] = {
                self.instr_uuid: np.repeat(self._instr_host[e][None], T, axis=0)
            }
            for k, rows in data_h.items():
                arr = np.asarray(rows[lo : lo + T])
                if arr.dtype == np.float16 and not fp16:
                    arr = arr.astype(np.float32)
                obs[k] = arr.reshape((T,) + self.feat_shapes[k])
            writer.put([
                obs,
                prev_h[lo : lo + T].astype(np.int64),
                oracle_h[lo : lo + T].astype(np.int64),
            ])
            if (e + 1) % commit_every == 0:
                writer.commit()
        writer.commit()
        return len(self)


class ResidentBatchIterator:
    """Batches a DeviceTrajectoryBank with the SAME episode order as
    TrajectoryBatchIterator (shared iterate_episode_keys stream, shared rng
    lifetime across epochs), yielding device-resident collate payloads."""

    def __init__(
        self,
        bank: DeviceTrajectoryBank,
        batch_size: int,
        use_iw: bool = True,
        inflection_weight_coef: float = 3.2,
        seed: int = 0,
        length_quantum: int = LENGTH_QUANTUM,
        time_major: bool = False,
    ):
        self.bank = bank
        self.batch_size = batch_size
        self.preload_size = batch_size * 100
        self.coef = inflection_weight_coef if use_iw else 1.0
        self._rng = random.Random(seed)
        self.length_quantum = length_quantum
        self.time_major = time_major

    def __len__(self) -> int:
        return len(self.bank) // self.batch_size

    def _epoch_batches(self) -> Iterator[List[int]]:
        """One epoch of episode-id batches — the SINGLE source of batch
        composition for both the per-batch path (__iter__) and the fused
        epoch-scan plan (epoch_runs); both advance the same rng stream, so
        they see identical compositions. drop_last semantics, matching the
        store iterator."""
        batch: List[int] = []
        for k in iterate_episode_keys(
            len(self.bank), lambda i: int(self.bank.lengths[i]),
            self.batch_size, self._rng, self.preload_size,
        ):
            batch.append(k)
            if len(batch) == self.batch_size:
                yield batch
                batch = []

    def __iter__(self) -> Iterator[Tuple]:
        for batch in self._epoch_batches():
            yield self.bank.gather_batch(
                batch, self.coef, self.length_quantum,
                time_major=self.time_major,
            )

    def _batch_T(self, batch: List[int]) -> int:
        T_b = int(self.bank.lengths[np.asarray(batch)].max())
        if self.length_quantum > 1:
            T_b = int(-(-T_b // self.length_quantum) * self.length_quantum)
        return T_b

    def epoch_runs(self) -> Iterator[Tuple[int, np.ndarray]]:
        """The epoch's batch plan as (T_b, idx_matrix [K, N]) runs for the
        fused epoch scan: consecutive batches sharing a padded length
        bucket fuse into one scan (order preserved — no reordering vs the
        per-batch path), run lengths split into power-of-2 chunks
        (_pow2_chunks) to bound the compile cache."""
        plan = [(self._batch_T(b), b) for b in self._epoch_batches()]
        i = 0
        while i < len(plan):
            j = i
            while j < len(plan) and plan[j][0] == plan[i][0]:
                j += 1
            run = [b for _, b in plan[i:j]]
            lo = 0
            for k in _pow2_chunks(len(run)):
                yield plan[i][0], np.asarray(run[lo : lo + k], np.int32)
                lo += k
            i = j
