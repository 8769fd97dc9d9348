"""On-device DAgger collection: render + frozen-encoder features + policy
act + device expert + beta-mix + sim step as one `lax.scan` per segment.

The host collection loop (dagger_trainer.py:158-333) crosses the
host<->device boundary every step and is bounded by the simulator pool.
With the device-resident grid world and the device expert
(envs/device_sim.py:expert_action — parity-tested against the host
ShortestPathSensor) the WHOLE DAgger collection loop runs on device.

Two consumers share the chunked scan driver:

- collect_episodes_on_device: cached encoder features (KBs/step) cross back
  to the host in the exact store schema the trainer's TrajectoryStoreWriter
  expects (reference dagger_trainer.py:248-467: feature caching via forward
  hooks, msgpack'd (obs, prev_actions, oracle_actions) episodes).
- collect_episodes_resident: nothing but done flags crosses back — collected
  rows are packed on device into a DeviceTrajectoryBank
  (data/device_bank.py) that feeds the jitted IL update directly; the
  trajectory store becomes an optional archival sink.

Enabled by `TPU.ON_DEVICE_DAGGER = True` (+ `TPU.DAGGER_RESIDENT` for the
bank path); requires GridWorldSim-v0 and a token-instruction task (the R2R
DAgger setting).

With `TPU.FEATURE_BANK_DIR` set, the per-step raycast is replaced by a
precomputed-feature-bank lookup (data/feature_bank.py) — the route by which
real MP3D scenes ride this loop once assets land, same as sharded scan-eval.
The looked-up frozen features are what gets recorded (the policy consumes
them through the encoders' precompute bypass), and the device expert is
unaffected (it steers off scene geometry, not observations): at beta=1 the
collected trajectories are identical to the render-driven collection
(tests/test_feature_bank.py).

Episode SELECTION note: this path collects the first `update_size`
episodes in dataset order, while the host env pool draws from per-process
scene-split iterators (envs/env_utils.py). Collection is per-episode
independent (fresh PRNG fold per chunk), so each episode's trajectory
distribution is identical either way; only the visited SUBSET differs, and
when update_size >= dataset size the two coincide. The beta-mix itself is
distribution-equivalent to the host loop's `rand < beta` select
(reference dagger_trainer.py:414-418) — verified statistically at beta=0.5
in tests/test_trainers.py::test_device_dagger_beta_mixing_statistics.
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vlnce_tpu.parallel.mesh import DATA_AXIS
from vlnce_tpu.envs.scene_import import (
    apply_scene_geometry as _apply_scene_geometry,
)
from vlnce_tpu.envs.device_sim import (
    SceneBatch,
    _pad_grid,
    build_scene_batch,
    camera_specs_from_config,
    expert_action,
    progress_batch,
    render_batch,
    step_batch,
)
from vlnce_tpu.envs.gridworld import get_scene
from vlnce_tpu.ops.obs_transforms import apply_obs_transforms_batch
from vlnce_tpu.trainers.scan_eval import _episode_batch_arrays
from vlnce_tpu.utils.logging import logger


# jitted segment cache: rebuilding the closure per collect() call would
# retrace (and re-lookup the XLA cache) every DAgger iteration — measured
# 13s per retrace on a remote chip. The cache lives ON the policy object
# (not a module-global keyed by id(policy): id() reuse after GC can alias a
# stale closure to a new policy) and is bounded FIFO per policy.
_CACHE_ATTR = "_device_dagger_segment_cache"
_CACHE_MAX = 8

# pack-jit cache (policy-independent data movement), bounded FIFO
_PACK_CACHE: Dict[tuple, object] = {}
_PACK_CACHE_MAX = 32
_PACK_ROW_QUANTUM = 256  # bucket packed-row counts to bound compile shapes


def _policy_cache(policy) -> Dict[tuple, tuple]:
    cache = getattr(policy, _CACHE_ATTR, None)
    if cache is None:
        cache = {}
        setattr(policy, _CACHE_ATTR, cache)
    return cache


def _expert_arrays(episodes) -> Tuple[np.ndarray, np.ndarray]:
    """Per-episode first-goal distance field + goal XZ — what the host
    ShortestPathSensor steers by (it passes episode.goals[0].position).
    Fields pad to the batch-max grid (+inf, matching build_scene_batch's
    blocked padding) so mixed-size imported scenes stack."""
    fields, goals = [], []
    for ep in episodes:
        scene = get_scene(ep.scene_id)
        g = np.asarray(ep.goals[0].position, np.float64)
        gi, gj = scene.world_to_cell(float(g[0]), float(g[-1]))
        fields.append(scene.distance_field((gi, gj)).astype(np.float32))
        goals.append([float(g[0]), float(g[-1])])
    n = max(f.shape[0] for f in fields)
    fields = [_pad_grid(f, n, np.inf) for f in fields]
    return np.stack(fields), np.asarray(goals, np.float32)


def _chunk_rollouts(
    policy, transforms, config, episodes: List, beta: float, rng,
    mesh=None,
) -> Iterator[Tuple[int, Dict[str, np.ndarray], List[Dict], np.ndarray, Dict[str, tuple]]]:
    """Run the beta-mixed device collection chunk by chunk.

    Yields (real, arrays, pieces, done_before, feat_shapes) per chunk of
    NUM_ENVIRONMENTS episodes: `pieces` is a list of DEVICE segment dicts
    ([seg_len, B, ...] leaves, f16 wire dtypes); `done_before` is the
    host [T_total, B] bool done-flag matrix (the only per-step data that
    crosses back here).

    With `mesh`, the segment jit shards the env axis over the data mesh
    (params replicated, every per-env leaf split) — the same pjit pattern as
    sharded scan-eval/rollout collection; emitted pieces come out env-sharded
    on axis 1. Episodes are independent, so collection throughput scales
    linearly with chips and the collected values are identical to the
    single-device run (sharding never changes JAX semantics)."""
    task_cfg = config.TASK_CONFIG
    _apply_scene_geometry(task_cfg.SIMULATOR)  # real-scene grids, if configured
    specs = camera_specs_from_config(task_cfg.SIMULATOR)
    T_max = int(task_cfg.ENVIRONMENT.MAX_EPISODE_STEPS)
    B = max(1, int(config.NUM_ENVIRONMENTS))
    forward_step = float(task_cfg.SIMULATOR.FORWARD_STEP_SIZE)
    turn_angle = math.radians(float(task_cfg.SIMULATOR.TURN_ANGLE))
    allow_sliding = bool(task_cfg.SIMULATOR.HABITAT_SIM_V0.ALLOW_SLIDING)
    goal_radius = float(task_cfg.TASK.SHORTEST_PATH_SENSOR.GOAL_RADIUS)
    store_f16 = bool(config.IL.DAGGER.lmdb_fp16)
    # the task's configured instruction sensor (RxR: "rxr_instruction" BERT
    # features) — the policy reads this key, so a hard-coded "instruction"
    # would KeyError on RxR models
    instr_uuid = str(config.MODEL.INSTRUCTION_ENCODER.sensor_uuid)

    # segment length: episodes finish in tens of steps; scanning the full
    # MAX_EPISODE_STEPS cap per chunk would compute (and read back) hundreds
    # of padded steps per env — the first cut of this path did exactly that
    # and was readback-bound at 16 steps/s on a remote-attached chip
    seg_len = max(1, min(int(getattr(config.TPU, "DAGGER_SEGMENT", 32)), T_max))

    # precomputed-feature-bank mode (TPU.FEATURE_BANK_DIR): real scenes on
    # the device collection loop — the per-step raycast is replaced by a
    # bank lookup (data/feature_bank.py), exactly as in sharded scan-eval;
    # the looked-up frozen features are also what the trajectory bank/store
    # records (the policy's precompute bypass consumes them directly)
    bank_dir = str(getattr(config.TPU, "FEATURE_BANK_DIR", "") or "")
    bank_max_dist = float(getattr(config.TPU, "FEATURE_BANK_MAX_DIST", 0.0) or 0.0)
    bank_shapes = None
    if bank_dir:
        from vlnce_tpu.data.feature_bank import check_bank_coverage, load_bank_shapes

        bank_shapes = load_bank_shapes(bank_dir, episodes[0])
        check_bank_coverage(bank_dir, episodes, bank_max_dist)

    cache_key = (
        tuple(specs), B, seg_len, T_max, store_f16,
        goal_radius, turn_angle, forward_step, allow_sliding,
        tuple(type(t).__name__ for t in transforms), instr_uuid,
        None if mesh is None else mesh.shape[DATA_AXIS],
        bank_shapes, bank_max_dist,
    )
    feat_shapes: Dict[str, tuple] = {}  # filled at trace time

    def segment(params, scenes: SceneBatch, expert_field, goal_xz, instruction, carry, rng_, beta_, bank=None):
        def body(c, t):
            pos, heading, rnn, prev_a, done, g = c
            if bank_shapes is not None:
                from vlnce_tpu.data.feature_bank import (
                    FeatureBankBatch, lookup_features,
                )

                obs = lookup_features(
                    FeatureBankBatch(*bank, *bank_shapes), pos, heading,
                    max_dist=bank_max_dist,
                )
            else:
                obs = render_batch(scenes, pos, heading, specs)
            obs[instr_uuid] = instruction
            obs["progress"] = progress_batch(scenes, pos)
            batch = apply_obs_transforms_batch(obs, transforms)
            mask = jnp.where(g == 0, 0.0, 1.0) * jnp.ones((B, 1), jnp.float32)
            rng_act, rng_mix = jax.random.split(jax.random.fold_in(rng_, g))
            action, rnn2, feats = policy._act_features_impl(
                params, batch, rnn, prev_a, mask, rng_act, False
            )
            if bank_shapes is not None:
                # the encoders consumed precomputed features (no sow); the
                # bank lookup itself IS the frozen-feature payload to record
                feats = {
                    k: batch[k] for k in ("rgb_features", "depth_features")
                    if k in batch
                }
            expert = jax.vmap(
                lambda o, f, g, p, h, og: expert_action(
                    o, f, g, p, h, goal_radius, turn_angle, origin=og
                )
            )(scenes.occupancy, expert_field, goal_xz, pos, heading, scenes.origin_xz)
            mix = jax.random.uniform(rng_mix, action.shape)
            mixed = jnp.where(mix < beta_, expert.reshape(action.shape), action)
            a = jnp.where(done, 0, mixed.reshape(-1).astype(jnp.int32))
            # features emitted flattened [B, F]: scan-stacking [B, C, 4, 4]
            # would tile-pad the trailing dims 64x (same trap as the RL
            # rollout's obs emit — PERFORMANCE.md); consumers reshape back
            emit = {
                "progress": obs["progress"],
                "prev_action": prev_a.reshape(-1),
                "oracle": expert.reshape(-1),
                "done_before": done,
            }
            for k in ("rgb_features", "depth_features"):
                v = feats.get(k)
                if v is not None:
                    feat_shapes[k] = tuple(v.shape[1:])
                    emit[k] = v.reshape(B, -1)
            new_done = done | (a == 0)
            pos2, heading2 = step_batch(
                scenes, pos, heading, a, forward_step, turn_angle, allow_sliding
            )
            pos2 = jnp.where(done[:, None], pos, pos2)
            heading2 = jnp.where(done, heading, heading2)
            return (
                (pos2, heading2, rnn2, mixed.reshape(-1, 1).astype(jnp.int32), new_done, g + 1),
                emit,
            )

        carry2, seq = jax.lax.scan(body, carry, jnp.arange(seg_len))
        # wire dtype: bf16-sourced features leave the scan as f16 — exact
        # for all in-range bf16 values (7 <= 10 mantissa bits; clamped
        # against the f16 max), half the bytes on the wire AND in the
        # resident bank
        out = {}
        for k, v in seq.items():
            if v.dtype == jnp.bfloat16:
                v = jnp.clip(v, -65504.0, 65504.0).astype(jnp.float16)
            elif store_f16 and v.dtype == jnp.float32:
                v = v.astype(jnp.float16)
            out[k] = v
        return carry2, out

    cache = _policy_cache(policy)
    if cache_key in cache:
        segment_jit, feat_shapes = cache[cache_key]
    elif mesh is None:
        segment_jit = jax.jit(segment)
        while len(cache) >= _CACHE_MAX:
            cache.pop(next(iter(cache)))
        cache[cache_key] = (segment_jit, feat_shapes)
    else:
        # env axis over the data mesh: params/rng/beta replicated, every
        # per-env tensor (scenes, expert field, goal, instruction, carry,
        # bank arrays) sharded on its B axis — identical to sharded
        # scan-eval (trainers/scan_eval.py) and the rollout collector
        repl = NamedSharding(mesh, P())
        env0 = NamedSharding(mesh, P(DATA_AXIS))
        scenes_s = SceneBatch(*(env0 for _ in SceneBatch._fields))
        carry_s = (env0, env0, env0, env0, env0, repl)  # g replicated
        shardings = (repl, scenes_s, env0, env0, env0, carry_s, repl, repl)
        if bank_shapes is not None:
            shardings = shardings + ((env0, env0, env0),)
        segment_jit = jax.jit(segment, in_shardings=shardings)
        while len(cache) >= _CACHE_MAX:
            cache.pop(next(iter(cache)))
        cache[cache_key] = (segment_jit, feat_shapes)

    for lo in range(0, len(episodes), B):
        chunk = episodes[lo : lo + B]
        real = len(chunk)
        chunk = chunk + [chunk[-1]] * (B - real)
        ef, gxz = _expert_arrays(chunk)
        arrays = _episode_batch_arrays(chunk, instr_uuid=instr_uuid, task_cfg=task_cfg)
        rng, chunk_rng = jax.random.split(rng)
        rnn0 = np.zeros(
            (B, policy.num_recurrent_layers, policy.hidden_size), np.float32
        )
        # ONE device_put for all per-chunk host arrays (round trips add up
        # on remote chips); build_scene_batch batches its own upload
        ef_d, gxz_d, instr_d, carry = jax.device_put((
            ef, gxz, arrays["instruction"],
            (
                arrays["pos"], arrays["heading"], rnn0,
                np.zeros((B, 1), np.int32), np.zeros((B,), bool), np.int32(0),
            ),
        ))
        scenes = build_scene_batch(chunk)
        seg_args = (policy.params, scenes, ef_d, gxz_d, instr_d)
        seg_extra = ()
        if bank_shapes is not None:
            from vlnce_tpu.data.feature_bank import load_bank_batch

            bank = load_bank_batch(bank_dir, chunk)
            if (bank.rgb_shape, bank.depth_shape) != bank_shapes:
                raise RuntimeError(
                    f"feature-bank shapes changed across chunks: "
                    f"{(bank.rgb_shape, bank.depth_shape)} vs {bank_shapes}"
                )
            seg_extra = ((bank.node_pos, bank.rgb, bank.depth),)
        # segments until every episode stopped (or the step cap)
        pieces: List[Dict] = []
        done_rows: List[np.ndarray] = []
        t = 0
        beta_np = np.float32(beta)  # numpy scalar: ships with the dispatch,
        # no standalone eager upload (a round trip per call on remote chips)
        while t < T_max:
            carry, seg = segment_jit(*seg_args, carry, chunk_rng, beta_np, *seg_extra)
            # ONE tiny readback per segment: per-step done flags + the
            # after-segment done state, bundled into a single device_get
            done_b4, done_after = jax.device_get((seg["done_before"], carry[4]))
            t += seg_len
            pieces.append(seg)
            done_rows.append(np.asarray(done_b4))
            if bool(done_after.all()):
                break
        done_before = np.concatenate(done_rows, axis=0)[:T_max]  # [T, B]
        yield real, arrays, pieces, done_before, feat_shapes


def _episode_lengths(done_before: np.ndarray, real: int, T_max: int) -> np.ndarray:
    """First done flag per env column = steps recorded for that episode.

    An env whose STOP lands on the LAST step of the final segment never gets
    a done flag into done_before (flags record done BEFORE the step, and the
    segment loop exits on the after-state) — its true length is exactly the
    number of recorded rows, NOT T_max; falling back to T_max would claim
    unrecorded (garbage) steps for the episode."""
    recorded = int(done_before.shape[0])
    lengths = np.empty((real,), np.int64)
    for b in range(real):
        ends = np.flatnonzero(done_before[:, b])
        T_ep = int(ends[0]) if len(ends) else min(recorded, T_max)
        lengths[b] = max(T_ep, 1)  # degenerate: started at goal, one STOP step
    return lengths


def collect_episodes_on_device(
    policy, transforms, config, episodes: List, beta: float, rng,
    progress_cb=None, mesh=None,
) -> List[Tuple[Dict[str, np.ndarray], np.ndarray, np.ndarray]]:
    """Collect `episodes` with the beta-mixed expert/policy driver, fully on
    device. Returns writer-ready (traj_obs, prev_actions, oracle_actions)
    triples in episode order — the same payload flush_episode builds in the
    host loop (dagger_trainer.py:220-240). With `mesh`, the collection scan
    shards its env axis over the data mesh (values identical either way)."""
    T_max = int(config.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS)
    store_f16 = bool(config.IL.DAGGER.lmdb_fp16)
    instr_uuid = str(config.MODEL.INSTRUCTION_ENCODER.sensor_uuid)

    results: List[Tuple[Dict[str, np.ndarray], np.ndarray, np.ndarray]] = []
    for real, arrays, pieces, done_before, feat_shapes in _chunk_rollouts(
        policy, transforms, config, episodes, beta, rng, mesh=mesh
    ):
        # one bulk readback per chunk (data crossed the wire nowhere else)
        pieces_np = jax.device_get(pieces)
        seq = {
            k: np.concatenate([np.asarray(p[k]) for p in pieces_np], axis=0)[:T_max]
            for k in pieces_np[0]
        }
        instr_np = arrays["instruction"]
        lengths = _episode_lengths(done_before, real, T_max)
        for b in range(real):
            T_ep = int(lengths[b])
            traj_obs = {
                instr_uuid: np.repeat(instr_np[b][None], T_ep, axis=0),
                "progress": np.asarray(seq["progress"][:T_ep, b]),
            }
            for k in ("rgb_features", "depth_features"):
                if k in seq:
                    flat = np.asarray(seq[k][:T_ep, b])
                    if not store_f16:  # f16 was only the wire dtype
                        flat = flat.astype(np.float32)
                    traj_obs[k] = flat.reshape((T_ep,) + feat_shapes[k])
            prev = np.asarray(seq["prev_action"][:T_ep, b], dtype=np.int64)
            oracle = np.asarray(seq["oracle"][:T_ep, b], dtype=np.int64)
            results.append((traj_obs, prev, oracle))
            if progress_cb is not None:
                progress_cb()
    return results


def _build_pack(n_seg: int, T_cut: int, M: int, keys: tuple, mesh=None):
    """Jitted chunk pack: concat segment emits along time, slice to the step
    cap, and take the episode-major valid rows (one gather per key). Cached
    per (segment count, row-bucket) shape.

    With `mesh` (sharded collection), the pieces arrive env-sharded on axis
    1 and the episode-major row gather crosses env shards — out_shardings
    pins the packed rows REPLICATED, so XLA places the all-gather here, once
    per chunk, and the bank's training gathers stay communication-free for
    the whole epoch."""

    def pack(pieces: tuple, sel: jnp.ndarray):
        out = {}
        for k in keys:
            seq = jnp.concatenate([p[k] for p in pieces], axis=0)[:T_cut]
            rows = seq.reshape((seq.shape[0] * seq.shape[1],) + seq.shape[2:])
            g = jnp.take(rows, sel, axis=0)
            if k in ("prev_action", "oracle"):
                g = g.astype(jnp.int32)  # in-jit: no eager astype dispatch
            out[k] = g
        return out

    if mesh is None:
        return jax.jit(pack)
    return jax.jit(pack, out_shardings=NamedSharding(mesh, P()))


def collect_episodes_resident(
    policy, transforms, config, episodes: List, beta: float, rng,
    progress_cb=None, mesh=None,
):
    """Collect `episodes` fully on device and keep them there: returns a
    DeviceTrajectoryBank whose rows never visited the host. Per chunk, the
    only readback is the done-flag matrix; rows are packed episode-major by
    one jitted gather. This replaces the reference's collect->LMDB->DataLoader
    round trip (dagger_trainer.py:341-372, 539-567) with HBM residency.

    With `mesh`, collection shards its env axis over the data mesh and the
    bank is built mesh-REPLICATED (one all-gather per chunk at pack time):
    every chip then holds the full bank, so training-batch gathers and the
    DP train step's batch slice need no communication at all."""
    from vlnce_tpu.data.device_bank import DeviceTrajectoryBank

    T_max = int(config.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS)
    B = max(1, int(config.NUM_ENVIRONMENTS))

    row_chunks, prev_chunks, oracle_chunks, instr_chunks = [], [], [], []
    all_lengths: List[int] = []
    shapes: Dict[str, tuple] = {}
    for real, arrays, pieces, done_before, feat_shapes in _chunk_rollouts(
        policy, transforms, config, episodes, beta, rng, mesh=mesh
    ):
        lengths = _episode_lengths(done_before, real, T_max)
        T_tot = sum(int(p["oracle"].shape[0]) for p in pieces)
        T_cut = min(T_tot, T_max)
        # episode-major flat (t, b) indices of the real rows; bucket the row
        # count so the pack jit compiles per (n_seg, M) not per chunk
        sel = np.concatenate(
            [np.arange(lengths[b], dtype=np.int64) * B + b for b in range(real)]
        )
        M = int(-(-len(sel) // _PACK_ROW_QUANTUM) * _PACK_ROW_QUANTUM)
        sel = np.pad(sel, (0, M - len(sel)))  # tail rows skipped by offsets

        keys = tuple(k for k in pieces[0] if k != "done_before")
        pack_key = (len(pieces), T_cut, M, keys, B,
                    None if mesh is None else mesh.shape[DATA_AXIS])
        if pack_key not in _PACK_CACHE:
            while len(_PACK_CACHE) >= _PACK_CACHE_MAX:
                _PACK_CACHE.pop(next(iter(_PACK_CACHE)))
            _PACK_CACHE[pack_key] = _build_pack(
                len(pieces), T_cut, M, keys, mesh=mesh
            )
        # sel ships with the dispatch (a separate eager jnp.asarray would be
        # its own round trip on a remote-attached chip)
        packed = _PACK_CACHE[pack_key](tuple(pieces), sel)

        prev_chunks.append(packed.pop("prev_action"))
        oracle_chunks.append(packed.pop("oracle"))
        row_chunks.append(packed)
        instr_chunks.append(arrays["instruction"][:real])
        all_lengths.extend(int(x) for x in lengths)
        shapes = dict(feat_shapes)
        shapes["progress"] = (1,)
        if progress_cb is not None:
            for _ in range(real):
                progress_cb()

    bank = DeviceTrajectoryBank.from_rows(
        row_chunks, prev_chunks, oracle_chunks, instr_chunks,
        all_lengths, shapes,
        instr_uuid=str(config.MODEL.INSTRUCTION_ENCODER.sensor_uuid),
        mesh=mesh,
    )
    logger.info(
        f"device bank: {len(bank)} episodes, {bank.num_steps} steps, "
        f"{bank.nbytes() / 2**20:.1f} MiB resident"
    )
    return bank
