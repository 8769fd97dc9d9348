"""DAgger / teacher-forcing imitation trainer.

Parity with reference vlnce_baselines/dagger_trainer.py:234-610 redesigned
for TPU:

- Collection: one jitted act_with_features program per step returns the
  sampled action AND the frozen-encoder features (replacing torch forward
  hooks, reference:294-314); episodes are msgpack'd into the native
  trajectory store (LMDB replacement) with periodic commits. beta-mixing
  `where(rand < beta, expert, policy)` runs on device.
- Training: the whole IL update (sequence forward via lax.scan +
  inflection-weighted CE + aux losses + Adam) is ONE jitted program per
  (bucketed T, N) shape; gradient accumulation is a device-side pytree.
- Env batch stays fixed-size with an active mask (no tensor shrinking).
"""

from __future__ import annotations

import gc
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import tqdm

from vlnce_tpu.registry import registry
from vlnce_tpu.envs.batch import stack_obs
from vlnce_tpu.envs.env_utils import construct_envs, get_env_class
from vlnce_tpu.data.collate import TrajectoryBatchIterator
from vlnce_tpu.data.prefetch import PrefetchIterator
from vlnce_tpu.data.trajectory_store import (
    TrajectoryStoreReader,
    TrajectoryStoreWriter,
    store_length,
)
from vlnce_tpu.ops.obs_transforms import apply_obs_transforms_batch, get_active_obs_transforms
from vlnce_tpu.trainers.base_trainer import BaseVLNCETrainer
from vlnce_tpu.utils.logging import logger
from vlnce_tpu.utils.tensorboard import TensorboardWriter


@registry.register_trainer(name="dagger")
class DaggerTrainer(BaseVLNCETrainer):
    def __init__(self, config):
        self.features_dir = config.IL.DAGGER.lmdb_features_dir.format(
            split=config.TASK_CONFIG.DATASET.SPLIT
        )
        if jax.process_count() > 1 and not config.IL.DAGGER.preload_lmdb_features:
            # pod collection: each rank collects its episode slice
            # (_collection_plan rank_slice) into a RANK-LOCAL store shard —
            # the store is single-writer, and a shared dir would have every
            # rank racing the same files. Training already consumes
            # per-process shards (prepare_global_batch). Preloaded stores
            # stay shared read-only (from_store takes the rank slice).
            self.features_dir = f"{self.features_dir}.rank{jax.process_index()}"
            logger.info(f"multi-process DAgger: rank-local store {self.features_dir}")
        super().__init__(config)
        self._train_step = None  # built lazily once the policy exists
        self._bank = None  # DeviceTrajectoryBank (TPU.DAGGER_RESIDENT)
        self._epoch_scan_cache: Dict[tuple, object] = {}  # (T_b, N, K) -> jit

    # ------------------------------------------------------------------ train
    def train(self) -> None:
        if self.config.IL.DAGGER.preload_lmdb_features:
            if store_length(self.features_dir) == 0:
                raise RuntimeError(f"no preloaded trajectories at {self.features_dir}")
        elif self.config.IL.DAGGER.drop_existing_lmdb_features:
            TrajectoryStoreWriter(self.features_dir, drop_existing=True).close()

        config = self.config.defrost()
        eps = config.IL.DAGGER.expert_policy_sensor
        if eps not in config.TASK_CONFIG.TASK.SENSORS:
            config.TASK_CONFIG.TASK.SENSORS.append(eps)
        if config.IL.DAGGER.p == 1.0:
            # teacher forcing: don't switch scenes mid-collection
            config.TASK_CONFIG.ENVIRONMENT.ITERATOR_OPTIONS.MAX_SCENE_REPEAT_STEPS = -1
        config.freeze()
        self.config = config

        self.obs_transforms = get_active_obs_transforms(config)
        observation_space, action_space = self._get_spaces(config)
        self._initialize_policy(
            config,
            load_from_ckpt=config.IL.load_from_ckpt,
            observation_space=observation_space,
            action_space=action_space,
        )
        os.makedirs(config.CHECKPOINT_FOLDER, exist_ok=True)

        resident = bool(config.TPU.DAGGER_RESIDENT)
        fused = resident and self._fused_epoch_ok()
        with TensorboardWriter(config.TENSORBOARD_DIR, purge_step=0) as writer:
            for dagger_it in range(config.IL.DAGGER.iterations):
                step_id = 0
                reader = None
                if resident:
                    diter = self._resident_iterator(
                        dagger_it + (1 if config.IL.load_from_ckpt else 0),
                        seed=config.TASK_CONFIG.SEED + dagger_it,
                    )
                else:
                    if not config.IL.DAGGER.preload_lmdb_features:
                        self._update_dataset(dagger_it + (1 if config.IL.load_from_ckpt else 0))
                    gc.collect()

                    reader = TrajectoryStoreReader(self.features_dir)
                    diter = TrajectoryBatchIterator(
                        reader,
                        batch_size=config.IL.batch_size,
                        use_iw=config.IL.use_iw,
                        inflection_weight_coef=config.IL.inflection_weight_coef,
                        seed=config.TASK_CONFIG.SEED + dagger_it,
                    )
                if not fused:
                    # store read + msgpack decode + collate run in a
                    # background thread, overlapping the jitted update
                    # (IL.prefetch_batches); the fused epoch scan has no
                    # host work to hide — batches are gathered on device
                    diter = PrefetchIterator(diter, depth=config.IL.prefetch_batches)
                def log_batch(loss, action_loss, aux_loss):
                    nonlocal step_id
                    writer.add_scalar(f"train_loss_iter_{dagger_it}", loss, step_id)
                    writer.add_scalar(f"train_action_loss_iter_{dagger_it}", action_loss, step_id)
                    writer.add_scalar(f"train_aux_loss_iter_{dagger_it}", aux_loss, step_id)
                    step_id += 1

                for epoch in tqdm.trange(config.IL.epochs, dynamic_ncols=True):
                    if fused:
                        triples = self._run_fused_epoch(diter)
                        for triple in triples:
                            log_batch(*triple)
                        loss, action_loss, aux_loss = triples[-1]
                    else:
                        for batch in tqdm.tqdm(diter, total=len(diter), leave=False, dynamic_ncols=True):
                            observations, prev_actions, masks, corrected, weights = batch
                            loss, action_loss, aux_loss = self._update_agent(
                                observations, prev_actions, masks, corrected, weights,
                                time_major=resident,
                            )
                            log_batch(loss, action_loss, aux_loss)
                    logger.info(
                        f"[dagger it {dagger_it} epoch {epoch}] loss={loss:.4f} action={action_loss:.4f} aux={aux_loss:.4f}"
                    )
                    self.save_checkpoint(
                        f"ckpt.{dagger_it * config.IL.epochs + epoch}.ckpt",
                        extra_state={"epoch": epoch, "step_id": step_id, "dagger_it": dagger_it},
                    )
                if reader is not None:
                    reader.close()
        # join any in-flight async checkpoint write: callers may load the
        # last checkpoint the moment train() returns
        from vlnce_tpu.utils.checkpoints import wait_for_pending

        wait_for_pending()

    def _collection_plan(self, data_it: int):
        """The episode slice and beta shared by every device collection mode
        (resident bank and store-wired): beta follows the reference schedule
        p**iteration (reference dagger_trainer.py:414-418); episodes are the
        first update_size in dataset order. One definition, so the resident
        and store paths can never silently diverge on selection or mixing.

        Under multi-process JAX each rank takes its STRIDED, wrap-padded
        slice of the plan (parallel/distributed.py:rank_slice — equal
        per-rank counts so every rank runs the same number of collective
        train batches), the device analog of the host env pool's
        per-process scene-split iterators / the reference's
        DistributedSampler."""
        from vlnce_tpu.parallel.distributed import rank_slice
        from vlnce_tpu.tasks.datasets import make_dataset

        config = self.config
        p = config.IL.DAGGER.p
        beta = 0.0 if p == 0.0 else p**data_it
        dataset = make_dataset(
            config.TASK_CONFIG.DATASET.TYPE, config.TASK_CONFIG.DATASET
        )
        episodes = list(dataset.episodes)[: int(config.IL.DAGGER.update_size)]
        return rank_slice(episodes), beta

    def _resident_mesh(self):
        """Mesh for the resident collect->train pipeline: the shared
        all-or-nothing gate (parallel/mesh.py:resident_mesh_for_batch) —
        collection, bank, and train step must share ONE device set, and
        under multi-process JAX each rank collects its episode slice
        (_collection_plan) locally while prepare_global_batch stitches the
        per-rank batches in the sharded step."""
        from vlnce_tpu.parallel.mesh import resident_mesh_for_batch

        return resident_mesh_for_batch(
            self.mesh, max(1, int(self.config.NUM_ENVIRONMENTS)),
            tag="TPU.DAGGER_RESIDENT",
        )

    def _fused_epoch_ok(self) -> bool:
        """Whether the fused epoch scan (TPU.RESIDENT_EPOCH_SCAN) can run:
        single-process (the scan can't stitch cross-process batches) and, on
        a mesh, IL.batch_size divisible by the data width (the scan body's
        shard_map cannot env-pad)."""
        cfg = self.config
        if not bool(getattr(cfg.TPU, "RESIDENT_EPOCH_SCAN", False)):
            return False
        if jax.process_count() > 1:
            logger.warning(
                "TPU.RESIDENT_EPOCH_SCAN: multi-process run — falling back "
                "to per-batch resident updates"
            )
            return False
        if self.mesh is not None:
            from vlnce_tpu.parallel.mesh import DATA_AXIS

            n_data = self.mesh.shape[DATA_AXIS]
            if int(cfg.IL.batch_size) % n_data != 0:
                logger.warning(
                    f"TPU.RESIDENT_EPOCH_SCAN: IL.batch_size="
                    f"{cfg.IL.batch_size} doesn't divide the {n_data}-way "
                    f"data mesh — falling back to per-batch resident updates"
                )
                return False
        return True

    def _run_fused_epoch(self, riter) -> List[Tuple[float, float, float]]:
        """One training epoch as a handful of device programs: lax.scan over
        consecutive same-length-bucket batch runs, gather + IL update fused
        per step (data/device_bank.py:run_fused_epoch). Batch composition
        and order are identical to the per-batch path (shared
        _epoch_batches stream). Returns per-batch (loss, action, aux)."""
        from vlnce_tpu.data.device_bank import run_fused_epoch

        self.policy.params, self.optim_state, out = run_fused_epoch(
            self.policy.params, self.optim_state, riter,
            self.policy.module, self.optimizer,
            self.policy.num_recurrent_layers, self.policy.hidden_size,
            self.mesh, self._epoch_scan_cache,
        )
        return out

    # ----------------------------------------------------- resident pipeline
    def _resident_iterator(self, data_it: int, seed: int):
        """Fused collect->train (TPU.DAGGER_RESIDENT): collection keeps the
        frozen-encoder features in HBM (DeviceTrajectoryBank) and the batch
        iterator gathers train batches on device — the trajectory store is
        bypassed (or written only as an archive). Banks accumulate across
        DAgger iterations like the store does."""
        import time as _time

        from vlnce_tpu.data.device_bank import (
            DeviceTrajectoryBank, ResidentBatchIterator,
        )

        config = self.config
        if config.IL.DAGGER.preload_lmdb_features:
            if self._bank is None:
                from vlnce_tpu.parallel.distributed import rank_slice

                reader = TrajectoryStoreReader(self.features_dir)
                self._bank = DeviceTrajectoryBank.from_store(
                    reader,
                    # the task's configured instruction sensor (e.g. RxR's
                    # rxr_instruction) — the default 'instruction' would
                    # misfile the instruction as a per-step feature row
                    instr_uuid=str(config.MODEL.INSTRUCTION_ENCODER.sensor_uuid),
                    # mesh-replicated so every chip's train-step batch slice
                    # is a local read (no reshard per batch); multi-process
                    # ranks bank only their shard on LOCAL devices and the
                    # sharded step stitches batches (prepare_global_batch)
                    mesh=None if jax.process_count() > 1 else self.mesh,
                    indices=rank_slice(range(len(reader))),
                )
                reader.close()
                logger.info(
                    f"uploaded trajectory store to device bank: "
                    f"{len(self._bank)} episodes, "
                    f"{self._bank.nbytes() / 2**20:.1f} MiB"
                )
        else:
            if not bool(config.TPU.ON_DEVICE_DAGGER):
                raise RuntimeError(
                    "TPU.DAGGER_RESIDENT needs TPU.ON_DEVICE_DAGGER (device "
                    "collection) or IL.DAGGER.preload_lmdb_features (one-time "
                    "store upload); the host env-pool collector cannot feed "
                    "the device bank directly"
                )
            from vlnce_tpu.trainers.device_dagger import collect_episodes_resident

            episodes, beta = self._collection_plan(data_it)
            pbar = tqdm.tqdm(total=len(episodes), dynamic_ncols=True)
            t0 = _time.time()
            new_bank = collect_episodes_resident(
                self.policy, self.obs_transforms, config, episodes, beta,
                self._next_rng(), progress_cb=pbar.update,
                mesh=self._resident_mesh(),
            )
            pbar.close()
            logger.info(
                f"[collection it {data_it}] {len(new_bank)} episodes resident, "
                f"{new_bank.num_steps} steps in {_time.time() - t0:.1f}s"
            )
            if bool(config.TPU.DAGGER_ARCHIVE_STORE):
                writer = TrajectoryStoreWriter(self.features_dir, drop_existing=False)
                new_bank.write_to_store(writer, fp16=bool(config.IL.DAGGER.lmdb_fp16))
                writer.close()
            self._bank = (
                new_bank if self._bank is None else self._bank.extend(new_bank)
            )
        return ResidentBatchIterator(
            self._bank,
            batch_size=config.IL.batch_size,
            use_iw=config.IL.use_iw,
            inflection_weight_coef=config.IL.inflection_weight_coef,
            seed=seed,
            # batches arrive in the train step's [T, N, ...] layout straight
            # from the gather jit — no per-leaf eager reshape dispatches
            time_major=True,
        )

    # ------------------------------------------------------- jitted update
    def _build_train_step(self):
        """The production IL update: shared with the multi-chip dryrun
        (parallel/il_step.py). Sharded over the env/batch axis when a
        data-parallel mesh is active; shape-polymorphic under jit."""
        from vlnce_tpu.parallel.il_step import build_il_train_step

        return build_il_train_step(
            self.policy.module, self.optimizer,
            self.policy.num_recurrent_layers, self.policy.hidden_size,
            mesh=self.mesh,
        )

    def _update_agent(self, observations, prev_actions, masks, corrected, weights,
                      time_major: bool = False) -> Tuple[float, float, float]:
        from vlnce_tpu.parallel.il_step import prepare_global_batch

        if self._train_step is None:
            self._train_step = self._build_train_step()
        T, N = corrected.shape
        if time_major:
            # device-resident batch already in [T, N, ...] layout with
            # transforms applied at collection (device_dagger scan body) —
            # re-running them would only add eager dispatches (they are
            # idempotent on stored/collected batches: crops match, features
            # pass through)
            batch = (observations, prev_actions, masks, corrected, weights)
        else:
            obs_dev = apply_obs_transforms_batch(
                {k: jnp.asarray(v) for k, v in observations.items()}, self.obs_transforms
            )
            batch = (
                {k: v.reshape((T, N) + v.shape[1:]) for k, v in obs_dev.items()},
                jnp.asarray(prev_actions).reshape(T, N),
                jnp.asarray(masks).reshape(T, N),
                jnp.asarray(corrected),
                jnp.asarray(weights),
            )
        # env padding + (under multi-process JAX) cross-process global-array
        # assembly — each process feeds its local data shard, the step runs
        # over the global mesh (parallel/il_step.py:prepare_global_batch)
        batch = prepare_global_batch(self.mesh, *batch)
        params, optim_state, loss, action_loss, aux_loss = self._train_step(
            self.policy.params, self.optim_state, *batch
        )
        self.policy.params = params
        self.optim_state = optim_state
        return float(loss), float(action_loss), float(aux_loss)

    # --------------------------------------------------------- collection
    def _update_dataset(self, data_it: int) -> None:
        from vlnce_tpu.utils.profiling import SectionTimers

        if bool(self.config.TPU.ON_DEVICE_DAGGER):
            self._update_dataset_on_device(data_it)
            return

        timers = SectionTimers()
        config = self.config
        envs = construct_envs(config, get_env_class(config.ENV_NAME))
        expert_uuid = config.IL.DAGGER.expert_policy_sensor_uuid

        N = envs.num_envs
        observations = envs.reset()
        obs_host = stack_obs(observations)
        per_env_obs = observations

        episodes: List[List] = [[] for _ in range(N)]
        skips = [False] * N
        dones = [False] * N
        active = [True] * N

        # two-group pipelined collection (SURVEY.md §7 hard part 3): while one
        # group's sims execute, the device runs the other group's fused act —
        # min(device_step, sim_step) saved per cycle. One group = the serial
        # path with identical semantics.
        pipelined = bool(config.TPU.PIPELINED_COLLECTION) and N >= 2
        bounds = [(0, N // 2), (N // 2, N)] if pipelined else [(0, N)]
        g_rnn = [self.policy.initial_rnn_states(hi - lo) for lo, hi in bounds]
        g_prev = [jnp.zeros((hi - lo, 1), jnp.int32) for lo, hi in bounds]
        g_masks = [jnp.zeros((hi - lo, 1), jnp.float32) for lo, hi in bounds]

        p = config.IL.DAGGER.p
        beta = 0.0 if p == 0.0 else p**data_it
        ensure_unique_episodes = beta == 1.0

        cache_rgb = not config.MODEL.RGB_ENCODER.trainable
        cache_depth = not config.MODEL.DEPTH_ENCODER.trainable

        # transforms + act_with_features + device-side beta expert mix fused
        # into ONE jitted dispatch per collection step
        transforms = self.obs_transforms
        policy = self.policy

        def _collect_impl(params, observations, rnn_states_, prev_actions_, masks_, rng, beta_):
            batch = apply_obs_transforms_batch(observations, transforms)
            rng_act, rng_mix = jax.random.split(rng)
            acts, states, feats_ = policy._act_features_impl(
                params, batch, rnn_states_, prev_actions_, masks_, rng_act, False
            )
            expert = observations[expert_uuid].astype(jnp.int32).reshape(-1, 1)
            mix = jax.random.uniform(rng_mix, acts.shape)
            acts = jnp.where(mix < beta_, expert, acts)
            return acts, states, feats_, expert

        collect_step = jax.jit(_collect_impl)

        writer = TrajectoryStoreWriter(self.features_dir, drop_existing=False)
        collected_eps = 0
        ep_ids_collected = None
        if ensure_unique_episodes:
            ep_ids_collected = {ep.episode_id for ep in envs.current_episodes()}

        pbar = tqdm.tqdm(total=config.IL.DAGGER.update_size, dynamic_ncols=True)
        store_dtype = jnp.float16 if config.IL.DAGGER.lmdb_fp16 else jnp.float32

        def flush_episode(i: int) -> None:
            """Write env i's finished episode to the store; deactivate the
            slot when its next episode is a duplicate (ensure_unique)."""
            nonlocal collected_eps
            if dones[i] and not skips[i]:
                ep = episodes[i]
                traj_obs: Dict[str, np.ndarray] = {}
                for k in ep[0][0].keys():
                    if k == expert_uuid:
                        continue
                    arr = np.stack([np.asarray(step[0][k]) for step in ep], axis=0)
                    if config.IL.DAGGER.lmdb_fp16 and arr.dtype == np.float32:
                        arr = arr.astype(np.float16)
                    traj_obs[k] = arr
                writer.put(
                    [
                        traj_obs,
                        np.array([step[1] for step in ep], dtype=np.int64),
                        np.array([step[2] for step in ep], dtype=np.int64),
                    ]
                )
                collected_eps += 1
                pbar.update()
                if collected_eps % config.IL.DAGGER.lmdb_commit_frequency == 0:
                    writer.commit()
                if ensure_unique_episodes:
                    new_ep = envs.call_at(i, "current_episode")
                    if new_ep.episode_id in ep_ids_collected:
                        active[i] = False
                    else:
                        ep_ids_collected.add(new_ep.episode_id)
            if dones[i]:
                episodes[i] = []

        pending: List[Optional[List[int]]] = [None] * len(bounds)
        stop = False
        while not stop:
            for gi, (lo, hi) in enumerate(bounds):
                # receive this group's in-flight env steps (none on cycle 0)
                if pending[gi] is not None:
                    with timers.time("env_time"):
                        stepped = envs.recv_at(pending[gi])
                    for i, (obs, _, done, _) in zip(pending[gi], stepped):
                        per_env_obs[i] = obs
                        dones[i] = done
                        for k, v in obs.items():
                            obs_host[k][i] = np.asarray(v)
                    g_masks[gi] = jnp.asarray(
                        np.array([[0.0] if dones[i] else [1.0] for i in range(lo, hi)], np.float32)
                    )
                    pending[gi] = None

                for i in range(lo, hi):
                    if active[i]:
                        flush_episode(i)
                if collected_eps >= config.IL.DAGGER.update_size or not any(active):
                    stop = True
                    break
                if not any(active[lo:hi]):
                    continue

                # fused transforms+act+mix on this group's slice — while the
                # OTHER group's sims are stepping (pipelined overlap)
                with timers.time("pth_time"):
                    actions, g_rnn[gi], feats, expert_actions = collect_step(
                        self.policy.params,
                        {k: jnp.asarray(v[lo:hi]) for k, v in obs_host.items()},
                        g_rnn[gi], g_prev[gi], g_masks[gi],
                        self._next_rng(), jnp.float32(beta),
                    )
                    # bf16 device features -> a serializable dtype for the store
                    rgb_feats = (
                        np.asarray(feats["rgb_features"].astype(store_dtype))
                        if cache_rgb and "rgb_features" in feats else None
                    )
                    depth_feats = (
                        np.asarray(feats["depth_features"].astype(store_dtype))
                        if cache_depth and "depth_features" in feats else None
                    )
                    expert_np = np.asarray(expert_actions).reshape(-1)
                    prev_np = np.asarray(g_prev[gi]).reshape(-1)

                for i in range(lo, hi):
                    if not active[i]:
                        continue
                    step_obs = dict(per_env_obs[i])
                    if rgb_feats is not None:
                        step_obs["rgb_features"] = rgb_feats[i - lo]
                        step_obs.pop("rgb", None)
                    if depth_feats is not None:
                        step_obs["depth_features"] = depth_feats[i - lo]
                        step_obs.pop("depth", None)
                    episodes[i].append((step_obs, int(prev_np[i - lo]), int(expert_np[i - lo])))

                # skip episodes where the expert has no path (expert == -1)
                group_skips = [bool(expert_np[i - lo] == -1) for i in range(lo, hi)]
                skips[lo:hi] = group_skips
                actions_np = np.asarray(actions).reshape(-1).copy()
                actions_np[np.asarray(group_skips)] = 0
                g_prev[gi] = jnp.asarray(actions_np.reshape(-1, 1))

                active_ids = [i for i in range(lo, hi) if active[i]]
                envs.step_at_async(active_ids, [int(actions_np[i - lo]) for i in active_ids])
                pending[gi] = active_ids

        # drain in-flight steps so workers aren't mid-message at close
        for ids in pending:
            if ids:
                envs.recv_at(ids)

        writer.close()
        pbar.close()
        envs.close()
        logger.info(f"[collection it {data_it}] {collected_eps} episodes, {timers.summary()}")

    def _update_dataset_on_device(self, data_it: int) -> None:
        """DAgger collection as on-device scans (TPU.ON_DEVICE_DAGGER):
        render + frozen features + act + device expert + beta-mix + step all
        in one dispatch per segment; only store payloads cross back. Episodes
        are the first update_size of the split in dataset order (the host
        pool's iterator restarts each collection round too)."""
        import time as _time

        import tqdm

        from vlnce_tpu.parallel.mesh import shrink_mesh_for_batch
        from vlnce_tpu.trainers.device_dagger import collect_episodes_on_device

        config = self.config
        episodes, beta = self._collection_plan(data_it)

        writer = TrajectoryStoreWriter(self.features_dir, drop_existing=False)
        pbar = tqdm.tqdm(total=len(episodes), dynamic_ncols=True)
        t0 = _time.time()
        results = collect_episodes_on_device(
            self.policy, self.obs_transforms, config, episodes, beta,
            self._next_rng(), progress_cb=pbar.update,
            # store-wired: results are read back to host, so a shrunk mesh
            # (env axis must divide) can't conflict with the train step
            mesh=shrink_mesh_for_batch(
                self.mesh, max(1, int(config.NUM_ENVIRONMENTS)),
                tag="on-device DAgger collection",
            ),
        )
        for payload in results:
            writer.put(list(payload))
        writer.commit()
        writer.close()
        pbar.close()
        steps = sum(len(r[1]) for r in results)
        logger.info(
            f"[collection it {data_it}] {len(results)} episodes on device, "
            f"{steps} steps in {_time.time() - t0:.1f}s"
        )
