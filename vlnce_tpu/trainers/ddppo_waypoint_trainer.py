"""DD-PPO waypoint trainer (distributed RL).

Covers reference vlnce_baselines/ddppo_waypoint_trainer.py:54-986, redesigned
for the TPU topology (SURVEY.md §5.8): the reference runs M SLURM ranks each
owning a policy replica + 4 sims with NCCL gradient allreduce and a TCP-store
straggler counter. Here ONE host process drives the whole env pool and a
data-parallel mesh of chips runs the PPO update with lax.pmean gradient
sync; rollouts are fixed-length and lockstep, so the sync_frac straggler
preemption machinery is unnecessary by construction (policy steps are batched
into one device program).

SLURM preemption/requeue parity: SIGUSR1/SIGTERM install EXIT/REQUEUE events;
on requeue the full training state (params, optimizer, update counter,
running stats) is written to RL.DDPPO.requeue_path and restored on restart.
"""

from __future__ import annotations

import json
import math
import os
import signal
import time
from collections import defaultdict, deque
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import tqdm
from gymnasium import spaces

from vlnce_tpu.registry import registry
from vlnce_tpu.config.default import add_pano_sensors_to_config
from vlnce_tpu.envs.batch import stack_obs
from vlnce_tpu.envs.env_utils import construct_envs, construct_envs_auto_reset_false, get_env_class
from vlnce_tpu.models.waypoint_policy import WaypointPolicy
from vlnce_tpu.models.waypoint_predictors import distance_to_continuous, offset_to_continuous
from vlnce_tpu.ops.obs_transforms import (
    apply_obs_transforms_batch,
    apply_obs_transforms_obs_space,
    get_active_obs_transforms,
)
from vlnce_tpu.parallel.mesh import DATA_AXIS, make_mesh, resolve_training_mesh
from vlnce_tpu.rl.ppo import WDDPPO
from vlnce_tpu.rl.rollout_storage import ActionDictRolloutStorage
from vlnce_tpu.trainers.base_trainer import BaseVLNCETrainer
from vlnce_tpu.utils.checkpoints import load_checkpoint, save_checkpoint
from vlnce_tpu.utils.logging import logger
from vlnce_tpu.utils.tensorboard import TensorboardWriter

EXIT = {"flag": False}
REQUEUE = {"flag": False}


def _signal_handler(signum, frame):
    EXIT["flag"] = True
    if signum in (signal.SIGUSR1,):
        REQUEUE["flag"] = True


def add_signal_handlers() -> None:
    signal.signal(signal.SIGUSR1, _signal_handler)
    signal.signal(signal.SIGTERM, _signal_handler)


def linear_decay(epoch: int, total: int) -> float:
    return 1.0 - (epoch / float(total))


@registry.register_trainer(name="ddppo-waypoint")
class DDPPOWaypointTrainer(BaseVLNCETrainer):
    def __init__(self, config):
        config = add_pano_sensors_to_config(config)
        self._interrupted_state = None
        requeue_path = config.RL.DDPPO.requeue_path
        if config.RL.DDPPO.start_from_requeue and os.path.exists(requeue_path):
            self._interrupted_state = load_checkpoint(requeue_path)
        super().__init__(config)
        self.agent: Optional[WDDPPO] = None

    # ----------------------------------------------------------------- spaces
    def _set_observation_space(self, envs) -> None:
        """Transformed obs space + per-frame history spaces
        (reference:73-100)."""
        observation_space = envs.observation_spaces[0]
        self.obs_transforms = get_active_obs_transforms(self.config)
        observation_space = apply_obs_transforms_obs_space(observation_space, self.obs_transforms)
        single_rgb = observation_space["rgb"]
        single_depth = observation_space["depth"]
        new = dict(observation_space.spaces)
        new["rgb_history"] = spaces.Box(
            low=0, high=255, shape=single_rgb.shape[1:], dtype=single_rgb.dtype
        )
        new["depth_history"] = spaces.Box(
            low=0.0, high=1.0, shape=single_depth.shape[1:], dtype=single_depth.dtype
        )
        self.observation_space = spaces.Dict(new)

    def _initialize_policy_rl(self, load_from_ckpt: bool, ckpt_path: str = "") -> None:
        config = self.config
        self.policy = WaypointPolicy.from_config(config, self.observation_space)
        self.policy.init_params(self._next_rng(), batch_size=1)
        if load_from_ckpt:
            ckpt = load_checkpoint(ckpt_path)
            self.policy.params = jax.tree_util.tree_map(jnp.asarray, ckpt["state_dict"])
            logger.info(f"Loaded waypoint policy from {ckpt_path}")
        # data-parallel mesh per TPU.MESH.DATA (-1 auto, k>1 fails loudly if
        # unavailable); minibatches whose env axis doesn't divide the data
        # axis are PADDED in WDDPPO._pad_sample, never silently single-device
        mesh = resolve_training_mesh(config)
        self._collector_mesh = None
        if mesh is not None and bool(config.TPU.ON_DEVICE_ROLLOUT):
            if jax.process_count() > 1:
                # the collection scan feeds rank-local host scene arrays,
                # which cannot enter a jit sharded over non-addressable
                # devices: each rank collects its env pool locally and
                # WDDPPO._globalize_sample stitches the per-rank batches
                # into the global sharded update
                logger.info(
                    "ON_DEVICE_ROLLOUT multi-process: per-rank local "
                    "collection; the sharded PPO update stitches ranks"
                )
            else:
                # single-process: collection and the PPO update share the
                # [T, N, ...] batch on the same devices, so N must divide
                # the mesh. Auto meshes (DATA=-1) shrink to the largest
                # divisor with a warning; an explicit width fails loudly.
                N = int(config.NUM_ENVIRONMENTS)
                n_data = mesh.shape[DATA_AXIS]
                if N % n_data != 0:
                    if int(config.TPU.MESH.DATA) == -1:
                        g = math.gcd(N, n_data)
                        logger.warning(
                            f"ON_DEVICE_ROLLOUT: {N} envs don't divide the auto "
                            f"{n_data}-way data mesh; using a {g}-way mesh"
                        )
                        mesh = make_mesh(num_devices=g) if g > 1 else None
                    else:
                        raise ValueError(
                            f"TPU.ON_DEVICE_ROLLOUT with TPU.MESH.DATA={n_data} "
                            f"needs NUM_ENVIRONMENTS divisible by it (got {N})"
                        )
                self._collector_mesh = mesh
        self._mesh = mesh
        self.agent = WDDPPO(
            self.policy,
            config.RL.PPO,
            mesh=mesh,
            offset_regularize_coef=config.RL.PPO.offset_regularize_coef,
            pano_entropy_coef=config.RL.PPO.pano_entropy_coef,
            offset_entropy_coef=config.RL.PPO.offset_entropy_coef,
            distance_entropy_coef=config.RL.PPO.distance_entropy_coef,
            num_updates=int(config.RL.NUM_UPDATES),
        )
        logger.info(f"Initialized WaypointPolicy: {self.policy.num_params()} params (mesh={'on' if mesh else 'off'})")

    # ---------------------------------------------------------------- helpers
    @staticmethod
    def _extract_scalars_from_infos(infos: List[Dict]) -> Dict[str, List[float]]:
        out = defaultdict(list)
        for info in infos:
            for k, v in info.items():
                if np.isscalar(v) and not isinstance(v, str):
                    out[k].append(float(v))
        return out

    def _prepare_batch(self, observations: List[Dict], obs_history: Dict[str, np.ndarray]):
        """Transforms run on device ONCE; returns (device_batch, numpy_batch)
        so act() reuses the device copy and rollout storage gets the host
        copy without a second transfer."""
        dev = apply_obs_transforms_batch(
            {k: jnp.asarray(v) for k, v in stack_obs(observations).items()}, self.obs_transforms
        )
        dev["rgb_history"] = jnp.asarray(obs_history["rgb"])
        dev["depth_history"] = jnp.asarray(obs_history["depth"])
        host = {k: np.asarray(v) for k, v in dev.items()}
        return dev, host

    # ------------------------------------------------------------------ train
    def train(self) -> None:
        config = self.config
        add_signal_handlers()

        # on-device rollout mode: no env pool at all — the device-resident
        # grid world steps inside the collection scan (rl/device_rollout.py)
        on_device = bool(config.TPU.ON_DEVICE_ROLLOUT)
        if on_device:
            env_cls = get_env_class(config.ENV_NAME)
            probe = env_cls(config.clone())

            class _SpaceHolder:
                observation_spaces = [probe.observation_space]

            self.envs = None
            self._set_observation_space(_SpaceHolder())
            probe.close()
            N = int(config.NUM_ENVIRONMENTS)
        else:
            self.envs = construct_envs(config, get_env_class(config.ENV_NAME))
            N = self.envs.num_envs
            self._set_observation_space(self.envs)
        self._initialize_policy_rl(load_from_ckpt=False)

        wypt_cfg = config.MODEL.WAYPOINT
        ppo_cfg = config.RL.PPO
        collector = None
        rollouts = None
        if on_device:
            # fully device-resident training: no host rollout storage at all;
            # collect_device() hands the PPO batch to update_device() as
            # device arrays (rl/device_rollout.py)
            from vlnce_tpu.rl.device_rollout import DeviceRolloutCollector

            collector = DeviceRolloutCollector(
                self.policy, self.obs_transforms, config, N,
                # under multi-process this is None: collection is rank-local
                mesh=getattr(self, "_collector_mesh", None),
            )
            collector.initial_carry_and_obs()
        else:
            rollouts = ActionDictRolloutStorage(
                ppo_cfg.num_steps, N, self.observation_space,
                config.MODEL.STATE_ENCODER.hidden_size,
                num_recurrent_layers=self.policy.num_recurrent_layers,
                continuous_offset=wypt_cfg.continuous_offset,
                continuous_distance=wypt_cfg.continuous_distance,
            )
            observations = self.envs.reset()
            obs_history = {
                "rgb": np.zeros_like(rollouts.observations["rgb_history"][0]),
                "depth": np.zeros_like(rollouts.observations["depth_history"][0]),
            }
            # two-group pipelined rollout collection: group A's sims step while
            # the device runs group B's act (TPU.PIPELINED_COLLECTION); the device
            # obs batch is carried per group so no re-upload happens per step
            pipelined = bool(config.TPU.PIPELINED_COLLECTION) and N >= 2
            self._group_bounds = [(0, N // 2), (N // 2, N)] if pipelined else [(0, N)]
            self._dev_batches = []
            host_parts = []
            for lo, hi in self._group_bounds:
                dev_g, host_g = self._prepare_batch(
                    observations[lo:hi], {k: v[lo:hi] for k, v in obs_history.items()}
                )
                self._dev_batches.append(dev_g)
                host_parts.append(host_g)
            for k in host_parts[0]:
                rollouts.observations[k][0] = np.concatenate([p[k] for p in host_parts], axis=0)

        current_episode_reward = np.zeros((N, 1), np.float32)
        running_episode_stats = {
            "count": np.zeros((N, 1), np.float32),
            "reward": np.zeros((N, 1), np.float32),
        }
        window_episode_stats = defaultdict(lambda: deque(maxlen=ppo_cfg.reward_window_size))

        start_update = 0
        count_steps = 0
        if self._interrupted_state is not None:
            self.policy.params = jax.tree_util.tree_map(jnp.asarray, self._interrupted_state["state_dict"])
            extra = self._interrupted_state.get("extra_state") or {}
            start_update = int(extra.get("update", 0))
            count_steps = int(extra.get("count_steps", 0))
            logger.info(f"Resumed from requeue state at update {start_update}")

        rng_np = np.random.RandomState(config.TASK_CONFIG.SEED)
        t_start = time.time()
        pth_time = env_time = 0.0

        from vlnce_tpu.utils.profiling import maybe_profile

        os.makedirs(config.CHECKPOINT_FOLDER, exist_ok=True)
        with TensorboardWriter(config.TENSORBOARD_DIR) as writer, maybe_profile(config.TPU.PROFILE_DIR or None):
            for update in range(start_update, config.RL.NUM_UPDATES):
                if EXIT["flag"]:
                    break
                if on_device:
                    t0 = time.time()
                    device_batch, n_steps = collector.collect_device(
                        current_episode_reward, running_episode_stats,
                        self._next_rng(),
                    )
                    count_steps += n_steps
                    pth_time += time.time() - t0
                else:
                    for _step in range(ppo_cfg.num_steps):
                        d_pth, d_env = self._collect_rollout_step(
                            rollouts, current_episode_reward, running_episode_stats
                        )
                        pth_time += d_pth
                        env_time += d_env
                        count_steps += N

                # one cumulative snapshot per update; logging takes the delta
                # between the newest and oldest snapshots in the window
                # (habitat windowed-mean semantics)
                for k, v in running_episode_stats.items():
                    window_episode_stats[k].append(v.copy())

                t0 = time.time()
                if on_device:
                    # bootstrap value + GAE already happened inside the
                    # collection program; minibatches gather on device.
                    # With TPU.PPO_UPDATE_SCAN (single-process), all
                    # ppo_epoch x num_mini_batch updates fuse into one
                    # lax.scan program — same minibatch composition.
                    if bool(self.config.TPU.PPO_UPDATE_SCAN) and jax.process_count() == 1:
                        stats = self.agent.update_device_scan(device_batch, rng_np, update_idx=update)
                    else:
                        stats = self.agent.update_device(device_batch, rng_np, update_idx=update)
                else:
                    last_obs = {k: jnp.asarray(v[rollouts.step]) for k, v in rollouts.observations.items()}
                    last_prev = {k: jnp.asarray(v[rollouts.step]) for k, v in rollouts.prev_actions.items()}
                    next_value = self.policy.get_value(
                        last_obs, jnp.asarray(rollouts.recurrent_hidden_states[rollouts.step]),
                        last_prev, jnp.asarray(rollouts.masks[rollouts.step]),
                    )
                    rollouts.compute_returns(np.asarray(next_value), ppo_cfg.use_gae, ppo_cfg.gamma, ppo_cfg.tau)
                    stats = self.agent.update(rollouts, rng_np, update_idx=update)
                    rollouts.after_update()
                pth_time += time.time() - t0

                if update % config.RL.LOG_INTERVAL == 0:
                    fps = count_steps / max(time.time() - t_start, 1e-6)
                    deltas = {
                        k: (np.sum(w[-1] - w[0]) if len(w) > 1 else np.sum(w[0]))
                        for k, w in window_episode_stats.items()
                    }
                    reward_mean = deltas.get("reward", 0.0) / max(deltas.get("count", 0.0), 1.0)
                    logger.info(
                        f"update {update}\tfps {fps:.1f}\treward {reward_mean:.3f}\t"
                        + "\t".join(f"{k} {v:.4f}" for k, v in stats.items())
                    )
                    writer.add_scalar("reward", reward_mean, count_steps)
                    for k, v in stats.items():
                        writer.add_scalar(f"losses/{k}", v, count_steps)

                if update % config.RL.CHECKPOINT_INTERVAL == 0:
                    self.save_rl_checkpoint(f"ckpt.{update // config.RL.CHECKPOINT_INTERVAL}.ckpt", update, count_steps)

            if REQUEUE["flag"]:
                self._save_interrupted_state(update, count_steps)

        if self.envs is not None:
            self.envs.close()
        # join any in-flight async checkpoint write before returning
        from vlnce_tpu.utils.checkpoints import wait_for_pending

        wait_for_pending()

    def save_rl_checkpoint(self, name: str, update: int, count_steps: int) -> None:
        # rank-0 gating for pods lives in utils/checkpoints.save_checkpoint
        save_checkpoint(
            os.path.join(self.config.CHECKPOINT_FOLDER, name),
            self.policy.params, config=self.config,
            optim_state=self.agent.optim_state,
            extra_state={"update": update, "count_steps": count_steps},
            async_write=bool(getattr(self.config.TPU, "ASYNC_CHECKPOINT", False)),
        )

    def _save_interrupted_state(self, update: int, count_steps: int) -> None:
        # synchronous: the process exits for requeue right after this write.
        # all_ranks: requeue_path is typically node-local (no shared FS on
        # TPU-VM workers) — every rank must find its own file on restart or
        # the pod resumes desynchronized
        save_checkpoint(
            self.config.RL.DDPPO.requeue_path,
            self.policy.params, config=self.config,
            optim_state=self.agent.optim_state,
            extra_state={"update": update, "count_steps": count_steps},
            all_ranks=True,
        )
        logger.info("Saved interrupted state for requeue")

    # --------------------------------------------------------- rollout step
    def _collect_rollout_step(self, rollouts, current_episode_reward, running_episode_stats) -> Tuple[float, float]:
        N = self.envs.num_envs
        step = rollouts.step
        rgb_np = rollouts.observations["rgb"][step]
        depth_np = rollouts.observations["depth"][step]
        pth_time = env_time = 0.0

        # phase 1 — per group: fused act on the carried device batch, then
        # DISPATCH the env steps without waiting. While group A's sims
        # execute, the device runs group B's act (pipelined overlap).
        outs: List[Dict] = []
        hist_groups: List[Dict[str, np.ndarray]] = []
        for gi, (lo, hi) in enumerate(self._group_bounds):
            t0 = time.time()
            step_prev = {k: jnp.asarray(v[step][lo:hi]) for k, v in rollouts.prev_actions.items()}
            out = self.policy.act(
                self._dev_batches[gi],
                jnp.asarray(rollouts.recurrent_hidden_states[step][lo:hi]),
                step_prev, jnp.asarray(rollouts.masks[step][lo:hi]),
                deterministic=False, rng=self._next_rng(),
            )
            actions = WaypointPolicy.actions_to_env(out)

            # history frame: the pano frame the agent moved toward (reference
            # ddppo_waypoint_trainer.py:190-200); zeros on STOP
            pano_np = np.asarray(out["action_elements"]["pano"]).astype(np.int64).reshape(-1)
            stop_np = np.asarray(out["stop"]).reshape(-1)
            hist = {
                "rgb": np.zeros_like(rgb_np[lo:hi, 0]),
                "depth": np.zeros_like(depth_np[lo:hi, 0]),
            }
            for i in range(hi - lo):
                if not stop_np[i]:
                    idx = int(pano_np[i]) % rgb_np.shape[1]
                    hist["rgb"][i] = rgb_np[lo + i, idx]
                    hist["depth"][i] = depth_np[lo + i, idx]
            pth_time += time.time() - t0

            self.envs.step_at_async(list(range(lo, hi)), actions)
            outs.append(out)
            hist_groups.append(hist)

        # phase 2 — per group: receive env results, re-prepare the device
        # batch (transform dispatch overlaps the other group's sims)
        observations: List = [None] * N
        rewards: List = [0.0] * N
        dones: List = [False] * N
        infos: List = [{}] * N
        host_parts: List[Dict[str, np.ndarray]] = []
        for gi, (lo, hi) in enumerate(self._group_bounds):
            t1 = time.time()
            stepped = self.envs.recv_at(list(range(lo, hi)))
            env_time += time.time() - t1
            t2 = time.time()
            for i, (obs, reward, done, info) in zip(range(lo, hi), stepped):
                observations[i] = obs
                rewards[i] = reward
                dones[i] = done
                infos[i] = info
            self._dev_batches[gi], host_g = self._prepare_batch(
                observations[lo:hi], hist_groups[gi]
            )
            host_parts.append(host_g)
            pth_time += time.time() - t2

        t2 = time.time()
        batch = {k: np.concatenate([p[k] for p in host_parts], axis=0) for k in host_parts[0]}
        out = {
            "rnn_states": np.concatenate([np.asarray(o["rnn_states"]) for o in outs], axis=0),
            "action_log_probs": np.concatenate([np.asarray(o["action_log_probs"]) for o in outs], axis=0),
            "value": np.concatenate([np.asarray(o["value"]) for o in outs], axis=0),
            "action_elements": {
                k: np.concatenate([np.asarray(o["action_elements"][k]) for o in outs], axis=0)
                for k in outs[0]["action_elements"]
            },
        }
        rewards_np = np.asarray(rewards, np.float32).reshape(N, 1)
        masks_np = np.asarray([[0.0] if d else [1.0] for d in dones], np.float32)

        current_episode_reward += rewards_np
        done_mask = 1.0 - masks_np
        running_episode_stats["reward"] += done_mask * current_episode_reward
        running_episode_stats["count"] += done_mask
        for k, v in self._extract_scalars_from_infos(infos).items():
            if k not in running_episode_stats:
                running_episode_stats[k] = np.zeros((N, 1), np.float32)
            running_episode_stats[k] += done_mask * np.asarray(v, np.float32).reshape(N, 1)
        current_episode_reward *= masks_np

        rollouts.insert(
            batch,
            np.asarray(out["rnn_states"]),
            {k: np.asarray(v) for k, v in out["action_elements"].items()},
            np.asarray(out["action_log_probs"]),
            np.asarray(out["value"]),
            rewards_np,
            masks_np,
        )
        pth_time += time.time() - t2
        return pth_time, env_time

    # ------------------------------------------------------------------ eval
    def _eval_checkpoint(self, checkpoint_path: str, writer, checkpoint_index: int = 0) -> None:
        """Waypoint eval loop: dict prev_actions + per-step pano history
        (reference:710-986)."""
        logger.info(f"checkpoint_path: {checkpoint_path}")
        config = self.config.clone()
        split = config.EVAL.SPLIT
        config.defrost()
        config.TASK_CONFIG.DATASET.SPLIT = split
        config.TASK_CONFIG.TASK.NDTW.SPLIT = split
        config.TASK_CONFIG.ENVIRONMENT.ITERATOR_OPTIONS.SHUFFLE = False
        config.TASK_CONFIG.ENVIRONMENT.ITERATOR_OPTIONS.MAX_SCENE_REPEAT_STEPS = -1
        config.freeze()

        if config.EVAL.SAVE_RESULTS:
            os.makedirs(config.RESULTS_DIR, exist_ok=True)
            fname = os.path.join(config.RESULTS_DIR, f"stats_ckpt_{checkpoint_index}_{split}.json")
            if os.path.exists(fname):
                logger.info("skipping -- evaluation exists.")
                return

        envs = construct_envs_auto_reset_false(config, get_env_class(config.ENV_NAME))
        self.envs = envs
        N = envs.num_envs
        self._set_observation_space(envs)
        self._initialize_policy_rl(load_from_ckpt=os.path.exists(checkpoint_path), ckpt_path=checkpoint_path)

        observations = envs.reset()
        obs_history = {
            "rgb": np.zeros((N,) + self.observation_space["rgb_history"].shape, self.observation_space["rgb_history"].dtype),
            "depth": np.zeros((N,) + self.observation_space["depth_history"].shape, self.observation_space["depth_history"].dtype),
        }
        dev_batch, batch = self._prepare_batch(observations, obs_history)
        rnn_states = self.policy.initial_rnn_states(N)
        prev_actions = {k: jnp.zeros((N, 1), jnp.float32) for k in ("pano", "offset", "distance")}
        not_done_masks = jnp.zeros((N, 1), jnp.float32)
        active = [True] * N

        stats_episodes: Dict[str, Dict] = {}
        rgb_frames: List[List] = [[] for _ in range(N)]
        if len(config.VIDEO_OPTION) > 0:
            os.makedirs(config.VIDEO_DIR, exist_ok=True)
        num_eps = sum(envs.number_of_episodes)
        if config.EVAL.EPISODE_COUNT > -1:
            num_eps = min(config.EVAL.EPISODE_COUNT, num_eps)

        pbar = tqdm.tqdm(total=num_eps, desc=f"eval wpn ckpt {checkpoint_index}")
        while any(active) and len(stats_episodes) < num_eps:
            current_episodes = envs.current_episodes()
            out = self.policy.act(
                dev_batch,
                rnn_states, prev_actions, not_done_masks,
                deterministic=not config.EVAL.SAMPLE, rng=self._next_rng(),
            )
            rnn_states = out["rnn_states"]
            prev_actions = {k: jnp.asarray(v) for k, v in out["action_elements"].items()}
            actions = WaypointPolicy.actions_to_env(out)

            pano_np = np.asarray(out["action_elements"]["pano"]).astype(np.int64).reshape(-1)
            stop_np = np.asarray(out["stop"]).reshape(-1)
            for i in range(N):
                if not stop_np[i]:
                    idx = int(pano_np[i]) % batch["rgb"].shape[1]
                    obs_history["rgb"][i] = batch["rgb"][i, idx]
                    obs_history["depth"][i] = batch["depth"][i, idx]
                else:
                    obs_history["rgb"][i] = 0
                    obs_history["depth"][i] = 0

            active_ids = [i for i in range(N) if active[i]]
            stepped = envs.step_at(active_ids, [actions[i] for i in active_ids])
            masks_np = np.ones((N, 1), np.float32)
            new_obs = list(observations)
            if len(config.VIDEO_OPTION) > 0:
                # ONE host readback + softmax for the whole [N, P+1] batch —
                # a per-env device softmax in the frame loop would pay N
                # dispatch round trips per step
                r_np = np.asarray(out["r"]).reshape(-1)
                th_np = np.asarray(out["theta"]).reshape(-1)
                logits_np = np.asarray(out["pano_stop_logits"], np.float32)
                logits_np = logits_np - logits_np.max(axis=-1, keepdims=True)
                probs_np = np.exp(logits_np)
                probs_np /= probs_np.sum(axis=-1, keepdims=True)
                offset_np = np.asarray(out["action_elements"]["offset"]).reshape(-1)
                offset_mode_np = np.asarray(out["modes"]["offset"]).reshape(-1)
                distance_np = np.asarray(out["action_elements"]["distance"]).reshape(-1)
                distance_mode_np = np.asarray(out["modes"]["distance"]).reshape(-1)
            for i, (obs, _, done, info) in zip(active_ids, stepped):
                new_obs[i] = obs
                if len(config.VIDEO_OPTION) > 0:
                    from vlnce_tpu.utils.video import waypoint_observations_to_image

                    # full debug composition (reference utils.py:380-543):
                    # per-pano probability row, stop gauge, offset/distance
                    # step stats with distribution modes, instruction panel
                    frame = waypoint_observations_to_image(
                        {"rgb": batch["rgb"][i], "depth": batch["depth"][i]}, info,
                        pano=int(pano_np[i]) if not stop_np[i] else None,
                        r=float(r_np[i]), theta=float(th_np[i]),
                        pano_distribution=probs_np[i].reshape(-1),
                        offset=float(offset_np[i]),
                        offset_mode=float(offset_mode_np[i]),
                        distance=float(distance_np[i]),
                        distance_mode=float(distance_mode_np[i]),
                        instruction_text=current_episodes[i].instruction.instruction_text,
                    )
                    rgb_frames[i].append(frame)
                if done:
                    ep_id = current_episodes[i].episode_id
                    stats_episodes[ep_id] = {
                        k: v for k, v in info.items() if np.isscalar(v) and not isinstance(v, str)
                    }
                    masks_np[i] = 0.0
                    pbar.update()
                    if len(config.VIDEO_OPTION) > 0:
                        from vlnce_tpu.utils.video import generate_video

                        generate_video(
                            video_option=config.VIDEO_OPTION, video_dir=config.VIDEO_DIR,
                            images=rgb_frames[i], episode_id=ep_id, checkpoint_idx=checkpoint_index,
                            metrics={"spl": stats_episodes[ep_id].get("spl", 0.0)}, tb_writer=writer,
                        )
                        rgb_frames[i] = []
                    new_obs[i] = envs.reset_at(i)[0]
                    obs_history["rgb"][i] = 0
                    obs_history["depth"][i] = 0
                    next_ep = envs.call_at(i, "current_episode")
                    if next_ep.episode_id in stats_episodes:
                        active[i] = False
            observations = new_obs
            dev_batch, batch = self._prepare_batch(observations, obs_history)
            not_done_masks = jnp.asarray(masks_np)

        envs.close()
        pbar.close()

        aggregated_stats = {}
        if stats_episodes:
            for k in next(iter(stats_episodes.values())).keys():
                aggregated_stats[k] = float(np.mean([v[k] for v in stats_episodes.values()]))
        if config.EVAL.SAVE_RESULTS and stats_episodes:
            with open(fname, "w") as f:
                json.dump(aggregated_stats, f, indent=4)
        logger.info(f"Episodes evaluated: {len(stats_episodes)}")
        for k, v in aggregated_stats.items():
            logger.info(f"{k}: {v:.6f}")
            writer.add_scalar(f"eval_{split}_{k}", v, checkpoint_index + 1)
        return aggregated_stats
