"""Base trainer: shared policy init, checkpointing, eval, and inference.

Covers reference vlnce_baselines/common/base_il_trainer.py:37-630. The eval
loop is TPU-native: the env batch keeps a FIXED size with an active mask —
finished env slots stop being stepped host-side but keep their device slot,
so the jitted act program never recompiles (the reference instead shrinks
every tensor in _pause_envs, base_il_trainer.py:182-217).
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import tqdm

from vlnce_tpu.registry import registry
from vlnce_tpu.envs.batch import batch_obs, stack_obs
from vlnce_tpu.envs.env_utils import (
    construct_envs,
    construct_envs_auto_reset_false,
    get_env_class,
)
from vlnce_tpu.ops.obs_transforms import (
    apply_obs_transforms_batch,
    apply_obs_transforms_obs_space,
    get_active_obs_transforms,
)
from vlnce_tpu.utils.checkpoints import (
    config_from_checkpoint,
    load_checkpoint,
    poll_checkpoint_folder,
    save_checkpoint,
)
from vlnce_tpu.utils.logging import logger
from vlnce_tpu.utils.tensorboard import TensorboardWriter


def is_slurm_batch_job() -> bool:
    """tqdm bars are suppressed under SLURM batch jobs (reference
    base_il_trainer.py:251,310 via habitat is_slurm_batch_job)."""
    return bool(os.environ.get("SLURM_JOB_ID")) and os.environ.get("SLURM_PTY_PORT") is None


class BaseVLNCETrainer:
    def __init__(self, config):
        self.config = config
        self.policy = None
        self.optimizer = None
        self.optim_state = None
        self.obs_transforms = []
        self.start_epoch = 0
        self.step_id = 0
        self.mesh = None  # data-parallel device mesh; set by _initialize_policy
        self._rng = jax.random.PRNGKey(int(config.TASK_CONFIG.SEED))

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # -- spaces ---------------------------------------------------------------
    def _get_spaces(self, config, envs=None) -> Tuple[Any, Any]:
        if envs is not None:
            observation_space = envs.observation_spaces[0]
            action_space = envs.action_spaces[0]
        else:
            env_class = get_env_class(config.ENV_NAME)
            env = env_class(config.clone())
            observation_space = env.observation_space
            action_space = env.action_space
            env.close()
        observation_space = apply_obs_transforms_obs_space(observation_space, self.obs_transforms)
        return observation_space, action_space

    # -- policy ---------------------------------------------------------------
    def _initialize_policy(self, config, load_from_ckpt: bool, observation_space, action_space) -> None:
        policy_cls = registry.get_policy(config.MODEL.policy_name)
        self.policy = policy_cls.from_config(config, observation_space, action_space)
        self.policy.init_params(self._next_rng(), batch_size=1)

        ie = config.MODEL.INSTRUCTION_ENCODER
        if ie.use_pretrained_embeddings and ie.sensor_uuid == "instruction":
            from vlnce_tpu.models.convert import apply_pretrained_embeddings

            self.policy.params, loaded = apply_pretrained_embeddings(self.policy.params, ie.embedding_file)
            if loaded:
                logger.info(f"Loaded pretrained instruction embeddings from {ie.embedding_file}")

        # load DDPPO PointGoal depth weights when the checkpoint is on disk
        ddppo_ckpt = config.MODEL.DEPTH_ENCODER.ddppo_checkpoint
        if ddppo_ckpt not in ("", "NONE") and os.path.exists(ddppo_ckpt):
            import torch

            from vlnce_tpu.models.convert import convert_ddppo_depth_checkpoint

            self.policy.params = convert_ddppo_depth_checkpoint(
                torch.load(ddppo_ckpt, map_location="cpu"), self.policy.params
            )
            logger.info(f"Loaded DDPPO depth encoder weights from {ddppo_ckpt}")

        # Adam over trainable leaves only: frozen ResNets / embedding tables
        # get no moment buffers or update traffic — the reference's
        # torch-Adam-skips-None-grads semantics (base_il_trainer.py:69-70),
        # numerically identical, ~3x less optimizer HBM traffic on CMA
        from vlnce_tpu.parallel.optim import masked_adam

        self.optimizer = masked_adam(config.IL.lr, self.policy.params, config.MODEL)
        self.optim_state = self.optimizer.init(self.policy.params)

        # data-parallel mesh for the jitted train steps (TPU.MESH.DATA:
        # -1 auto, 1 single-device, k>1 fails loudly if unavailable)
        from vlnce_tpu.parallel.mesh import resolve_training_mesh

        self.mesh = resolve_training_mesh(config)
        if self.mesh is not None:
            logger.info(
                f"Data-parallel mesh active: {dict(zip(self.mesh.axis_names, self.mesh.devices.shape))}"
            )

        if load_from_ckpt:
            ckpt_path = config.IL.ckpt_to_load
            ckpt = load_checkpoint(ckpt_path)
            if ckpt.get("__torch__"):
                from vlnce_tpu.models.convert import convert_policy_state_dict

                self.policy.params = convert_policy_state_dict(
                    ckpt["state_dict"], self.policy.params, config.MODEL.policy_name
                )
            else:
                loaded = jax.tree_util.tree_map(jnp.asarray, ckpt["state_dict"])
                init_struct = jax.tree_util.tree_structure(self.policy.params)
                loaded_struct = jax.tree_util.tree_structure(loaded)
                if init_struct != loaded_struct:
                    init_keys = set(str(p) for p, _ in jax.tree_util.tree_flatten_with_path(self.policy.params)[0])
                    ckpt_keys = set(str(p) for p, _ in jax.tree_util.tree_flatten_with_path(loaded)[0])
                    raise ValueError(
                        f"checkpoint param tree does not match the policy "
                        f"({config.MODEL.policy_name}).\n  missing in ckpt: "
                        f"{sorted(init_keys - ckpt_keys)[:5]}\n  unexpected in ckpt: "
                        f"{sorted(ckpt_keys - init_keys)[:5]}"
                    )
                self.policy.params = loaded
            if config.IL.is_requeue and "optim_state" in ckpt:
                # restore_optim_state also migrates pre-masking checkpoints
                # (plain Adam over the full tree) into the MaskedState layout
                from vlnce_tpu.parallel.optim import restore_optim_state

                self.optim_state = restore_optim_state(self.optim_state, ckpt["optim_state"])
                extra = ckpt.get("extra_state") or {}
                self.start_epoch = int(extra.get("epoch", -1)) + 1
                self.step_id = int(extra.get("step_id", 0))
            logger.info(f"Loaded weights from checkpoint: {ckpt_path}")
        logger.info(f"Initialized policy {config.MODEL.policy_name}: {self.policy.num_params()} params")

    def save_checkpoint(self, file_name: str, extra_state: Optional[Dict] = None) -> None:
        # rank-0 gating for pods lives in utils/checkpoints.save_checkpoint
        path = os.path.join(self.config.CHECKPOINT_FOLDER, file_name)
        save_checkpoint(
            path, self.policy.params, config=self.config,
            optim_state=self.optim_state, extra_state=extra_state,
            # serialization + file IO overlap the next training steps; the
            # device snapshot itself is synchronous (params mutate next step)
            async_write=bool(getattr(self.config.TPU, "ASYNC_CHECKPOINT", False)),
        )

    @staticmethod
    def load_checkpoint(checkpoint_path: str, **kwargs) -> Dict:
        return load_checkpoint(checkpoint_path)

    # -- entry points ---------------------------------------------------------
    def train(self) -> None:
        raise NotImplementedError

    def eval(self) -> None:
        """Evaluate either a single checkpoint or every checkpoint in
        EVAL_CKPT_PATH_DIR (reference README.md:251 behavior)."""
        os.makedirs(self.config.RESULTS_DIR, exist_ok=True)
        with TensorboardWriter(self.config.TENSORBOARD_DIR) as writer:
            ckpt_dir = self.config.EVAL_CKPT_PATH_DIR
            if not ckpt_dir:
                raise ValueError(
                    "EVAL_CKPT_PATH_DIR is empty: point it at a checkpoint "
                    "file or a directory of checkpoints to evaluate"
                )
            if os.path.isfile(ckpt_dir) or not os.path.isdir(ckpt_dir):
                self._eval_checkpoint(ckpt_dir, writer, checkpoint_index=0)
                return
            prev_index = -1
            while True:
                ckpt_path = poll_checkpoint_folder(ckpt_dir, prev_index)
                if ckpt_path is None:
                    break
                prev_index += 1
                self._eval_checkpoint(ckpt_path, writer, checkpoint_index=prev_index)

    def _setup_eval_config(self, ckpt: Dict):
        config = None
        if self.config.EVAL.USE_CKPT_CONFIG:
            config = config_from_checkpoint(ckpt)
        if config is None:
            return self.config.clone()
        config = config.defrost() if config.is_frozen() else config
        # overlay current eval/runtime settings on the training-time config
        for key in ("EVAL", "RESULTS_DIR", "VIDEO_OPTION", "VIDEO_DIR", "TENSORBOARD_DIR", "NUM_ENVIRONMENTS", "TPU"):
            if key in self.config:
                config[key] = self.config[key].clone() if hasattr(self.config[key], "clone") else self.config[key]
        return config

    def _make_fused_act_step(self):
        """Obs transforms + policy act as ONE jitted dispatch per env step
        (halves per-step dispatch latency vs transform-then-act)."""
        transforms = self.obs_transforms
        policy = self.policy

        def fn(params, observations, rnn_states, prev_actions, masks, rng, deterministic):
            batch = apply_obs_transforms_batch(observations, transforms)
            return policy._act_impl(params, batch, rnn_states, prev_actions, masks, rng, deterministic)

        return jax.jit(fn, static_argnames=("deterministic",))

    # -- eval -----------------------------------------------------------------
    def _eval_checkpoint(self, checkpoint_path: str, writer, checkpoint_index: int = 0) -> None:
        logger.info(f"checkpoint_path: {checkpoint_path}")
        config = self.config.clone()
        if self.config.EVAL.USE_CKPT_CONFIG and os.path.exists(checkpoint_path):
            try:
                ckpt = load_checkpoint(checkpoint_path)
                config = self._setup_eval_config(ckpt)
            except Exception:
                pass

        split = config.EVAL.SPLIT
        config.defrost()
        config.TASK_CONFIG.DATASET.SPLIT = split
        config.TASK_CONFIG.DATASET.ROLES = ["guide"]
        config.TASK_CONFIG.DATASET.LANGUAGES = config.EVAL.LANGUAGES
        config.TASK_CONFIG.TASK.NDTW.SPLIT = split
        config.TASK_CONFIG.ENVIRONMENT.ITERATOR_OPTIONS.SHUFFLE = False
        config.TASK_CONFIG.ENVIRONMENT.ITERATOR_OPTIONS.MAX_SCENE_REPEAT_STEPS = -1
        config.IL.ckpt_to_load = checkpoint_path
        if len(config.VIDEO_OPTION) > 0 and "TOP_DOWN_MAP_VLNCE" not in config.TASK_CONFIG.TASK.MEASUREMENTS:
            config.TASK_CONFIG.TASK.MEASUREMENTS.append("TOP_DOWN_MAP_VLNCE")
        config.freeze()

        fname = None
        if config.EVAL.SAVE_RESULTS:
            os.makedirs(config.RESULTS_DIR, exist_ok=True)
            fname = os.path.join(config.RESULTS_DIR, f"stats_ckpt_{checkpoint_index}_{split}.json")
            if os.path.exists(fname):
                logger.info("skipping -- evaluation exists.")
                return

        if config.EVAL.ON_DEVICE_SCAN:
            # videos are rendered during the metrics replay (host cameras,
            # only for this checkpoint's episodes) — scan_eval.metrics_from_actions
            from vlnce_tpu.trainers.scan_eval import eval_checkpoint_on_device

            return eval_checkpoint_on_device(
                self, config, checkpoint_path, writer, checkpoint_index, fname
            )

        envs = construct_envs_auto_reset_false(config, get_env_class(config.ENV_NAME))
        self.obs_transforms = get_active_obs_transforms(config)
        observation_space, action_space = self._get_spaces(config, envs=envs)

        load = os.path.exists(checkpoint_path)
        self._initialize_policy(
            config, load_from_ckpt=load,
            observation_space=observation_space, action_space=action_space,
        )

        N = envs.num_envs
        observations = envs.reset()
        obs_host = stack_obs(observations)
        rnn_states = self.policy.initial_rnn_states(N)
        prev_actions = jnp.zeros((N, 1), jnp.int32)
        not_done_masks = jnp.zeros((N, 1), jnp.float32)
        active = [True] * N

        stats_episodes: Dict[str, Dict] = {}
        rgb_frames: List[List] = [[] for _ in range(N)]
        if len(config.VIDEO_OPTION) > 0:
            os.makedirs(config.VIDEO_DIR, exist_ok=True)

        num_eps = sum(envs.number_of_episodes)
        if config.EVAL.EPISODE_COUNT > -1:
            num_eps = min(config.EVAL.EPISODE_COUNT, num_eps)

        pbar = tqdm.tqdm(total=num_eps, desc=f"eval ckpt {checkpoint_index}", disable=is_slurm_batch_job())
        start_time = time.time()
        pth_time = env_time = 0.0

        fused_step = self._make_fused_act_step()
        while any(active) and len(stats_episodes) < num_eps:
            current_episodes = envs.current_episodes()

            t0 = time.time()
            actions, rnn_states = fused_step(
                self.policy.params, {k: jnp.asarray(v) for k, v in obs_host.items()},
                rnn_states, prev_actions, not_done_masks,
                self._next_rng(), not config.EVAL.SAMPLE,
            )
            prev_actions = actions
            actions_np = np.asarray(actions).reshape(-1)
            pth_time += time.time() - t0

            # step only active envs, host-side (pipelined across workers)
            t0 = time.time()
            active_ids = [i for i in range(N) if active[i]]
            stepped = envs.step_at(active_ids, [int(actions_np[i]) for i in active_ids])
            results = {i: (obs, done, info) for i, (obs, _, done, info) in zip(active_ids, stepped)}
            env_time += time.time() - t0

            masks_np = np.ones((N, 1), np.float32)
            for i in active_ids:
                obs, done, info = results[i]
                if len(config.VIDEO_OPTION) > 0:
                    from vlnce_tpu.utils.video import observations_to_image, append_text_to_image

                    frame = observations_to_image(obs, info)
                    frame = append_text_to_image(frame, current_episodes[i].instruction.instruction_text)
                    rgb_frames[i].append(frame)
                if done:
                    ep_id = current_episodes[i].episode_id
                    info.pop("top_down_map_vlnce", None) if len(config.VIDEO_OPTION) == 0 else None
                    stats_episodes[ep_id] = {k: v for k, v in info.items() if np.isscalar(v) or isinstance(v, (int, float))}
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

                    # advance env i; deactivate if its next episode is already done
                    obs = envs.reset_at(i)[0]
                    next_ep = envs.call_at(i, "current_episode")
                    if next_ep.episode_id in stats_episodes:
                        active[i] = False
                for k, v in obs.items():
                    obs_host[k][i] = np.asarray(v)

            not_done_masks = jnp.asarray(masks_np)

        envs.close()
        pbar.close()

        # per-episode stats retained for tests/diagnostics (episode-set parity)
        self._last_eval_episode_stats = stats_episodes

        aggregated_stats = {}
        if stats_episodes:
            for k in next(iter(stats_episodes.values())).keys():
                aggregated_stats[k] = float(np.mean([v[k] for v in stats_episodes.values()]))

        if config.EVAL.SAVE_RESULTS and stats_episodes:
            with open(fname, "w") as f:
                json.dump(aggregated_stats, f, indent=4)

        logger.info(f"Episodes evaluated: {len(stats_episodes)}")
        logger.info(f"pth_time: {pth_time:.1f}s env_time: {env_time:.1f}s total: {time.time() - start_time:.1f}s")
        for k, v in aggregated_stats.items():
            logger.info(f"{k}: {v:.6f}")
            writer.add_scalar(f"eval_{split}_{k}", v, checkpoint_index + 1)
        return aggregated_stats

    # -- inference ------------------------------------------------------------
    def inference(self) -> None:
        """Run a checkpoint on the inference split and write predictions
        (reference base_il_trainer.py:433-630; r2r JSON / rxr JSONL)."""
        config = self.config.clone()
        ckpt_path = config.INFERENCE.CKPT_PATH
        if config.INFERENCE.USE_CKPT_CONFIG and os.path.exists(ckpt_path):
            try:
                ckpt = load_checkpoint(ckpt_path)
                cfg = config_from_checkpoint(ckpt)
                if cfg is not None:
                    inference_cfg = config.INFERENCE.clone()
                    config = cfg.defrost() if cfg.is_frozen() else cfg
                    config.INFERENCE = inference_cfg
            except Exception:
                pass
        config.defrost()
        config.TASK_CONFIG.DATASET.SPLIT = config.INFERENCE.SPLIT
        config.TASK_CONFIG.DATASET.ROLES = ["guide"]
        config.TASK_CONFIG.DATASET.LANGUAGES = config.INFERENCE.LANGUAGES
        config.TASK_CONFIG.ENVIRONMENT.ITERATOR_OPTIONS.SHUFFLE = False
        config.TASK_CONFIG.ENVIRONMENT.ITERATOR_OPTIONS.MAX_SCENE_REPEAT_STEPS = -1
        config.IL.ckpt_to_load = ckpt_path
        config.TASK_CONFIG.TASK.MEASUREMENTS = []
        config.TASK_CONFIG.TASK.SENSORS = [
            s for s in config.TASK_CONFIG.TASK.SENSORS if "INSTRUCTION" in s
        ]
        config.ENV_NAME = "VLNCEInferenceEnv"
        config.freeze()

        if config.INFERENCE.ON_DEVICE_SCAN:
            from vlnce_tpu.trainers.scan_eval import inference_on_device

            inference_on_device(self, config)
            return

        envs = construct_envs_auto_reset_false(config, get_env_class(config.ENV_NAME))
        self.obs_transforms = get_active_obs_transforms(config)
        observation_space, action_space = self._get_spaces(config, envs=envs)
        self._initialize_policy(
            config, load_from_ckpt=os.path.exists(ckpt_path),
            observation_space=observation_space, action_space=action_space,
        )

        N = envs.num_envs
        observations = envs.reset()
        obs_host = stack_obs(observations)
        rnn_states = self.policy.initial_rnn_states(N)
        prev_actions = jnp.zeros((N, 1), jnp.int32)
        not_done_masks = jnp.zeros((N, 1), jnp.float32)
        active = [True] * N

        episode_predictions = defaultdict(list)
        # episode ID --> instruction ID for rxr predictions format
        instruction_ids: Dict[str, str] = {}

        # populate episode_predictions with the starting state
        current_episodes = envs.current_episodes()
        infos = [envs.call_at(i, "get_info", [None]) for i in range(N)]
        for i in range(N):
            episode_predictions[current_episodes[i].episode_id].append(infos[i])
            if config.INFERENCE.FORMAT == "rxr":
                ep_id = current_episodes[i].episode_id
                k = getattr(current_episodes[i].instruction, "instruction_id", None) or ep_id
                instruction_ids[ep_id] = int(k) if str(k).isdigit() else k

        fused_step = self._make_fused_act_step()
        with tqdm.tqdm(total=sum(envs.number_of_episodes), desc="inference", disable=is_slurm_batch_job()) as pbar:
            while any(active):
                current_episodes = envs.current_episodes()
                actions, rnn_states = fused_step(
                    self.policy.params, {k: jnp.asarray(v) for k, v in obs_host.items()},
                    rnn_states, prev_actions, not_done_masks,
                    self._next_rng(), not config.INFERENCE.SAMPLE,
                )
                prev_actions = actions
                actions_np = np.asarray(actions).reshape(-1)

                masks_np = np.ones((N, 1), np.float32)
                active_ids = [j for j in range(N) if active[j]]
                stepped = envs.step_at(active_ids, [int(actions_np[j]) for j in active_ids])
                for i, (obs, _, done, info) in zip(active_ids, stepped):
                    episode_predictions[current_episodes[i].episode_id].append(info)
                    if done:
                        masks_np[i] = 0.0
                        pbar.update()
                        obs = envs.reset_at(i)[0]
                        next_ep = envs.call_at(i, "current_episode")
                        if next_ep.episode_id in episode_predictions and len(episode_predictions[next_ep.episode_id]) > 1:
                            active[i] = False
                        else:
                            ep_id = next_ep.episode_id
                            episode_predictions[ep_id].append(envs.call_at(i, "get_info", [None]))
                            if config.INFERENCE.FORMAT == "rxr":
                                k = getattr(next_ep.instruction, "instruction_id", None) or ep_id
                                instruction_ids[ep_id] = int(k) if str(k).isdigit() else k
                    for k, v in obs.items():
                        obs_host[k][i] = np.asarray(v)
                not_done_masks = jnp.asarray(masks_np)

        envs.close()
        self._write_predictions(config, episode_predictions, instruction_ids)

    def _write_predictions(self, config, episode_predictions, instruction_ids) -> None:
        out_path = config.INFERENCE.PREDICTIONS_FILE
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        if config.INFERENCE.FORMAT == "r2r":
            with open(out_path, "w") as f:
                json.dump({k: v for k, v in episode_predictions.items()}, f, indent=2)
        else:  # rxr jsonl guide format
            predictions_out = []
            for ep_id, preds in episode_predictions.items():
                path = [p["position"] for p in preds]
                # RxR format: no consecutive duplicates
                deduped = [path[0]]
                for p in path[1:]:
                    if p != deduped[-1]:
                        deduped.append(p)
                predictions_out.append(
                    {"instruction_id": instruction_ids.get(ep_id, ep_id), "path": deduped}
                )
            with open(out_path, "w") as f:
                for entry in predictions_out:
                    f.write(json.dumps(entry) + "\n")
        logger.info(f"Predictions saved to: {out_path}")
