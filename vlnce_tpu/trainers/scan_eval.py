"""On-device closed-loop evaluation: env + policy as one `lax.scan`.

The host eval loop (base_trainer._eval_checkpoint) crosses the host<->device
boundary every step: render on host, act on device, step on host. With the
device-resident grid world (envs/device_sim.py) the WHOLE closed loop —
render -> obs transforms -> policy act -> collision-filtered step — runs as
a single jitted scan segment, so per-step dispatch latency (the dominant
cost on remote-attached chips, PERFORMANCE.md) disappears entirely.

Enabled by `EVAL.ON_DEVICE_SCAN = True`; requires the GridWorldSim-v0
simulator (Habitat-class C++ sims are host-bound by nature — this path is
the TPU-native capability the reference architecture cannot express).

Metrics are the production ones: the recorded device action sequences are
replayed through the host VLNTask measure machinery (zero cameras, so no
rendering cost) — every measure (SPL/nDTW/oracle family) is computed by the
exact same code as the host eval loop, reference base_il_trainer.py:416-431.
"""

from __future__ import annotations

import json
import math
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import tqdm

from vlnce_tpu.envs.scene_import import (
    apply_scene_geometry as _apply_scene_geometry,
)
from vlnce_tpu.envs.device_sim import (
    SceneBatch,
    build_scene_batch,
    camera_specs_from_config,
    progress_batch,
    render_batch,
    step_batch,
    step_tilt,
)
from vlnce_tpu.ops.obs_transforms import apply_obs_transforms_batch
from vlnce_tpu.tasks.datasets import make_dataset
from vlnce_tpu.tasks.geometry import heading_from_quaternion
from vlnce_tpu.tasks.sensors import MAX_INSTRUCTION_LEN
from vlnce_tpu.utils.logging import logger

_R2R_ACTIONS = ["STOP", "MOVE_FORWARD", "TURN_LEFT", "TURN_RIGHT"]
_RXR_ACTIONS = _R2R_ACTIONS + ["LOOK_UP", "LOOK_DOWN"]


def _check_supported(config) -> None:
    sim_type = config.TASK_CONFIG.SIMULATOR.TYPE
    if sim_type != "GridWorldSim-v0":
        raise ValueError(
            f"EVAL.ON_DEVICE_SCAN requires the device-resident grid world "
            f"(SIMULATOR.TYPE=GridWorldSim-v0), got {sim_type!r}. Host-bound "
            f"simulators cannot run inside the jitted scan — use the host "
            f"eval loop instead."
        )
    actions = list(config.TASK_CONFIG.TASK.POSSIBLE_ACTIONS)
    if actions not in (_R2R_ACTIONS, _RXR_ACTIONS):
        raise ValueError(
            f"EVAL.ON_DEVICE_SCAN supports the discrete R2R action space "
            f"{_R2R_ACTIONS} or the RxR space {_RXR_ACTIONS}, got {actions}"
        )


def _episode_batch_arrays(
    episodes, instr_uuid: str = "instruction", task_cfg=None
) -> Dict[str, np.ndarray]:
    """Start poses + the policy's instruction input per episode. R2R models
    consume zero-padded token ids; RxR models (sensor_uuid
    "rxr_instruction") consume the precomputed BERT features, loaded by the
    same sensor code as the host path (tasks/sensors.py RxRInstructionSensor)."""
    pos = np.zeros((len(episodes), 3), np.float32)
    heading = np.zeros((len(episodes),), np.float32)
    for i, ep in enumerate(episodes):
        pos[i] = np.asarray(ep.start_position, np.float32)
        heading[i] = heading_from_quaternion(np.asarray(ep.start_rotation, np.float64))

    if instr_uuid == "instruction":
        instr = np.zeros((len(episodes), MAX_INSTRUCTION_LEN), np.int32)
        for i, ep in enumerate(episodes):
            tokens = ep.instruction.instruction_tokens or []
            n = min(len(tokens), MAX_INSTRUCTION_LEN)
            instr[i, :n] = np.asarray(tokens[:n], np.int32)
    else:
        from vlnce_tpu.tasks.sensors import RxRInstructionSensor

        sensor = RxRInstructionSensor(config=task_cfg.TASK.RXR_INSTRUCTION_SENSOR)
        instr = np.stack([sensor.get_observation(episode=ep) for ep in episodes])
    return {"instruction": instr, "pos": pos, "heading": heading}


def _build_segment_fn(
    policy, transforms, specs, sim_cfg, deterministic: bool, seg_len: int,
    instr_uuid: str = "instruction", use_tilt: bool = False,
    batch_size: int = 0, bank_shapes=None, bank_max_dist: float = 0.0,
):
    """Jitted closed-loop segment: `seg_len` env steps as ONE dispatch.
    `use_tilt` enables the RxR LOOK_UP/DOWN axis; with it off the tilt carry
    slot stays inert and the renderer compiles the horizon shift away.

    With `bank_shapes` = (rgb_shape, depth_shape), the per-step raycast is
    replaced by a precomputed-feature-bank lookup (data/feature_bank.py):
    the segment takes (node_pos, rgb, depth) bank arrays in place of being
    render-driven, and the policy consumes rgb_features/depth_features
    directly (the encoders' precompute bypass,
    models/encoders/visual_wrappers.py:59,114). This is how real MP3D
    scenes ride the device-resident loop."""
    forward_step = float(sim_cfg.FORWARD_STEP_SIZE)
    turn_angle = math.radians(float(sim_cfg.TURN_ANGLE))
    tilt_angle = math.radians(float(getattr(sim_cfg, "TILT_ANGLE", sim_cfg.TURN_ANGLE)))
    allow_sliding = bool(sim_cfg.HABITAT_SIM_V0.ALLOW_SLIDING)

    def segment(params, scenes: SceneBatch, instruction, carry, rng, bank=None):
        pos, heading, tilt, rnn, prev_actions, done, t0 = carry

        def body(c, i):
            pos, heading, tilt, rnn, prev_a, done = c
            if bank_shapes is not None:
                from vlnce_tpu.data.feature_bank import (
                    FeatureBankBatch, lookup_features,
                )

                obs = lookup_features(
                    FeatureBankBatch(*bank, *bank_shapes), pos, heading,
                    max_dist=bank_max_dist,
                )
            else:
                obs = render_batch(
                    scenes, pos, heading, specs, tilt=tilt if use_tilt else None
                )
            obs[instr_uuid] = instruction
            obs["progress"] = progress_batch(scenes, pos)
            batch = apply_obs_transforms_batch(obs, transforms)
            g = t0 + i
            mask = jnp.where(g == 0, 0.0, 1.0) * jnp.ones((pos.shape[0], 1), jnp.float32)
            action, rnn2 = policy._act_impl(
                params, batch, rnn, prev_a, mask, jax.random.fold_in(rng, g), deterministic
            )
            a = jnp.where(done, 0, action.reshape(-1).astype(jnp.int32))
            new_done = done | (a == 0)
            pos2, heading2 = step_batch(
                scenes, pos, heading, a, forward_step, turn_angle, allow_sliding
            )
            tilt2 = step_tilt(tilt, a, tilt_angle) if use_tilt else tilt
            pos2 = jnp.where(done[:, None], pos, pos2)
            heading2 = jnp.where(done, heading, heading2)
            tilt2 = jnp.where(done, tilt, tilt2)
            return (pos2, heading2, tilt2, rnn2, action.astype(jnp.int32), new_done), a

        (pos, heading, tilt, rnn, prev_actions, done), actions = jax.lax.scan(
            body, (pos, heading, tilt, rnn, prev_actions, done), jnp.arange(seg_len)
        )
        return (pos, heading, tilt, rnn, prev_actions, done, t0 + seg_len), actions

    mesh = _eval_mesh(policy, batch_size)
    if mesh is None:
        return jax.jit(segment, static_argnames=())

    # pjit over the data mesh: episodes are independent, so the whole scan
    # shards over the env axis (the scene tensors too — every SceneBatch
    # leaf is [B, ...], and so is every bank array); eval throughput scales
    # linearly with chips
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vlnce_tpu.parallel.mesh import DATA_AXIS

    repl = NamedSharding(mesh, P())
    env0 = NamedSharding(mesh, P(DATA_AXIS))
    scenes_s = SceneBatch(*(env0 for _ in SceneBatch._fields))
    carry_s = (env0, env0, env0, env0, env0, env0, repl)  # t0 replicated
    shardings = (repl, scenes_s, env0, carry_s, repl)
    if bank_shapes is not None:
        shardings = shardings + ((env0, env0, env0),)
    return jax.jit(segment, in_shardings=shardings)


def _eval_mesh(policy, batch_size: int):
    """Data mesh for sharded scan-eval, or None. Resolved from the policy's
    config (TPU.MESH.DATA); like the rollout collector, an auto mesh that
    SCAN_BATCH doesn't divide shrinks to the largest divisor."""
    if batch_size <= 0:
        return None
    cfg = getattr(policy, "config", None)
    if cfg is None or not hasattr(cfg, "TPU"):
        return None
    from vlnce_tpu.parallel.mesh import resolve_training_mesh, shrink_mesh_for_batch

    return shrink_mesh_for_batch(
        resolve_training_mesh(cfg), batch_size, tag="scan-eval"
    )


def run_scan_rollouts(
    policy,
    transforms,
    config,
    episodes: List,
    rng,
    progress_cb=None,
) -> List[np.ndarray]:
    """Run closed-loop rollouts for `episodes` on device; returns the action
    sequence (up to and including STOP, or the step cap) per episode."""
    task_cfg = config.TASK_CONFIG
    _apply_scene_geometry(task_cfg.SIMULATOR)  # real-scene grids, if configured
    specs = camera_specs_from_config(task_cfg.SIMULATOR)
    T_max = int(task_cfg.ENVIRONMENT.MAX_EPISODE_STEPS)
    B = max(1, int(config.EVAL.SCAN_BATCH))
    seg_len = max(1, min(int(config.EVAL.SCAN_SEGMENT), T_max))
    deterministic = not bool(config.EVAL.SAMPLE)
    instr_uuid = str(getattr(config.MODEL.INSTRUCTION_ENCODER, "sensor_uuid", "instruction"))

    bank_dir = str(getattr(config.TPU, "FEATURE_BANK_DIR", "") or "")
    bank_max_dist = float(getattr(config.TPU, "FEATURE_BANK_MAX_DIST", 0.0) or 0.0)
    bank_shapes = None
    if bank_dir:
        from vlnce_tpu.data.feature_bank import check_bank_coverage, load_bank_shapes

        # metadata-only probe: no feature arrays loaded, nothing device_put
        bank_shapes = load_bank_shapes(bank_dir, episodes[0])
        check_bank_coverage(bank_dir, episodes, bank_max_dist)

    segment_fn = _build_segment_fn(
        policy, transforms, specs, task_cfg.SIMULATOR, deterministic, seg_len,
        instr_uuid=instr_uuid,
        use_tilt="LOOK_UP" in list(task_cfg.TASK.POSSIBLE_ACTIONS),
        batch_size=B, bank_shapes=bank_shapes, bank_max_dist=bank_max_dist,
    )

    all_actions: List[np.ndarray] = []
    for lo in range(0, len(episodes), B):
        chunk = episodes[lo : lo + B]
        real = len(chunk)
        # pad the final chunk so the compiled program shape is reused
        chunk = chunk + [chunk[-1]] * (B - real)
        arrays = _episode_batch_arrays(chunk, instr_uuid=instr_uuid, task_cfg=task_cfg)
        rnn0 = np.zeros(
            (B, policy.num_recurrent_layers, policy.hidden_size), np.float32
        )
        # ONE device_put for the per-chunk host arrays — eager per-array
        # uploads pay a full round trip each on remote-attached chips
        instruction, carry = jax.device_put((
            arrays["instruction"],
            (
                arrays["pos"], arrays["heading"],
                np.zeros((B,), np.float32),  # tilt
                rnn0, np.zeros((B, 1), np.int32), np.zeros((B,), bool),
                np.int32(0),
            ),
        ))
        scenes = build_scene_batch(chunk)
        seg_extra = ()
        if bank_shapes is not None:
            from vlnce_tpu.data.feature_bank import load_bank_batch

            bank = load_bank_batch(bank_dir, chunk)
            if (bank.rgb_shape, bank.depth_shape) != bank_shapes:
                raise ValueError(
                    f"feature-bank shapes changed across chunks: "
                    f"{(bank.rgb_shape, bank.depth_shape)} vs {bank_shapes}"
                )
            seg_extra = ((bank.node_pos, bank.rgb, bank.depth),)
        rng, chunk_rng = jax.random.split(rng)
        collected = []
        t = 0
        while t < T_max:
            carry, actions = segment_fn(policy.params, scenes, instruction, carry, chunk_rng, *seg_extra)
            collected.append(np.asarray(actions))  # [seg_len, B]
            t += seg_len
            if bool(np.asarray(carry[5]).all()):  # done flags
                break  # every episode in the chunk has called STOP
        acts = np.concatenate(collected, axis=0)[:T_max]  # [<=T_max, B]
        for i in range(real):
            seq = acts[:, i]
            stops = np.flatnonzero(seq == 0)
            end = int(stops[0]) + 1 if len(stops) else len(seq)
            all_actions.append(seq[:end])
            if progress_cb is not None:
                progress_cb()
    return all_actions


def metrics_from_actions(
    config,
    episodes: List,
    action_seqs: List[np.ndarray],
    writer=None,
    checkpoint_index: int = 0,
) -> Dict[str, Dict]:
    """Replay recorded actions through the host measure machinery. With no
    VIDEO_OPTION the replay runs with zero cameras (no rendering cost);
    otherwise the cameras stay attached and per-step frames are composed and
    written exactly like the host eval loop's (base_trainer.py:310-332).
    Produces the per-episode info dicts the host eval loop records."""
    from vlnce_tpu.registry import registry
    from vlnce_tpu.tasks.task import VLNTask

    video = list(getattr(config, "VIDEO_OPTION", []) or [])
    task_cfg = config.TASK_CONFIG.clone()
    task_cfg.defrost()
    if not video:
        task_cfg.SIMULATOR.AGENT_0.SENSORS = []
    task_cfg.TASK.SENSORS = []
    task_cfg.freeze()
    sim_cls = registry.get_simulator(task_cfg.SIMULATOR.TYPE)
    sim = sim_cls(task_cfg.SIMULATOR)
    task = VLNTask(task_cfg.TASK, sim)
    max_steps = int(task_cfg.ENVIRONMENT.MAX_EPISODE_STEPS)

    stats: Dict[str, Dict] = {}
    for ep, seq in zip(episodes, action_seqs):
        sim.reconfigure(ep.scene_id)
        sim.reset()
        sim.set_agent_state(ep.start_position, ep.start_rotation)
        task.reset(ep)
        steps = 0
        frames = []
        for a in seq:
            obs = task.step(int(a), ep)
            steps += 1
            if video:
                from vlnce_tpu.utils.video import (
                    append_text_to_image, observations_to_image,
                )

                frame = observations_to_image(obs, task.measurements.get_metrics())
                frames.append(
                    append_text_to_image(frame, ep.instruction.instruction_text)
                )
            if task.is_stop_called or steps >= max_steps:
                break
        metrics = task.measurements.get_metrics()
        stats[ep.episode_id] = {
            k: v for k, v in metrics.items() if np.isscalar(v) or isinstance(v, (int, float))
        }
        if video:
            from vlnce_tpu.utils.video import generate_video

            generate_video(
                video_option=video, video_dir=config.VIDEO_DIR, images=frames,
                episode_id=ep.episode_id, checkpoint_idx=checkpoint_index,
                metrics={"spl": stats[ep.episode_id].get("spl", 0.0)},
                tb_writer=writer,
            )
    return stats


def infos_from_actions(config, episodes: List, action_seqs: List[np.ndarray]) -> Dict[str, List[Dict]]:
    """Replay recorded actions, recording the inference info dict (position /
    heading / stop) at the start state and after every step — exactly the
    per-step payload the host inference loop collects from
    VLNCEInferenceEnv.get_info (rl_envs.py:110-117; reference
    environments.py:35-59)."""
    from vlnce_tpu.registry import registry
    from vlnce_tpu.tasks.task import VLNTask

    task_cfg = config.TASK_CONFIG.clone()
    task_cfg.defrost()
    task_cfg.SIMULATOR.AGENT_0.SENSORS = []
    task_cfg.TASK.SENSORS = []
    task_cfg.TASK.MEASUREMENTS = []
    task_cfg.freeze()
    sim_cls = registry.get_simulator(task_cfg.SIMULATOR.TYPE)
    sim = sim_cls(task_cfg.SIMULATOR)
    task = VLNTask(task_cfg.TASK, sim)
    max_steps = int(task_cfg.ENVIRONMENT.MAX_EPISODE_STEPS)

    def info() -> Dict:
        state = sim.get_agent_state()
        return {
            "position": [float(x) for x in state.position],
            "heading": heading_from_quaternion(state.rotation),
            "stop": task.is_stop_called,
        }

    preds: Dict[str, List[Dict]] = {}
    for ep, seq in zip(episodes, action_seqs):
        sim.reconfigure(ep.scene_id)
        sim.reset()
        sim.set_agent_state(ep.start_position, ep.start_rotation)
        task.reset(ep)
        infos = [info()]
        steps = 0
        for a in seq:
            task.step(int(a), ep)
            infos.append(info())
            steps += 1
            if task.is_stop_called or steps >= max_steps:
                break
        preds[ep.episode_id] = infos
    return preds


def inference_on_device(trainer, config) -> None:
    """Scan-inference drop-in for BaseVLNCETrainer.inference's env loop:
    closed-loop action collection on device, pose trace via host replay,
    predictions written in the same r2r/rxr formats."""
    from vlnce_tpu.ops.obs_transforms import get_active_obs_transforms

    _check_supported(config)

    dataset = make_dataset(config.TASK_CONFIG.DATASET.TYPE, config.TASK_CONFIG.DATASET)
    episodes = list(dataset.episodes)

    trainer.obs_transforms = get_active_obs_transforms(config)
    observation_space, action_space = trainer._get_spaces(config)
    trainer._initialize_policy(
        config, load_from_ckpt=os.path.exists(config.IL.ckpt_to_load),
        observation_space=observation_space, action_space=action_space,
    )

    # the scan rollout honors EVAL.SAMPLE; inference's sampling flag lives in
    # INFERENCE.SAMPLE — mirror it over
    run_cfg = config.clone()
    run_cfg.defrost()
    run_cfg.EVAL.SAMPLE = bool(config.INFERENCE.SAMPLE)
    run_cfg.freeze()

    pbar = tqdm.tqdm(total=len(episodes), desc="scan-inference")
    action_seqs = run_scan_rollouts(
        trainer.policy, trainer.obs_transforms, run_cfg, episodes,
        trainer._next_rng(), progress_cb=pbar.update,
    )
    pbar.close()

    episode_predictions = infos_from_actions(config, episodes, action_seqs)
    instruction_ids: Dict[str, str] = {}
    if config.INFERENCE.FORMAT == "rxr":
        for ep in episodes:
            k = getattr(ep.instruction, "instruction_id", None) or ep.episode_id
            instruction_ids[ep.episode_id] = int(k) if str(k).isdigit() else k
    trainer._write_predictions(config, episode_predictions, instruction_ids)


def eval_checkpoint_on_device(
    trainer, config, checkpoint_path: str, writer, checkpoint_index: int,
    stats_fname: Optional[str],
) -> Dict[str, float]:
    """Scan-eval drop-in for BaseVLNCETrainer._eval_checkpoint's env loop."""
    from vlnce_tpu.ops.obs_transforms import get_active_obs_transforms

    _check_supported(config)

    dataset = make_dataset(config.TASK_CONFIG.DATASET.TYPE, config.TASK_CONFIG.DATASET)
    episodes = list(dataset.episodes)
    if config.EVAL.EPISODE_COUNT > -1:
        episodes = episodes[: config.EVAL.EPISODE_COUNT]

    trainer.obs_transforms = get_active_obs_transforms(config)
    observation_space, action_space = trainer._get_spaces(config)
    trainer._initialize_policy(
        config, load_from_ckpt=os.path.exists(checkpoint_path),
        observation_space=observation_space, action_space=action_space,
    )

    start = time.time()
    pbar = tqdm.tqdm(total=len(episodes), desc=f"scan-eval ckpt {checkpoint_index}")
    action_seqs = run_scan_rollouts(
        trainer.policy, trainer.obs_transforms, config, episodes,
        trainer._next_rng(), progress_cb=pbar.update,
    )
    pbar.close()
    device_time = time.time() - start

    stats_episodes = metrics_from_actions(
        config, episodes, action_seqs, writer=writer, checkpoint_index=checkpoint_index
    )
    trainer._last_eval_episode_stats = stats_episodes

    aggregated: Dict[str, float] = {}
    if stats_episodes:
        for k in next(iter(stats_episodes.values())).keys():
            aggregated[k] = float(np.mean([v[k] for v in stats_episodes.values()]))

    if stats_fname is not None and stats_episodes:
        with open(stats_fname, "w") as f:
            json.dump(aggregated, f, indent=4)

    split = config.EVAL.SPLIT
    steps = sum(len(s) for s in action_seqs)
    logger.info(
        f"Episodes evaluated (on-device scan): {len(stats_episodes)}; "
        f"{steps} env steps in {device_time:.1f}s device+replay "
        f"({steps / max(device_time, 1e-9):.0f} steps/s)"
    )
    for k, v in aggregated.items():
        logger.info(f"{k}: {v:.6f}")
        writer.add_scalar(f"eval_{split}_{k}", v, checkpoint_index + 1)
    return aggregated
