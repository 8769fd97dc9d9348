"""On-device waypoint dynamics/reward parity + full on-device PPO training.

Strategy mirrors test_device_sim.py: the device GO_TOWARD_POINT and the
shaped waypoint reward must match the host task action / reward measure on
identical transitions, and the end-to-end on-device trainer must learn
(params move) without ever constructing an env pool.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vlnce_tpu.tasks  # noqa: F401
import vlnce_tpu.models  # noqa: F401
import vlnce_tpu.trainers  # noqa: F401
from vlnce_tpu.config import get_config
from vlnce_tpu.envs import ensure_registered
from vlnce_tpu.envs import rl_envs  # noqa: F401
from vlnce_tpu.envs.gridworld import GridWorldSim, get_scene
from vlnce_tpu.envs import device_sim as ds
from vlnce_tpu.registry import registry
from vlnce_tpu.tasks.geometry import heading_from_quaternion, quat_from_heading

ensure_registered()

IMG = 16


def _waypoint_cfg(tmp="/tmp", extra=None):
    opts = [
        "BASE_TASK_CONFIG_PATH", "vlnce_tpu/tasks/config/vlnce_waypoint_task.yaml",
        "TASK_CONFIG.DATASET.TYPE", "Synthetic-VLN-v0",
        "TASK_CONFIG.DATASET.NUM_EPISODES", 6,
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", 8,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", IMG,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", IMG,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", IMG,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", IMG,
        "ENV_NAME", "VLNCEWaypointEnv",
        "NUM_ENVIRONMENTS", 2,
        "TENSORBOARD_DIR", "",
        "CHECKPOINT_FOLDER", f"{tmp}/ckpts",
        "RESULTS_DIR", f"{tmp}/evals",
        "RL.POLICY.OBS_TRANSFORMS.ENABLED_TRANSFORMS", "[ObsStack]",
        "MODEL.policy_name", "WaypointPolicy",
        "MODEL.DEPTH_ENCODER.backbone", "resnet18",
        "MODEL.RGB_ENCODER.cnn_type", "TorchVisionResNet18",
        "MODEL.RGB_ENCODER.output_size", 64,
        "MODEL.STATE_ENCODER.hidden_size", 64,
        "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False,
        "MODEL.INSTRUCTION_ENCODER.vocab_size", 64,
        "MODEL.INSTRUCTION_ENCODER.bidirectional", True,
        "MODEL.INSTRUCTION_ENCODER.final_state_only", False,
    ]
    return get_config(opts=opts + (extra or []))


def _host_sim(scene_id="synth_scene_0"):
    cfg = _waypoint_cfg().TASK_CONFIG.SIMULATOR
    sim = GridWorldSim(cfg)
    sim.reconfigure(scene_id)
    return sim


@pytest.mark.slow  # >25s compile-heavy; full tier: pytest -m ""
def test_waypoint_step_parity():
    """Device GO_TOWARD_POINT matches the host task action: blocked targets,
    snapping, and the rotate-toward-target heading."""
    from vlnce_tpu.tasks.task import VLNTask

    cfg = _waypoint_cfg()
    task_cfg = cfg.TASK_CONFIG.clone()
    task_cfg.defrost()
    task_cfg.SIMULATOR.AGENT_0.SENSORS = []
    task_cfg.TASK.SENSORS = []
    task_cfg.TASK.MEASUREMENTS = []
    task_cfg.freeze()
    sim = GridWorldSim(task_cfg.SIMULATOR)
    sim.reconfigure("synth_scene_0")
    task = VLNTask(task_cfg.TASK, sim)
    action = task.actions["GO_TOWARD_POINT"]

    occ = jnp.asarray(get_scene("synth_scene_0").occupancy)
    nearest = jnp.asarray(ds.nearest_free_cell_map("synth_scene_0"))
    max_samples = max(2, int(math.ceil(4.0 / (0.25 * 0.25))) + 1)

    rng = np.random.RandomState(3)
    checked = 0
    for _ in range(60):
        start = np.array([rng.uniform(1.5, 14.5), 0.0, rng.uniform(1.5, 14.5)])
        if not sim.is_navigable(start):
            continue
        heading = float(rng.uniform(0, 2 * np.pi))
        r = float(rng.uniform(0.25, 4.0))
        theta = float(rng.uniform(0, 2 * np.pi))

        sim.set_agent_state(start, quat_from_heading(heading))
        action.step(r=r, theta=theta)
        host_state = sim.get_agent_state()

        dev_pos, dev_heading = ds.waypoint_step(
            occ, nearest,
            jnp.asarray(start, jnp.float32), jnp.asarray(heading, jnp.float32),
            jnp.asarray(r, jnp.float32), jnp.asarray(theta, jnp.float32),
            rotate_agent=True, max_samples=max_samples, allow_sliding=False,
        )
        np.testing.assert_allclose(np.asarray(dev_pos), host_state.position, atol=3e-4)
        host_heading = heading_from_quaternion(host_state.rotation)
        dh = (float(dev_heading) - host_heading + math.pi) % (2 * math.pi) - math.pi
        assert abs(dh) < 1e-4
        checked += 1
    assert checked > 40


def test_waypoint_reward_parity():
    """Device reward matches the host VLNCEWaypointEnv reward on the same
    transitions (slack scaling, distance delta, success bonus, STOP)."""
    env_cls = registry.get_env("VLNCEWaypointEnv")
    cfg = _waypoint_cfg()
    env = env_cls(cfg.clone())
    obs = env.reset()
    ep = env._env.current_episode

    scene = get_scene(ep.scene_id)
    g = np.asarray(ep.goals[0].position, np.float64)
    field = scene.distance_field(scene.world_to_cell(float(g[0]), float(g[-1])))
    field_j = jnp.asarray(field.astype(np.float32))
    rkw = dict(
        slack_reward=float(cfg.TASK_CONFIG.TASK.WAYPOINT_REWARD_MEASURE.slack_reward),
        use_distance_scaled_slack_reward=True,
        scale_slack_on_prediction=True,
        success_reward=float(cfg.TASK_CONFIG.TASK.WAYPOINT_REWARD_MEASURE.success_reward),
        distance_scalar=float(cfg.TASK_CONFIG.TASK.WAYPOINT_REWARD_MEASURE.distance_scalar),
        success_distance=float(cfg.TASK_CONFIG.TASK.SUCCESS.SUCCESS_DISTANCE),
    )

    rng = np.random.RandomState(5)
    prev_pos = np.asarray(env._env.sim.get_agent_state().position)
    prev_d = env._env.sim.geodesic_distance(list(prev_pos), ep.goals[0].position)
    steps = [
        {"action": {"action": "GO_TOWARD_POINT", "action_args": {"r": float(rng.uniform(0.25, 3.0)), "theta": float(rng.uniform(0, 2 * np.pi))}}}
        for _ in range(5)
    ] + [{"action": "STOP"}]
    for a in steps:
        is_stop = a["action"] == "STOP"
        r_pred = 0.0 if is_stop else a["action"]["action_args"]["r"]
        obs, host_reward, done, info = env.step(a)
        new_pos = np.asarray(env._env.sim.get_agent_state().position)
        dev_reward, dev_d, dev_success = ds.waypoint_reward(
            field_j, jnp.float32(prev_d), jnp.asarray(prev_pos[[0, 2]], jnp.float32),
            jnp.asarray(new_pos, jnp.float32), jnp.float32(r_pred),
            jnp.asarray(is_stop), **rkw,
        )
        np.testing.assert_allclose(float(dev_reward), host_reward, atol=1e-5)
        np.testing.assert_allclose(float(dev_success), info["success"], atol=1e-6)
        prev_pos, prev_d = new_pos, float(dev_d)
        if done:
            break
    env.close()


@pytest.mark.slow  # >25s compile-heavy; full tier: pytest -m ""
def test_on_device_ppo_training(tmp_path):
    """Full DD-PPO update with TPU.ON_DEVICE_ROLLOUT: no env pool, rollout
    collected by the device scan, params move, checkpoint written."""
    tmp = str(tmp_path)
    cfg = _waypoint_cfg(tmp, extra=[
        "TPU.ON_DEVICE_ROLLOUT", True,
        "RL.NUM_UPDATES", 1,
        "RL.PPO.num_steps", 4,
        "RL.PPO.num_mini_batch", 1,
        "RL.PPO.ppo_epoch", 1,
    ])
    trainer = registry.get_trainer("ddppo-waypoint")(cfg)
    captured = {}
    orig_init = trainer._initialize_policy_rl

    def wrapped(*a, **k):
        orig_init(*a, **k)
        captured["before"] = jax.tree_util.tree_map(
            lambda x: np.asarray(x).copy(), trainer.policy.params
        )

    trainer._initialize_policy_rl = wrapped
    trainer.train()
    assert trainer.envs is None  # no env pool was ever constructed
    assert os.path.exists(f"{tmp}/ckpts/ckpt.0.ckpt")
    before = jax.tree_util.tree_leaves(captured["before"])
    after = jax.tree_util.tree_leaves(trainer.policy.params)
    changed = any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )
    assert changed, "on-device PPO update did not change any parameter"


def test_gae_parity_with_storage():
    """compute_returns_device == ActionDictRolloutStorage.compute_returns."""
    from gymnasium import spaces as gs

    from vlnce_tpu.rl.device_rollout import compute_returns_device
    from vlnce_tpu.rl.rollout_storage import ActionDictRolloutStorage

    T, N = 7, 3
    rng = np.random.RandomState(0)
    rewards = rng.randn(T, N, 1).astype(np.float32)
    values = rng.randn(T, N, 1).astype(np.float32)
    masks_next = (rng.rand(T, N, 1) > 0.3).astype(np.float32)
    next_value = rng.randn(N, 1).astype(np.float32)

    for use_gae in (True, False):
        storage = ActionDictRolloutStorage(
            T, N, gs.Dict({"x": gs.Box(0, 1, (1,), np.float32)}), 4, 1
        )
        storage.rewards[:] = rewards
        storage.value_preds[:T] = values
        storage.masks[1 : T + 1] = masks_next
        storage.step = T
        storage.compute_returns(next_value, use_gae, gamma=0.99, tau=0.95)
        dev = np.asarray(
            compute_returns_device(
                jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(masks_next),
                jnp.asarray(next_value), 0.99, 0.95, use_gae,
            )
        )
        np.testing.assert_allclose(dev, storage.returns[:T], atol=1e-5)


@pytest.mark.slow  # >25s compile-heavy; full tier: pytest -m ""
def test_collect_device_batch(tmp_path):
    """collect_device produces a finite, correctly-shaped device PPO batch
    and update_device consumes it (params move)."""
    from vlnce_tpu.rl.device_rollout import DeviceRolloutCollector

    cfg = _waypoint_cfg(str(tmp_path), extra=[
        "RL.PPO.num_steps", 3,
        "RL.PPO.num_mini_batch", 1,
        "TPU.ON_DEVICE_ROLLOUT", True,
    ])
    trainer = registry.get_trainer("ddppo-waypoint")(cfg)
    cfg = trainer.config  # pano sensors injected
    env_cls = registry.get_env(cfg.ENV_NAME)
    probe = env_cls(cfg.clone())

    class _H:
        observation_spaces = [probe.observation_space]

    trainer._set_observation_space(_H())
    probe.close()
    trainer._initialize_policy_rl(load_from_ckpt=False)

    N, T = 2, 3
    collector = DeviceRolloutCollector(trainer.policy, trainer.obs_transforms, cfg, N)
    collector.initial_carry_and_obs()
    cer = np.zeros((N, 1), np.float32)
    stats = {"count": np.zeros((N, 1), np.float32), "reward": np.zeros((N, 1), np.float32)}
    batch, n = collector.collect_device(cer, stats, jax.random.PRNGKey(0))
    assert n == T * N
    # episode stats must be NaN-free even though queued scenes hold inf
    # distance fields at cells navigable in OTHER scenes (the _select_axis1
    # inf-poisoning regression)
    for k, v in stats.items():
        assert np.isfinite(v).all(), k
    assert batch["value_preds"].shape == (T, N, 1)
    assert batch["obs"]["rgb"].shape[:2] == (T, N)
    for key in ("returns", "advantages", "old_log_probs", "rewards"):
        assert np.isfinite(np.asarray(batch[key])).all(), key
    masks = np.asarray(batch["masks"])
    assert set(np.unique(masks)) <= {0.0, 1.0}
    assert masks[0].sum() == 0.0  # first step resets recurrence

    before = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), trainer.policy.params)
    )
    trainer.agent.update_device(batch, np.random.RandomState(0))
    after = jax.tree_util.tree_leaves(trainer.policy.params)
    assert any(not np.allclose(b, np.asarray(a)) for b, a in zip(before, after))

    # second rollout continues from carried state
    batch2, _ = collector.collect_device(cer, stats, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(batch2["returns"])).all()


@pytest.mark.slow  # >25s compile-heavy; full tier: pytest -m ""
def test_collect_device_sharded_matches_single(tmp_path):
    """Rollout collection pjit'd over a 2-device data mesh produces the same
    batch as the single-device collect (env slots are independent; only the
    advantage normalization reduces globally), and the mesh rejects env
    counts that don't divide the data axis."""
    from vlnce_tpu.parallel.mesh import make_mesh
    from vlnce_tpu.rl.device_rollout import DeviceRolloutCollector

    cfg = _waypoint_cfg(str(tmp_path), extra=[
        "RL.PPO.num_steps", 3,
        "RL.PPO.num_mini_batch", 1,
        "TPU.ON_DEVICE_ROLLOUT", True,
    ])
    trainer = registry.get_trainer("ddppo-waypoint")(cfg)
    cfg = trainer.config
    env_cls = registry.get_env(cfg.ENV_NAME)
    probe = env_cls(cfg.clone())

    class _H:
        observation_spaces = [probe.observation_space]

    trainer._set_observation_space(_H())
    probe.close()
    trainer._initialize_policy_rl(load_from_ckpt=False)

    N = 2
    mesh = make_mesh(num_devices=2)

    with pytest.raises(ValueError, match="divisible"):
        DeviceRolloutCollector(trainer.policy, trainer.obs_transforms, cfg, 3, mesh=mesh)

    def run(mesh_arg):
        coll = DeviceRolloutCollector(
            trainer.policy, trainer.obs_transforms, cfg, N, mesh=mesh_arg
        )
        coll.initial_carry_and_obs()
        cer = np.zeros((N, 1), np.float32)
        stats = {"count": np.zeros((N, 1), np.float32)}
        batch, _ = coll.collect_device(cer, stats, jax.random.PRNGKey(0))
        return batch

    single = run(None)
    sharded = run(mesh)
    for key in ("returns", "advantages", "rewards", "masks", "old_log_probs"):
        np.testing.assert_allclose(
            np.asarray(single[key]), np.asarray(sharded[key]), atol=1e-4, err_msg=key
        )
    for k in single["actions"]:
        np.testing.assert_allclose(
            np.asarray(single["actions"][k]), np.asarray(sharded["actions"][k]),
            atol=1e-5, err_msg=f"actions/{k}",
        )


@pytest.mark.slow  # >25s compile-heavy; full tier: pytest -m ""
def test_ppo_update_scan_matches_per_minibatch(tmp_path):
    """update_device_scan (all ppo_epoch x num_mini_batch updates fused into
    one lax.scan program, TPU.PPO_UPDATE_SCAN) produces the same stats and
    parameters as the per-minibatch update_device loop: same rng permutation
    stream, same step math."""
    from vlnce_tpu.rl.device_rollout import DeviceRolloutCollector

    cfg = _waypoint_cfg(str(tmp_path), extra=[
        "RL.PPO.num_steps", 3,
        "RL.PPO.num_mini_batch", 2,
        "RL.PPO.ppo_epoch", 2,
        "TPU.ON_DEVICE_ROLLOUT", True,
    ])
    trainer = registry.get_trainer("ddppo-waypoint")(cfg)
    cfg = trainer.config
    env_cls = registry.get_env(cfg.ENV_NAME)
    probe = env_cls(cfg.clone())

    class _H:
        observation_spaces = [probe.observation_space]

    trainer._set_observation_space(_H())
    probe.close()
    trainer._initialize_policy_rl(load_from_ckpt=False)

    N = 2
    collector = DeviceRolloutCollector(trainer.policy, trainer.obs_transforms, cfg, N)
    collector.initial_carry_and_obs()
    cer = np.zeros((N, 1), np.float32)
    stats0 = {"count": np.zeros((N, 1), np.float32)}
    batch, _ = collector.collect_device(cer, stats0, jax.random.PRNGKey(0))

    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)), t)
    params0 = copy(trainer.policy.params)
    optim0 = copy(trainer.agent.optim_state)

    stats_loop = trainer.agent.update_device(batch, np.random.RandomState(7))
    params_loop = jax.tree_util.tree_map(np.asarray, trainer.policy.params)

    trainer.policy.params = copy(params0)
    trainer.agent.optim_state = copy(optim0)
    stats_scan = trainer.agent.update_device_scan(batch, np.random.RandomState(7))
    params_scan = jax.tree_util.tree_map(np.asarray, trainer.policy.params)

    assert set(stats_scan) == set(stats_loop)
    for k in stats_loop:
        np.testing.assert_allclose(stats_scan[k], stats_loop[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        params_scan, params_loop,
    )
