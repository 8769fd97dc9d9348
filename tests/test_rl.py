"""Rollout storage / GAE / PPO machinery tests."""

import numpy as np
import pytest
from gymnasium import spaces

from vlnce_tpu.rl.rollout_storage import ActionDictRolloutStorage


def make_storage(T=4, N=3):
    obs_space = spaces.Dict({
        "feat": spaces.Box(-1, 1, (5,), np.float32),
    })
    return ActionDictRolloutStorage(T, N, obs_space, recurrent_hidden_state_size=8, num_recurrent_layers=2)


def test_insert_and_after_update():
    r = make_storage()
    for t in range(4):
        r.insert(
            {"feat": np.full((3, 5), t + 1, np.float32)},
            np.zeros((3, 2, 8), np.float32),
            {"pano": np.full((3, 1), t), "offset": np.zeros((3, 1)), "distance": np.ones((3, 1))},
            np.zeros((3, 1)), np.zeros((3, 1)), np.full((3, 1), 0.5), np.ones((3, 1)),
        )
    assert r.step == 4
    assert r.observations["feat"][4, 0, 0] == 4.0
    r.after_update()
    assert r.step == 0
    assert r.observations["feat"][0, 0, 0] == 4.0  # last obs rolled to slot 0
    assert r.prev_actions["pano"][0, 0, 0] == 3.0


def test_gae_returns_hand_computed():
    """GAE on a 2-step rollout with known values."""
    r = make_storage(T=2, N=1)
    gamma, tau = 0.9, 0.8
    for t, (reward, value) in enumerate([(1.0, 0.5), (2.0, 0.25)]):
        r.insert(
            {"feat": np.zeros((1, 5), np.float32)},
            np.zeros((1, 2, 8), np.float32),
            {"pano": np.zeros((1, 1)), "offset": np.zeros((1, 1)), "distance": np.zeros((1, 1))},
            np.zeros((1, 1)), np.full((1, 1), value), np.full((1, 1), reward), np.ones((1, 1)),
        )
    next_value = 0.1
    r.compute_returns(np.full((1, 1), next_value), use_gae=True, gamma=gamma, tau=tau)
    # manual GAE
    delta1 = 2.0 + gamma * next_value - 0.25
    gae1 = delta1
    ret1 = gae1 + 0.25
    delta0 = 1.0 + gamma * 0.25 - 0.5
    gae0 = delta0 + gamma * tau * gae1
    ret0 = gae0 + 0.5
    np.testing.assert_allclose(r.returns[1, 0, 0], ret1, rtol=1e-6)
    np.testing.assert_allclose(r.returns[0, 0, 0], ret0, rtol=1e-6)


def test_gae_masks_reset_bootstrap():
    """mask==0 after a step must stop both the bootstrap and the GAE carry."""
    r = make_storage(T=2, N=1)
    for t, (reward, value, mask) in enumerate([(1.0, 0.5, 1.0), (2.0, 0.25, 0.0)]):
        r.insert(
            {"feat": np.zeros((1, 5), np.float32)},
            np.zeros((1, 2, 8), np.float32),
            {"pano": np.zeros((1, 1)), "offset": np.zeros((1, 1)), "distance": np.zeros((1, 1))},
            np.zeros((1, 1)), np.full((1, 1), value), np.full((1, 1), reward), np.full((1, 1), mask),
        )
    r.compute_returns(np.full((1, 1), 99.0), use_gae=True, gamma=0.9, tau=0.8)
    # mask inserted at step 1 is masks[2]=0: the episode ended after step 1,
    # so step 1 must NOT bootstrap from next_value=99
    delta1 = 2.0 + 0.0 - 0.25
    np.testing.assert_allclose(r.returns[1, 0, 0], delta1 + 0.25, rtol=1e-6)
    # step 0 still bootstraps from v1 (masks[1]=1) and carries gae1
    gae1 = delta1
    delta0 = 1.0 + 0.9 * 0.25 - 0.5
    np.testing.assert_allclose(r.returns[0, 0, 0], delta0 + 0.9 * 0.8 * gae1 + 0.5, rtol=1e-6)


def test_recurrent_generator_shapes_and_coverage():
    r = make_storage(T=4, N=4)
    for t in range(4):
        r.insert(
            {"feat": np.random.rand(4, 5).astype(np.float32)},
            np.zeros((4, 2, 8), np.float32),
            {"pano": np.zeros((4, 1)), "offset": np.zeros((4, 1)), "distance": np.zeros((4, 1))},
            np.zeros((4, 1)), np.zeros((4, 1)), np.zeros((4, 1)), np.ones((4, 1)),
        )
    r.compute_returns(np.zeros((4, 1)), True, 0.99, 0.95)
    adv = np.random.rand(5, 4, 1).astype(np.float32)
    rng = np.random.RandomState(0)
    batches = list(r.recurrent_generator(adv, num_mini_batch=2, rng=rng))
    assert len(batches) == 2
    obs, hidden0, actions, prev, vp, ret, masks, olp, a, T, n = batches[0]
    assert (T, n) == (4, 2)
    assert obs["feat"].shape == (4, 2, 5)
    assert hidden0.shape == (2, 2, 8)
    assert masks.shape == (4, 2, 1)


def test_episode_iterator_scene_rotation():
    from vlnce_tpu.config.node import Config
    from vlnce_tpu.envs.env import EpisodeIterator
    from vlnce_tpu.tasks.episodes import VLNEpisode

    eps = [
        VLNEpisode(episode_id=str(i), scene_id=f"scene_{i % 2}", start_position=[0, 0, 0],
                   start_rotation=[0, 0, 0, 1])
        for i in range(8)
    ]
    opts = Config({"CYCLE": True, "SHUFFLE": False, "GROUP_BY_SCENE": True,
                   "MAX_SCENE_REPEAT_EPISODES": 2, "MAX_SCENE_REPEAT_STEPS": -1,
                   "NUM_EPISODE_SAMPLE": -1})
    it = EpisodeIterator(eps, opts, seed=0)
    scenes = [next(it).scene_id for _ in range(8)]
    # without rotation, grouping gives 4x scene_0 then 4x scene_1; with
    # MAX_SCENE_REPEAT_EPISODES=2 scenes must alternate every 2 episodes
    assert scenes[:6] == ["scene_0", "scene_0", "scene_1", "scene_1", "scene_0", "scene_0"]


def test_episode_iterator_num_sample():
    from vlnce_tpu.config.node import Config
    from vlnce_tpu.envs.env import EpisodeIterator
    from vlnce_tpu.tasks.episodes import VLNEpisode

    eps = [VLNEpisode(episode_id=str(i), scene_id="s", start_position=[0, 0, 0], start_rotation=[0, 0, 0, 1]) for i in range(20)]
    opts = Config({"CYCLE": False, "SHUFFLE": True, "GROUP_BY_SCENE": False,
                   "MAX_SCENE_REPEAT_EPISODES": -1, "MAX_SCENE_REPEAT_STEPS": -1,
                   "NUM_EPISODE_SAMPLE": 5})
    it = EpisodeIterator(eps, opts, seed=0)
    seen = [next(it).episode_id for _ in range(5)]
    assert len(set(seen)) == 5
    with pytest.raises(StopIteration):
        next(it)


def test_discretized_waypoint_env_steps_without_reward_measure():
    """VLNCEWaypointEnvDiscretized parity (reference environments.py:94-198):
    reward is 0.0 (no waypoint_reward_measure needed in TASK.MEASUREMENTS),
    and an empty plan (waypoint within goal radius) re-fetches observations at
    the current pose instead of terminating the episode."""
    import vlnce_tpu.tasks  # noqa: F401
    from vlnce_tpu.config import get_config
    from vlnce_tpu.envs import ensure_registered
    from vlnce_tpu.envs.rl_envs import VLNCEWaypointEnvDiscretized

    ensure_registered()
    cfg = get_config(
        # experiment chain, reference-style: waypoint experiment + DN override
        config_paths=(
            "vlnce_tpu/config/experiments/synthetic/smoke_waypoint.yaml,"
            "vlnce_tpu/tasks/config/vlnce_waypoint_DN.yaml"
        ),
        opts=[
            "TASK_CONFIG.DATASET.NUM_EPISODES", 2,
            "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", 16,
            "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", 16,
            "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", 16,
            "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", 16,
        ],
    )
    assert cfg.ENV_NAME == "VLNCEWaypointEnvDiscretized"
    # DN task config keeps only the metric measures -- no reward measure
    assert "WAYPOINT_REWARD_MEASURE" not in cfg.TASK_CONFIG.TASK.MEASUREMENTS
    env = VLNCEWaypointEnvDiscretized(cfg)
    obs = env.reset()
    # a real waypoint gets planned into discrete steps
    obs, reward, done, info = env.step(
        {"action": "GO_TOWARD_POINT", "action_args": {"r": 1.0, "theta": 0.0}}
    )
    assert reward == 0.0
    assert "distance_to_goal" in info
    # a waypoint already within the goal radius -> empty plan -> episode must
    # NOT terminate; observations are re-fetched at the current pose
    if not done:
        steps_before = env.habitat_env._elapsed_steps
        obs, reward, done2, info = env.step(
            {"action": "GO_TOWARD_POINT", "action_args": {"r": 0.01, "theta": 0.0}}
        )
        assert reward == 0.0
        assert env.habitat_env._elapsed_steps == steps_before
        assert not env.habitat_env.task.is_stop_called
        assert "rgb" in obs
    env.close()


def test_wddppo_obs_shapes_not_sticky():
    """update_device's flattened-obs reshape map must not leak into later
    update()/update_device() calls (cross-mode contamination regression)."""
    import types

    import jax.numpy as jnp

    from vlnce_tpu.config import get_config
    from vlnce_tpu.rl.ppo import WDDPPO

    cfg = get_config(opts=["RL.PPO.num_mini_batch", 2])
    policy = types.SimpleNamespace(params={"w": jnp.zeros((2,))})
    agent = WDDPPO(policy, cfg.RL.PPO, mesh=None)

    # simulate a prior device update having set the reshape map
    agent._obs_shapes = {"rgb": (4, 4, 3)}

    # update() over host rollouts must clear it before building any step;
    # an empty generator exercises exactly the reset path
    rollouts = types.SimpleNamespace(
        returns=np.zeros((2, 1, 1), np.float32),
        value_preds=np.zeros((2, 1, 1), np.float32),
        recurrent_generator=lambda adv, nmb, rng: iter(()),
    )
    agent.update(rollouts, np.random.RandomState(0))
    assert agent._obs_shapes is None

    # update_device without obs_shapes in the batch must also clear a stale
    # map (reset happens before the minibatch-count validation raises)
    agent._obs_shapes = {"rgb": (4, 4, 3)}
    batch = {"value_preds": np.zeros((2, 1, 1), np.float32)}
    with pytest.raises(ValueError):
        agent.update_device(batch, np.random.RandomState(0))
    assert agent._obs_shapes is None


def test_discretized_waypoint_env_writes_video(tmp_path):
    """With VIDEO_OPTION set, the discretized env composites a navigator
    frame per discrete sub-step and writes the episode video in-env on done
    (reference environments.py:113-196)."""
    import vlnce_tpu.tasks  # noqa: F401
    from vlnce_tpu.config import get_config
    from vlnce_tpu.envs import ensure_registered
    from vlnce_tpu.envs.rl_envs import VLNCEWaypointEnvDiscretized

    ensure_registered()
    cfg = get_config(
        config_paths=(
            "vlnce_tpu/config/experiments/synthetic/smoke_waypoint.yaml,"
            "vlnce_tpu/tasks/config/vlnce_waypoint_DN.yaml"
        ),
        opts=[
            "VIDEO_OPTION", ["disk"],
            "VIDEO_DIR", str(tmp_path),
            "TASK_CONFIG.DATASET.NUM_EPISODES", 1,
            "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", 16,
            "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", 16,
            "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", 16,
            "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", 16,
        ],
    )
    env = VLNCEWaypointEnvDiscretized(cfg)
    env.reset()
    assert len(env._video_frames) == 1  # start-pose frame captured on reset
    _, _, done, _ = env.step(
        {"action": "GO_TOWARD_POINT", "action_args": {"r": 1.0, "theta": 0.5}}
    )
    assert len(env._video_frames) > 1  # one frame per discrete sub-step
    if not done:
        _, _, done, _ = env.step({"action": "STOP"})
    assert done
    videos = list(tmp_path.glob("*.mp4"))
    assert len(videos) == 1 and "SPL=" in videos[0].name
    env.close()
