"""Integration tests: GridWorld sim + Env + oracle follower."""

import numpy as np
import pytest

import vlnce_tpu.envs  # noqa: F401
import vlnce_tpu.tasks  # noqa: F401
from vlnce_tpu.envs.env import Env
from vlnce_tpu.tasks.config.default import get_default_task_config


def make_env(max_steps=500, sensors=None, measures=None, img=32):
    cfg = get_default_task_config().defrost()
    cfg.DATASET.TYPE = "Synthetic-VLN-v0"
    cfg.ENVIRONMENT.MAX_EPISODE_STEPS = max_steps
    cfg.TASK.SENSORS = sensors or [
        "INSTRUCTION_SENSOR", "SHORTEST_PATH_SENSOR", "VLN_ORACLE_PROGRESS_SENSOR",
    ]
    cfg.TASK.MEASUREMENTS = measures or [
        "DISTANCE_TO_GOAL", "SUCCESS", "SPL", "NDTW", "PATH_LENGTH",
        "ORACLE_SUCCESS", "STEPS_TAKEN",
    ]
    cfg.SIMULATOR.RGB_SENSOR.HEIGHT = img
    cfg.SIMULATOR.RGB_SENSOR.WIDTH = img
    cfg.SIMULATOR.DEPTH_SENSOR.HEIGHT = img
    cfg.SIMULATOR.DEPTH_SENSOR.WIDTH = img
    return Env(cfg)


def test_obs_shapes_static_across_steps():
    env = make_env()
    obs = env.reset()
    shapes = {k: v.shape for k, v in obs.items()}
    for _ in range(3):
        obs = env.step(1)
        assert {k: v.shape for k, v in obs.items()} == shapes
    assert obs["rgb"].dtype == np.uint8
    assert obs["depth"].dtype == np.float32
    assert 0.0 <= obs["depth"].min() and obs["depth"].max() <= 1.0


def test_oracle_follower_reaches_goal():
    env = make_env()
    successes = 0
    for _ in range(3):
        obs = env.reset()
        steps = 0
        while not env.episode_over and steps < 500:
            obs = env.step(int(obs["shortest_path_sensor"][0]))
            steps += 1
        successes += env.get_metrics()["success"]
    assert successes >= 2  # oracle should nearly always succeed


def test_progress_sensor_monotone_on_oracle_path():
    env = make_env()
    obs = env.reset()
    last = obs["progress"][0]
    increased = False
    steps = 0
    while not env.episode_over and steps < 200:
        obs = env.step(int(obs["shortest_path_sensor"][0]))
        if obs["progress"][0] > last + 1e-6:
            increased = True
        last = obs["progress"][0]
        steps += 1
    assert increased


def test_max_episode_steps_enforced():
    env = make_env(max_steps=5)
    env.reset()
    for _ in range(5):
        assert not env.episode_over
        env.step(2)  # turn forever
    assert env.episode_over


def test_stop_ends_episode():
    env = make_env()
    env.reset()
    env.step(0)
    assert env.episode_over


def test_waypoint_action_moves_agent():
    cfg = get_default_task_config().defrost()
    cfg.DATASET.TYPE = "Synthetic-VLN-v0"
    cfg.TASK.SENSORS = ["GLOBAL_GPS_SENSOR", "HEADING_SENSOR", "PANO_ANGLE_FEATURE_SENSOR"]
    cfg.TASK.MEASUREMENTS = ["DISTANCE_TO_GOAL", "SUCCESS", "SPL", "STEPS_TAKEN", "WAYPOINT_REWARD_MEASURE"]
    cfg.TASK.POSSIBLE_ACTIONS = ["STOP", "GO_TOWARD_POINT"]
    cfg.SIMULATOR.RGB_SENSOR.HEIGHT = 16
    cfg.SIMULATOR.RGB_SENSOR.WIDTH = 16
    cfg.SIMULATOR.DEPTH_SENSOR.HEIGHT = 16
    cfg.SIMULATOR.DEPTH_SENSOR.WIDTH = 16
    env = Env(cfg)
    obs = env.reset()
    pos0 = obs["globalgps"].copy()
    obs = env.step({"action": "GO_TOWARD_POINT", "action_args": {"r": 1.0, "theta": 0.0}})
    pos1 = obs["globalgps"]
    moved = np.linalg.norm(pos1 - pos0)
    assert moved > 0.2  # moved toward the waypoint (maybe stopped by a wall)
    assert np.isfinite(env.get_metrics()["waypoint_reward_measure"])
    assert obs["angle_features"].shape == (12, 4)


def test_scene_determinism():
    from vlnce_tpu.envs.gridworld import GridWorldScene

    a = GridWorldScene("synthetic/scene_1.glb")
    b = GridWorldScene("synthetic/scene_1.glb")
    c = GridWorldScene("synthetic/scene_2.glb")
    assert np.array_equal(a.occupancy, b.occupancy)
    assert not np.array_equal(a.occupancy, c.occupancy)


def test_geodesic_consistent_with_follower_path():
    env = make_env()
    env.reset()
    sim = env.sim
    start = sim.get_agent_state().position
    goal = env.current_episode.goals[0].position
    d = sim.geodesic_distance(list(start), goal)
    pts = sim.get_straight_shortest_path_points(list(start), goal)
    path_len = sum(
        np.linalg.norm(np.array(b) - np.array(a)) for a, b in zip(pts[:-1], pts[1:])
    )
    assert np.isfinite(d)
    assert path_len >= d - 0.5  # path at least as long as geodesic estimate
    assert path_len < d * 1.8 + 1.0  # but not wildly longer
