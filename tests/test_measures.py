"""Unit tests for the Measure system on hand-computed paths, using ReplaySim
(SURVEY.md §4: test measures against hand-computed paths)."""

import math

import numpy as np
import pytest

import vlnce_tpu.envs  # noqa: F401  (registry)
import vlnce_tpu.tasks  # noqa: F401
from vlnce_tpu.envs.replay_sim import ReplaySim
from vlnce_tpu.tasks.config.default import get_default_task_config
from vlnce_tpu.tasks.episodes import InstructionData, NavigationGoal, VLNEpisode
from vlnce_tpu.tasks.task import VLNTask


def make_episode(path, goal, geodesic=None):
    return VLNEpisode(
        episode_id="0",
        scene_id="test_scene",
        start_position=list(path[0]),
        start_rotation=[0.0, 0.0, 0.0, 1.0],
        instruction=InstructionData(instruction_text="go", instruction_tokens=[2, 3]),
        goals=[NavigationGoal(position=list(goal), radius=3.0)],
        reference_path=[list(p) for p in path],
        info={"geodesic_distance": geodesic or float(np.linalg.norm(np.array(goal) - np.array(path[0])))},
    )


@pytest.fixture
def task_and_sim():
    # straight line 0 -> -2.5 in z, 10 steps of 0.25
    T = 11
    positions = np.stack([np.zeros(T), np.zeros(T), -0.25 * np.arange(T)], axis=1)
    ReplaySim.register_trajectory("test_scene", positions, np.zeros(T))
    cfg = get_default_task_config().defrost()
    cfg.TASK.SENSORS = []
    cfg.TASK.MEASUREMENTS = [
        "DISTANCE_TO_GOAL", "SUCCESS", "SPL", "NDTW", "SDTW",
        "PATH_LENGTH", "ORACLE_NAVIGATION_ERROR", "ORACLE_SUCCESS",
        "ORACLE_SPL", "STEPS_TAKEN",
    ]
    sim = ReplaySim(cfg.SIMULATOR)
    sim.reconfigure("test_scene")
    task = VLNTask(cfg.TASK, sim)
    return task, sim


def run_episode(task, sim, episode, n_steps, stop_at_end=True):
    task.reset(episode)
    for i in range(n_steps):
        task.step({"action": "MOVE_FORWARD"}, episode)
    if stop_at_end:
        task.step({"action": "STOP"}, episode)
    return task.measurements.get_metrics()


def test_success_requires_stop(task_and_sim):
    task, sim = task_and_sim
    episode = make_episode([[0, 0, 0], [0, 0, -2.5]], [0, 0, -2.5], geodesic=2.5)
    task.reset(episode)
    for _ in range(10):
        task.step({"action": "MOVE_FORWARD"}, episode)
    m = task.measurements.get_metrics()
    assert m["distance_to_goal"] < 0.01
    assert m["success"] == 0.0  # no STOP yet
    assert m["oracle_success"] == 1.0
    task.step({"action": "STOP"}, episode)
    m = task.measurements.get_metrics()
    assert m["success"] == 1.0


def test_path_length_and_steps(task_and_sim):
    task, sim = task_and_sim
    episode = make_episode([[0, 0, 0], [0, 0, -2.5]], [0, 0, -2.5], geodesic=2.5)
    m = run_episode(task, sim, episode, 10)
    assert abs(m["path_length"] - 2.5) < 1e-9
    assert m["steps_taken"] == 11.0  # 10 forward + STOP


def test_spl_perfect_path(task_and_sim):
    task, sim = task_and_sim
    episode = make_episode([[0, 0, 0], [0, 0, -2.5]], [0, 0, -2.5], geodesic=2.5)
    m = run_episode(task, sim, episode, 10)
    assert abs(m["spl"] - 1.0) < 1e-9
    assert abs(m["oracle_spl"] - 1.0) < 1e-9


def test_ndtw_perfect_path_is_high(task_and_sim):
    task, sim = task_and_sim
    path = [[0, 0, -0.25 * i] for i in range(11)]
    episode = make_episode(path, [0, 0, -2.5], geodesic=2.5)
    m = run_episode(task, sim, episode, 10)
    assert m["ndtw"] > 0.99
    assert m["sdtw"] == pytest.approx(m["ndtw"] * m["success"])


def test_oracle_navigation_error(task_and_sim):
    task, sim = task_and_sim
    # goal is closest at the end of the trajectory
    episode = make_episode([[0, 0, 0], [0, 0, -4.0]], [0, 0, -4.0], geodesic=4.0)
    m = run_episode(task, sim, episode, 10)  # agent only reaches -2.5
    assert abs(m["oracle_navigation_error"] - 1.5) < 1e-9
    assert m["success"] == 1.0  # 1.5 < 3.0 success distance


def test_ndtw_hand_computed():
    """nDTW = exp(-DTW/(|gt| * d_success)) on a deliberately offset path."""
    T = 5
    positions = np.stack([np.ones(T), np.zeros(T), -1.0 * np.arange(T)], axis=1)
    ReplaySim.register_trajectory("offset_scene", positions, np.zeros(T))
    cfg = get_default_task_config().defrost()
    cfg.TASK.SENSORS = []
    cfg.TASK.MEASUREMENTS = ["DISTANCE_TO_GOAL", "SUCCESS", "NDTW"]
    sim = ReplaySim(cfg.SIMULATOR)
    sim.reconfigure("offset_scene")
    task = VLNTask(cfg.TASK, sim)
    gt = [[0, 0, -1.0 * i] for i in range(T)]
    episode = make_episode(gt, gt[-1], geodesic=4.0)
    task.reset(episode)
    for _ in range(T - 1):
        task.step({"action": "MOVE_FORWARD"}, episode)
    # each of 5 agent points is 1.0 away from its gt twin -> DTW = 5
    expected = math.exp(-5.0 / (5 * 3.0))
    assert task.measurements.get_metrics()["ndtw"] == pytest.approx(expected, rel=1e-6)
