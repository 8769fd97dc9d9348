"""Legacy v0.1.4-compat expert follower (ShortestPathFollowerCompat).

Reference habitat_extensions/shortest_path_follower.py:25-199: geodesic_path
quaternion steering and the greedy sim-step-and-rollback heading sweep, for
dataset-generation parity (USE_ORIGINAL_FOLLOWER).
"""

import math

import numpy as np

import vlnce_tpu.envs  # noqa: F401
import vlnce_tpu.tasks  # noqa: F401
from vlnce_tpu.envs.env import Env
from vlnce_tpu.envs.sim import SimulatorActions
from vlnce_tpu.tasks.config.default import get_default_task_config
from vlnce_tpu.tasks.geometry import quat_from_heading
from vlnce_tpu.tasks.shortest_path_follower import (
    ShortestPathFollower,
    ShortestPathFollowerCompat,
)


def make_env():
    cfg = get_default_task_config().defrost()
    cfg.DATASET.TYPE = "Synthetic-VLN-v0"
    cfg.TASK.SENSORS = ["INSTRUCTION_SENSOR"]
    cfg.TASK.MEASUREMENTS = ["DISTANCE_TO_GOAL", "SUCCESS", "SPL"]
    for s in ("RGB_SENSOR", "DEPTH_SENSOR"):
        getattr(cfg.SIMULATOR, s).HEIGHT = 16
        getattr(cfg.SIMULATOR, s).WIDTH = 16
    return Env(cfg)


def run_follower(env, follower, max_steps=200) -> float:
    """Follow to the goal; returns the final geodesic distance."""
    sim = env.sim
    goal = env.current_episode.goals[0].position
    sim.set_agent_state(env.current_episode.start_position, env.current_episode.start_rotation)
    for _ in range(max_steps):
        a = follower.get_next_action(goal)
        if a is None:
            break
        sim.step(int(a))
    return sim.geodesic_distance(list(sim.get_agent_state().position), list(goal))


def test_compat_both_modes_reach_goal():
    env = make_env()
    env.reset()
    geo = ShortestPathFollowerCompat(env.sim, 0.5, return_one_hot=False)
    assert geo.mode == "geodesic_path"
    assert run_follower(env, geo) <= 0.5

    greedy = ShortestPathFollowerCompat(env.sim, 0.5, return_one_hot=False)
    greedy.mode = "greedy"
    assert run_follower(env, greedy) <= 0.5
    env.close()


def test_greedy_and_geodesic_modes_disagree_somewhere():
    """The two compat modes are different algorithms: along a real trajectory
    they must disagree on at least one step (and each still reaches the
    goal, per the test above)."""
    env = make_env()
    env.reset()
    sim = env.sim
    goal = env.current_episode.goals[0].position
    geo = ShortestPathFollowerCompat(sim, 0.5, return_one_hot=False)
    greedy = ShortestPathFollowerCompat(sim, 0.5, return_one_hot=False)
    greedy.mode = "greedy"
    modern = ShortestPathFollower(sim, 0.5, return_one_hot=False)

    sim.set_agent_state(env.current_episode.start_position, env.current_episode.start_rotation)
    disagreements = 0
    for _ in range(80):
        a_m = modern.get_next_action(goal)
        if a_m is None:
            break
        a_geo = geo.get_next_action(goal)
        a_greedy = greedy.get_next_action(goal)
        if a_geo is not None and a_greedy is not None and a_geo != a_greedy:
            disagreements += 1
        sim.step(int(a_m))
    assert disagreements > 0
    env.close()


def test_greedy_probing_restores_sim_state():
    """The greedy sweep steps the sim up to 360/TURN_ANGLE times — it must
    roll the agent back exactly (reference:168 _reset_agent_state)."""
    env = make_env()
    env.reset()
    sim = env.sim
    goal = env.current_episode.goals[0].position
    greedy = ShortestPathFollowerCompat(sim, 0.5, return_one_hot=False)
    greedy.mode = "greedy"
    before = sim.get_agent_state()
    greedy.get_next_action(goal)
    after = sim.get_agent_state()
    np.testing.assert_allclose(before.position, after.position, atol=1e-9)
    np.testing.assert_allclose(before.rotation, after.rotation, atol=1e-9)
    env.close()


def test_geodesic_steering_semantics():
    """reference:86-112 _step_along_grad: FORWARD within TURN_ANGLE of the
    gradient direction, otherwise turn toward it (probe + rollback)."""
    env = make_env()
    env.reset()
    sim = env.sim
    goal = env.current_episode.goals[0].position
    geo = ShortestPathFollowerCompat(sim, 0.25, return_one_hot=False)

    # the gradient direction the follower itself computes
    grad = geo._est_max_grad_dir(goal)
    assert grad is not None

    # facing exactly along the gradient -> MOVE_FORWARD
    sim.set_agent_state(sim.get_agent_state().position, grad)
    assert geo.get_next_action(goal) == SimulatorActions.MOVE_FORWARD

    # facing 90 degrees off -> a turn, not forward
    from vlnce_tpu.tasks.geometry import heading_from_quaternion

    h = heading_from_quaternion(grad)
    sim.set_agent_state(
        sim.get_agent_state().position,
        quat_from_heading((h + math.pi / 2) % (2 * math.pi)),
    )
    a = geo.get_next_action(goal)
    assert a in (SimulatorActions.TURN_LEFT, SimulatorActions.TURN_RIGHT)
    env.close()


def test_sensor_selects_compat_follower():
    cfg = get_default_task_config().defrost()
    cfg.DATASET.TYPE = "Synthetic-VLN-v0"
    cfg.TASK.SENSORS = ["SHORTEST_PATH_SENSOR"]
    cfg.TASK.MEASUREMENTS = ["DISTANCE_TO_GOAL", "SUCCESS", "SPL"]
    cfg.TASK.SHORTEST_PATH_SENSOR.USE_ORIGINAL_FOLLOWER = True
    for s in ("RGB_SENSOR", "DEPTH_SENSOR"):
        getattr(cfg.SIMULATOR, s).HEIGHT = 16
        getattr(cfg.SIMULATOR, s).WIDTH = 16
    env = Env(cfg)
    obs = env.reset()
    sensor = next(s for s in env.task.sensor_suite if s.uuid == "shortest_path_sensor")
    assert isinstance(sensor.follower, ShortestPathFollowerCompat)
    # the sensor still yields valid oracle actions end-to-end
    steps = 0
    while not env.episode_over and steps < 200:
        obs = env.step(int(obs["shortest_path_sensor"][0]))
        steps += 1
    assert env.get_metrics()["success"] == 1.0
    env.close()
