"""HabitatSimAdapter executed against a faked habitat_sim backend.

habitat_sim (C++/OpenGL) is not installable in this image, but the adapter's
own logic — config construction, action mapping, observation marshalling
(alpha dropping, depth clip/normalize), quaternion plumbing, pose
save/restore, pathfinder delegation — is pure Python and must be exercised.
This test injects a minimal in-memory habitat_sim with the exact API surface
the adapter touches (the same one the reference consumes, reference
habitat_extensions/actions.py:37-55, sensors.py:75-78) and drives every
adapter method through it.
"""

import importlib
import math
import sys
import types

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# minimal in-memory habitat_sim
# ---------------------------------------------------------------------------


class _Quat:
    def __init__(self, x=0.0, y=0.0, z=0.0, w=1.0):
        self.x, self.y, self.z, self.w = float(x), float(y), float(z), float(w)


class _AgentState:
    def __init__(self):
        self.position = np.zeros(3, np.float32)
        self.rotation = _Quat()


class _Agent:
    def __init__(self):
        self._state = _AgentState()

    def get_state(self):
        s = _AgentState()
        s.position = self._state.position.copy()
        s.rotation = _Quat(
            self._state.rotation.x, self._state.rotation.y,
            self._state.rotation.z, self._state.rotation.w,
        )
        return s

    def set_state(self, state, reset_sensors=False):
        self._state.position = np.asarray(state.position, np.float32).copy()
        self._state.rotation = state.rotation


class _PathFinder:
    def is_navigable(self, p):
        return bool(abs(float(p[0])) <= 10.0)

    def snap_point(self, p):
        p = np.asarray(p, np.float32).copy()
        p[0] = np.clip(p[0], -10.0, 10.0)
        return p

    def find_path(self, path):
        if hasattr(path, "requested_ends"):  # multi-goal
            start = np.asarray(path.requested_start)
            path.geodesic_distance = float(
                min(np.linalg.norm(np.asarray(e) - start) for e in path.requested_ends)
            )
        else:
            a = np.asarray(path.requested_start)
            b = np.asarray(path.requested_end)
            path.points = [a, (a + b) / 2.0, b]
            path.geodesic_distance = float(np.linalg.norm(b - a))
        return True

    def get_random_navigable_point(self):
        return np.array([1.0, 0.0, 2.0], np.float32)


class _FakeSim:
    created = []

    def __init__(self, configuration):
        self.config = configuration
        self.agents = [_Agent()]
        self.pathfinder = _PathFinder()
        self.previous_step_collided = False
        self._specs = configuration.agents[0].sensor_specifications
        self._closed = False
        _FakeSim.created.append(self)

    def get_agent(self, idx):
        return self.agents[idx]

    def _render(self):
        obs = {}
        for spec in self._specs:
            h, w = spec.resolution
            if spec.sensor_type == "DEPTH":
                obs[spec.uuid] = np.full((h, w), 7.5, np.float32)  # raw meters
            else:
                rgba = np.zeros((h, w, 4), np.uint8)
                rgba[..., 0] = 200  # red channel marker
                rgba[..., 3] = 255  # alpha the adapter must drop
                obs[spec.uuid] = rgba
        return obs

    def reset(self):
        return self._render()

    def step(self, action_name):
        agent = self.agents[0]
        fwd_amount = self.config.agents[0].action_space["move_forward"].actuation.amount
        if action_name == "move_forward":
            agent._state.position = agent._state.position + np.array(
                [0.0, 0.0, -fwd_amount], np.float32
            )
            self.previous_step_collided = False
        elif action_name in ("turn_left", "turn_right"):
            sign = 1.0 if action_name == "turn_left" else -1.0
            turn = self.config.agents[0].action_space[action_name].actuation.amount
            half = math.radians(sign * turn) / 2.0
            agent._state.rotation = _Quat(0.0, math.sin(half), 0.0, math.cos(half))
        return self._render()

    def get_sensor_observations(self):
        return self._render()

    def step_filter(self, start, end):
        out = np.asarray(end, np.float32).copy()
        out[0] = np.clip(out[0], -10.0, 10.0)  # wall at |x| = 10
        return out

    def seed(self, seed):
        self._seed = seed

    def close(self):
        self._closed = True


def _build_fake_module():
    mod = types.ModuleType("habitat_sim")

    class SimulatorConfiguration:
        pass

    class CameraSensorSpec:
        pass

    class Configuration:
        def __init__(self, backend, agents):
            self.backend = backend
            self.agents = agents

    class MultiGoalShortestPath:
        requested_start = None
        requested_ends = None
        geodesic_distance = float("inf")

    class ShortestPath:
        requested_start = None
        requested_end = None
        points = []
        geodesic_distance = float("inf")

    agent_ns = types.SimpleNamespace()

    class AgentConfiguration:
        def __init__(self):
            self.sensor_specifications = []
            self.action_space = {}
            self.height = 1.5
            self.radius = 0.1

    class ActuationSpec:
        def __init__(self, amount):
            self.amount = amount

    class ActionSpec:
        def __init__(self, name, actuation):
            self.name = name
            self.actuation = actuation

    agent_ns.AgentConfiguration = AgentConfiguration
    agent_ns.ActuationSpec = ActuationSpec
    agent_ns.ActionSpec = ActionSpec

    utils_ns = types.SimpleNamespace(
        common=types.SimpleNamespace(
            quat_from_coeffs=lambda c: _Quat(c[0], c[1], c[2], c[3])
        )
    )

    mod.SimulatorConfiguration = SimulatorConfiguration
    mod.CameraSensorSpec = CameraSensorSpec
    mod.Configuration = Configuration
    mod.Simulator = _FakeSim
    mod.SensorType = types.SimpleNamespace(DEPTH="DEPTH", COLOR="COLOR")
    mod.MultiGoalShortestPath = MultiGoalShortestPath
    mod.ShortestPath = ShortestPath
    mod.agent = agent_ns
    mod.utils = utils_ns
    return mod


@pytest.fixture
def adapter_cls(monkeypatch):
    monkeypatch.setitem(sys.modules, "habitat_sim", _build_fake_module())
    import vlnce_tpu.envs.habitat_adapter as ha

    importlib.reload(ha)
    assert ha.HABITAT_SIM_AVAILABLE
    yield ha.HabitatSimAdapter
    monkeypatch.delitem(sys.modules, "habitat_sim", raising=False)
    importlib.reload(ha)


def _sim_config():
    from vlnce_tpu.config import get_config

    cfg = get_config(opts=[
        "BASE_TASK_CONFIG_PATH", "vlnce_tpu/tasks/config/vlnce_task.yaml",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", 8,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", 8,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", 8,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", 8,
    ])
    return cfg.TASK_CONFIG.SIMULATOR


def test_adapter_full_protocol(adapter_cls):
    sim = adapter_cls(_sim_config())
    sim.reconfigure("mp3d/scene1.glb")
    obs = sim.reset()

    # marshalling: alpha dropped, depth [H,W] -> [H,W,1] clipped+normalized
    assert obs["rgb"].shape == (8, 8, 3)
    assert obs["rgb"].dtype == np.uint8
    assert obs["depth"].shape == (8, 8, 1)
    assert obs["depth"].dtype == np.float32
    np.testing.assert_allclose(obs["depth"], 0.75)  # 7.5m over [0, 10] range

    # action mapping moves the backend agent
    sim.set_agent_state([0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0])
    sim.step(1)  # MOVE_FORWARD
    state = sim.get_agent_state()
    np.testing.assert_allclose(state.position, [0.0, 0.0, -0.25], atol=1e-6)
    sim.step(2)  # TURN_LEFT -> quaternion returned as [x,y,z,w]
    q = sim.get_agent_state().rotation
    assert abs(q[3]) < 1.0 and q[1] != 0.0

    # STOP renders without stepping the backend
    pos_before = sim.get_agent_state().position
    sim.step(0)
    np.testing.assert_allclose(sim.get_agent_state().position, pos_before)

    # pathfinder delegation
    assert sim.is_navigable([1.0, 0.0, 1.0])
    assert not sim.is_navigable([11.0, 0.0, 1.0])
    np.testing.assert_allclose(sim.snap_point([12.0, 0.0, 3.0]), [10.0, 0.0, 3.0])
    d = sim.geodesic_distance([0.0, 0.0, 0.0], [3.0, 0.0, 4.0])
    assert abs(d - 5.0) < 1e-6
    d_multi = sim.geodesic_distance([0.0, 0.0, 0.0], [[3.0, 0.0, 4.0], [0.0, 0.0, 1.0]])
    assert abs(d_multi - 1.0) < 1e-6
    pts = sim.get_straight_shortest_path_points([0.0, 0.0, 0.0], [2.0, 0.0, 0.0])
    assert len(pts) == 3 and pts[-1] == [2.0, 0.0, 0.0]
    np.testing.assert_allclose(sim.step_filter([0.0, 0.0, 0.0], [15.0, 0.0, 0.0]), [10.0, 0.0, 0.0])

    # pose-conditioned rendering restores the agent pose by default
    before = sim.get_agent_state()
    obs2 = sim.get_observations_at([5.0, 0.0, 5.0], [0.0, 0.0, 0.0, 1.0])
    assert obs2["rgb"].shape == (8, 8, 3)
    np.testing.assert_allclose(sim.get_agent_state().position, before.position)
    # ... and keeps it when asked
    sim.get_observations_at([5.0, 0.0, 5.0], [0.0, 0.0, 0.0, 1.0], keep_agent_at_new_pose=True)
    np.testing.assert_allclose(sim.get_agent_state().position, [5.0, 0.0, 5.0])

    # reconfigure to the same scene reuses the backend; new scene replaces it
    n_created = len(_FakeSim.created)
    sim.reconfigure("mp3d/scene1.glb")
    assert len(_FakeSim.created) == n_created
    sim.reconfigure("mp3d/scene2.glb")
    assert len(_FakeSim.created) == n_created + 1
    assert _FakeSim.created[-2]._closed  # old backend closed

    sim.seed(3)
    sim.close()
    assert _FakeSim.created[-1]._closed


def test_adapter_registers_in_registry(adapter_cls):
    from vlnce_tpu.registry import registry

    assert registry.get_simulator("HabitatSim-v0") is adapter_cls
