"""Greedy geodesic shortest-path follower (the oracle/expert).

Produces the next discrete action toward a goal. Covers both follower
variants of the reference (habitat ShortestPathFollower and the v0.1.4-compat
ShortestPathFollowerCompat, reference habitat_extensions/
shortest_path_follower.py:25-199): follow the geodesic path polyline by
steering toward the next path point, turning toward it when off-heading and
stepping forward otherwise.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Union

import numpy as np

from vlnce_tpu.envs.sim import Simulator, SimulatorActions
from vlnce_tpu.tasks.geometry import heading_from_quaternion

EPSILON = 1e-6


class ShortestPathFollower:
    def __init__(self, sim: Simulator, goal_radius: float, return_one_hot: bool = True):
        self._sim = sim
        self._goal_radius = goal_radius
        self._return_one_hot = return_one_hot
        self._max_delta = 0.25  # path point advance radius

    def _one_hot(self, action: int) -> np.ndarray:
        out = np.zeros(4, dtype=np.float32)
        out[action] = 1.0
        return out

    def get_next_action(self, goal_pos: Sequence[float]) -> Optional[Union[int, np.ndarray]]:
        """None is returned by convention when already within the goal radius
        (callers map it to STOP, reference habitat_extensions/sensors.py:
        149-153)."""
        state = self._sim.get_agent_state()
        agent_pos = state.position
        d_goal = self._sim.geodesic_distance(list(agent_pos), list(goal_pos))
        if d_goal <= self._goal_radius or not np.isfinite(d_goal):
            return None

        points = self._sim.get_straight_shortest_path_points(list(agent_pos), list(goal_pos))
        # first path point sufficiently ahead of the agent
        target = None
        for p in points[1:]:
            if np.linalg.norm(np.array(p)[[0, 2]] - agent_pos[[0, 2]]) > 0.5 * self._max_delta:
                target = np.array(p)
                break
        if target is None:
            target = np.asarray(goal_pos, dtype=np.float64)

        heading = heading_from_quaternion(state.rotation)
        to_target = target[[0, 2]] - agent_pos[[0, 2]]
        desired = math.atan2(-to_target[0], -to_target[1]) % (2 * math.pi)
        delta = (desired - heading + math.pi) % (2 * math.pi) - math.pi

        turn_threshold = math.radians(self._turn_angle_deg()) / 2.0 + EPSILON
        if abs(delta) <= turn_threshold:
            action = SimulatorActions.MOVE_FORWARD
        elif delta > 0:
            action = SimulatorActions.TURN_LEFT
        else:
            action = SimulatorActions.TURN_RIGHT

        if self._return_one_hot:
            return self._one_hot(action)
        return action

    def _turn_angle_deg(self) -> float:
        return float(getattr(getattr(self._sim, "config", None), "TURN_ANGLE", 15))


# Compatibility alias: the reference keeps a legacy follower for dataset-
# generation parity (selected by USE_ORIGINAL_FOLLOWER); both map here.
ShortestPathFollowerCompat = ShortestPathFollower
