"""Top-down map drawing primitives (host-side viz, off the hot path).

Covers the map machinery of reference habitat_extensions/maps.py:14-343 and
the TopDownMapVLNCE data collection: occupancy-derived top-down images,
agent/reference/shortest path overlays, and waypoint markers. cv2-based.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from vlnce_tpu.tasks.geometry import heading_from_quaternion

# colors (BGR-agnostic RGB tuples)
MAP_INVALID_POINT = (255, 255, 255)
MAP_VALID_POINT = (150, 150, 150)
MAP_BORDER_INDICATOR = (50, 50, 50)
MAP_SOURCE_POINT_INDICATOR = (0, 0, 200)
MAP_TARGET_POINT_INDICATOR = (200, 0, 0)
MAP_AGENT_COLOR = (0, 200, 0)
MAP_REFERENCE_POINT = (0, 0, 255)
MAP_SHORTEST_PATH_COLOR = (0, 150, 250)
MAP_WAYPOINT_PREDICTION = (255, 140, 0)


def agent_heading(state) -> float:
    return heading_from_quaternion(state.rotation)


def make_top_down_map(sim, config) -> np.ndarray:
    """Render the scene occupancy into an RGB map image."""
    resolution = int(getattr(config, "MAP_RESOLUTION", 256))
    scene = getattr(sim, "_scene", None)
    if scene is None:
        return np.full((resolution, resolution, 3), 255, dtype=np.uint8)
    occ = scene.occupancy
    img = np.where(occ[..., None], np.array(MAP_BORDER_INDICATOR, dtype=np.uint8), np.array(MAP_VALID_POINT, dtype=np.uint8))
    try:
        import cv2

        img = cv2.resize(img.astype(np.uint8), (resolution, resolution), interpolation=cv2.INTER_NEAREST)
    except ImportError:  # pragma: no cover
        pass
    return img.astype(np.uint8)


def world_to_map_xy(pos: Sequence[float], map_resolution: int, world_size: float = 16.0) -> Tuple[int, int]:
    x = int(np.clip(pos[0] / world_size * map_resolution, 0, map_resolution - 1))
    z = int(np.clip(pos[-1] / world_size * map_resolution, 0, map_resolution - 1))
    return x, z


def draw_path(img: np.ndarray, path: List[Sequence[float]], color, thickness: int = 2, world_size: float = 16.0) -> np.ndarray:
    import cv2

    res = img.shape[0]
    pts = [world_to_map_xy(p, res, world_size) for p in path]
    for a, b in zip(pts[:-1], pts[1:]):
        cv2.line(img, a, b, color, thickness)
    return img


def draw_point(img: np.ndarray, pos: Sequence[float], color, radius: int = 4, world_size: float = 16.0) -> np.ndarray:
    import cv2

    res = img.shape[0]
    cv2.circle(img, world_to_map_xy(pos, res, world_size), radius, color, -1)
    return img


def draw_agent(img: np.ndarray, pos: Sequence[float], heading: float, color=MAP_AGENT_COLOR, world_size: float = 16.0) -> np.ndarray:
    import cv2

    res = img.shape[0]
    x, z = world_to_map_xy(pos, res, world_size)
    tip = (
        int(x - 10 * math.sin(heading)),
        int(z - 10 * math.cos(heading)),
    )
    cv2.circle(img, (x, z), 5, color, -1)
    cv2.line(img, (x, z), tip, color, 2)
    return img


def reveal_fog_of_war(
    occupancy: np.ndarray,
    fog_mask: np.ndarray,
    position,
    heading: float,
    fov_deg: float = 90.0,
    visibility_dist: float = 5.0,
    world_size: float = 16.0,
    num_rays: int = 90,
) -> np.ndarray:
    """Reveal the agent's view cone in the fog mask with occlusion raycasts
    over the scene occupancy grid (habitat fog_of_war equivalent used by
    TopDownMapVLNCE, reference measures.py:116-119 config)."""
    n = occupancy.shape[0]
    cell = world_size / n
    fog = fog_mask
    half = math.radians(fov_deg) / 2.0
    ci = position[0] / cell
    cj = position[-1] / cell
    max_steps = int(visibility_dist / (0.5 * cell))
    for ang in np.linspace(heading - half, heading + half, num_rays):
        dx = -math.sin(ang) / 2.0  # half-cell steps along the view ray
        dz = -math.cos(ang) / 2.0
        x, z = ci, cj
        for _ in range(max_steps):
            i, j = int(x), int(z)
            if not (0 <= i < n and 0 <= j < n):
                break
            fog[i, j] = 1
            if occupancy[i, j]:
                break
            x += dx
            z += dz
    return fog


def apply_fog_of_war(map_img: np.ndarray, fog_mask: np.ndarray, dim: float = 0.5) -> np.ndarray:
    """Darken unexplored regions of a rendered top-down map."""
    import cv2

    res = map_img.shape[0]
    mask = cv2.resize(fog_mask.astype(np.uint8), (res, res), interpolation=cv2.INTER_NEAREST)
    out = map_img.astype(np.float32)
    out[mask == 0] *= dim
    return out.astype(np.uint8)


def colorize_topdown_metric(metric: dict, world_size: float = 16.0) -> np.ndarray:
    """Render the TopDownMapVLNCE metric dict into a frame."""
    import cv2

    img = metric["map"].copy()
    if metric.get("fog_of_war_mask") is not None:
        img = apply_fog_of_war(img, metric["fog_of_war_mask"])
    if metric.get("shortest_path"):
        draw_path(img, metric["shortest_path"], MAP_SHORTEST_PATH_COLOR, world_size=world_size)
    if metric.get("reference_path"):
        draw_path(img, metric["reference_path"], MAP_REFERENCE_POINT, world_size=world_size)
        for p in metric["reference_path"]:
            draw_point(img, p, MAP_REFERENCE_POINT, radius=3, world_size=world_size)
    if metric.get("agent_path"):
        draw_path(img, metric["agent_path"], MAP_AGENT_COLOR, world_size=world_size)
    if metric.get("source"):
        draw_point(img, metric["source"], MAP_SOURCE_POINT_INDICATOR, radius=5, world_size=world_size)
    if metric.get("target"):
        draw_point(img, metric["target"], MAP_TARGET_POINT_INDICATOR, radius=5, world_size=world_size)
    if metric.get("nav_graph") is not None:
        from vlnce_tpu.utils.nav_graph import draw_nav_graph

        draw_nav_graph(img, metric["nav_graph"], world_size=world_size)
    draw_agent(img, metric["agent_position"], metric["agent_heading"], world_size=world_size)
    cv2.rectangle(img, (0, 0), (img.shape[1] - 1, img.shape[0] - 1), MAP_BORDER_INDICATOR, 2)
    return img
