"""MP3D navigation-graph utilities.

The reference ships data/connectivity_graphs.pkl — a pickled
{scene_id: networkx.Graph} of MP3D panorama nodes — consumed by the
TopDownMapVLNCE overlay and nearest-node tracking (reference
habitat_extensions/maps.py:277-343, measures.py:336-337). This module loads
that exact format, tracks the nearest node along an agent path, draws node
overlays, and can synthesize a lattice graph for procedural GridWorld scenes
so the same code paths run without MP3D assets.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def load_connectivity_graphs(path: str) -> Optional[Dict[str, "object"]]:
    """{scene_id: networkx.Graph}; nodes carry pos attributes."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)


def synthetic_lattice_graph(world_size: float = 16.0, spacing: float = 2.0):
    """Lattice nav graph over the GridWorld corridor grid (nodes at the
    carved 2m lattice crossings)."""
    import networkx as nx

    g = nx.Graph()
    ticks = np.arange(1.0, world_size, spacing)
    for x in ticks:
        for z in ticks:
            g.add_node((float(x), float(z)), position=[float(x), 0.0, float(z)])
    for x in ticks:
        for z in ticks:
            if x + spacing < world_size:
                g.add_edge((float(x), float(z)), (float(x + spacing), float(z)))
            if z + spacing < world_size:
                g.add_edge((float(x), float(z)), (float(x), float(z + spacing)))
    return g


def _node_position(graph, node) -> np.ndarray:
    data = graph.nodes[node]
    pos = data.get("position", data.get("pos", node))
    pos = np.asarray(pos, dtype=np.float64)
    if pos.shape[-1] == 2:
        pos = np.array([pos[0], 0.0, pos[1]])
    return pos


def get_nearest_node(graph, position: Sequence[float]):
    """Closest graph node to a world position (XZ distance); reference
    maps.py:277-295."""
    p = np.asarray(position, dtype=np.float64)
    best, best_d = None, np.inf
    for node in graph.nodes:
        q = _node_position(graph, node)
        d = float(np.hypot(q[0] - p[0], q[-1] - p[-1]))
        if d < best_d:
            best, best_d = node, d
    return best


def update_nearest_node(graph, current_node, position: Sequence[float]):
    """Nearest among the current node and its graph neighbors — a single
    reachability-constrained hop per step, so the drawn node path follows
    nav-graph edges (reference maps.py:298-318)."""
    p = np.asarray(position, dtype=np.float64)

    def dist(node):
        q = _node_position(graph, node)
        return float(np.hypot(q[0] - p[0], q[-1] - p[-1]))

    candidates = [current_node] + [e[1] for e in graph.edges(current_node)]
    return min(candidates, key=dist)


def draw_nav_graph(img: np.ndarray, graph, world_size: float = 16.0) -> np.ndarray:
    """Overlay graph edges + nodes on a top-down INDEX map (indicator ids;
    reference maps.py:321-343 draws only nodes — edges are an extra here)."""
    import cv2

    from vlnce_tpu.utils.maps import MAP_MP3D_WAYPOINT, to_grid, drawpoint

    shape = img.shape[0:2]
    meters_per_px = world_size / shape[0]
    for a, b in graph.edges:
        ra, ca = to_grid(*_node_position(graph, a)[[0, -1]], shape, world_size)
        rb, cb = to_grid(*_node_position(graph, b)[[0, -1]], shape, world_size)
        cv2.line(img, (ca, ra), (cb, rb), MAP_MP3D_WAYPOINT, 1)
    for node in graph.nodes:
        pos = _node_position(graph, node)
        drawpoint(img, to_grid(pos[0], pos[-1], shape, world_size), MAP_MP3D_WAYPOINT, meters_per_px, pad=0.15)
    return img
