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
    """Hill-climb to a nearer neighbor instead of a global search; reference
    maps.py:298-318."""
    p = np.asarray(position, dtype=np.float64)

    def dist(node):
        q = _node_position(graph, node)
        return float(np.hypot(q[0] - p[0], q[-1] - p[-1]))

    best = current_node
    improved = True
    while improved:
        improved = False
        for nb in graph.neighbors(best):
            if dist(nb) < dist(best):
                best = nb
                improved = True
    return best


def draw_nav_graph(
    img: np.ndarray, graph, world_size: float = 16.0,
    node_color=(120, 120, 200), edge_color=(160, 160, 220),
) -> np.ndarray:
    """Overlay graph nodes/edges on a top-down map image; reference
    maps.py:321-343 (draw_mp3d_nodes)."""
    import cv2

    from vlnce_tpu.utils.maps import world_to_map_xy

    res = img.shape[0]
    for a, b in graph.edges:
        pa = world_to_map_xy(_node_position(graph, a), res, world_size)
        pb = world_to_map_xy(_node_position(graph, b), res, world_size)
        cv2.line(img, pa, pb, edge_color, 1)
    for node in graph.nodes:
        cv2.circle(img, world_to_map_xy(_node_position(graph, node), res, world_size), 2, node_color, -1)
    return img
