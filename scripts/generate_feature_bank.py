#!/usr/bin/env python3
"""Generate per-scene visual feature banks for the device-resident scan
paths (data/feature_bank.py).

For every scene referenced by the configured dataset split, this renders
observations at each (nav node, heading bin) pose, runs the policy's FROZEN
encoders once per pose, and writes ``{bank_dir}/{scene}.npz`` in the bank
schema. At runtime the closed-loop scan (EVAL.ON_DEVICE_SCAN with
TPU.FEATURE_BANK_DIR set) replaces per-step raycasts with one MXU-shaped
bank lookup per step — the reference's precompute pattern
(habitat_extensions/sensors.py:186-196 BERT features,
resnet_encoders.py:92-95 cached rgb/depth features) promoted to whole
scenes.

Node selection:
  * an MP3D connectivity graph pickle when given (--connectivity, the same
    asset TopDownMapVLNCE uses — reference measures.py:336-337), or
  * a lattice over navigable cells at --spacing meters (synthetic scenes).

Renderer backends:
  * GridWorldSim-v0 scenes render through the device raycaster — this is
    the fully-testable synthetic path available in this environment;
  * when real MP3D assets + habitat_sim are installed, point --exp-config
    at the MP3D task: poses render through HabitatAdapter
    sim.get_observations_at (envs/habitat_adapter.py) and feed the SAME
    encoder path. Geometry grids (occupancy/geodesics) for device stepping
    must then be exported from the navmesh — see envs/device_sim.py
    SceneBatch for the contract.

Usage:
    python scripts/generate_feature_bank.py \
        --exp-config vlnce_tpu/config/experiments/synthetic/smoke_seq2seq.yaml \
        --bank-dir data/feature_banks/synthetic \
        --headings 24 --spacing 2.0 \
        [opts ...]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def lattice_nodes(scene, spacing: float) -> np.ndarray:
    """Navigable-cell lattice at `spacing` meters -> [M, 2] world (x, z).

    The lattice phase is chosen per scene: imported corridor grids
    (envs/scene_import.py) are navigable only on thin corridor tubes whose
    world positions depend on the source graph, so a fixed cell-0 anchor can
    miss every corridor. Search all k*k stride offsets and keep the one
    covering the most navigable cells."""
    n = scene.occupancy.shape[0]
    res = scene.cell_to_world(1, 0)[0] - scene.cell_to_world(0, 0)[0]
    k = max(1, int(round(spacing / res)))
    nav = ~scene.occupancy.astype(bool)
    best, best_count = (0, 0), -1
    for oi in range(min(k, n)):
        for oj in range(min(k, n)):
            count = int(nav[oi::k, oj::k].sum())
            if count > best_count:
                best, best_count = (oi, oj), count
    if best_count <= 0:
        raise RuntimeError(f"no navigable lattice nodes in scene {scene.scene_id}")
    oi, oj = best
    nodes = [
        scene.cell_to_world(i, j)
        for i in range(oi, n, k)
        for j in range(oj, n, k)
        if nav[i, j]
    ]
    return np.asarray(nodes, np.float32)


def graph_nodes(graph) -> np.ndarray:
    """Connectivity-graph nodes -> [M, 2] world (x, z)."""
    from vlnce_tpu.utils.nav_graph import _node_position

    return np.asarray(
        [[_node_position(graph, n)[0], _node_position(graph, n)[-1]] for n in graph.nodes],
        np.float32,
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--exp-config", required=True)
    ap.add_argument("--bank-dir", required=True)
    ap.add_argument("--headings", type=int, default=24,
                    help="heading bins (24 = one per 15-degree R2R turn)")
    ap.add_argument("--spacing", type=float, default=2.0,
                    help="lattice node spacing in meters (no connectivity graph)")
    ap.add_argument("--connectivity", default="",
                    help="MP3D connectivity_graphs.pkl (optional)")
    ap.add_argument("--chunk", type=int, default=256,
                    help="poses encoded per device dispatch")
    ap.add_argument("opts", nargs="*", default=[])
    args = ap.parse_args()

    import vlnce_tpu.models  # noqa: F401  (registry population)
    import vlnce_tpu.tasks  # noqa: F401
    import vlnce_tpu.trainers  # noqa: F401
    from vlnce_tpu.envs import rl_envs  # noqa: F401
    from vlnce_tpu.config import get_config
    from vlnce_tpu.data.feature_bank import encode_scene_bank, save_scene_bank
    from vlnce_tpu.envs import ensure_registered
    from vlnce_tpu.envs.device_sim import camera_specs_from_config
    from vlnce_tpu.envs.gridworld import get_scene
    from vlnce_tpu.registry import registry
    from vlnce_tpu.tasks.datasets import make_dataset
    from vlnce_tpu.utils.logging import logger
    from vlnce_tpu.utils.nav_graph import load_connectivity_graphs

    ensure_registered()
    cfg = get_config(args.exp_config, opts=list(args.opts) or None)
    task_cfg = cfg.TASK_CONFIG
    if task_cfg.SIMULATOR.TYPE != "GridWorldSim-v0":
        raise SystemExit(
            "this generator renders through the device grid world; for real "
            "MP3D scenes run it in an environment with habitat_sim installed "
            "(HabitatAdapter get_observations_at renders the poses, same "
            "encoder path). SIMULATOR.TYPE=" + str(task_cfg.SIMULATOR.TYPE)
        )

    from vlnce_tpu.envs.scene_import import apply_scene_geometry

    apply_scene_geometry(task_cfg.SIMULATOR)  # real-scene grids, if configured
    dataset = make_dataset(task_cfg.DATASET.TYPE, task_cfg.DATASET)
    scene_ids = sorted({ep.scene_id for ep in dataset.episodes})
    logger.info(f"{len(scene_ids)} scenes, {args.headings} heading bins")

    graphs = load_connectivity_graphs(args.connectivity) if args.connectivity else None
    specs = camera_specs_from_config(task_cfg.SIMULATOR)
    # the production trainer machinery supplies spaces, transforms, and the
    # (optionally checkpoint-loaded) policy whose frozen encoders define the
    # bank features
    trainer = registry.get_trainer(cfg.TRAINER_NAME)(cfg)
    obs_space, act_space = trainer._get_spaces(cfg)
    trainer._initialize_policy(
        cfg, load_from_ckpt=bool(cfg.IL.load_from_ckpt),
        observation_space=obs_space, action_space=act_space,
    )
    policy, transforms = trainer.policy, trainer.obs_transforms

    os.makedirs(args.bank_dir, exist_ok=True)
    H = args.headings
    headings = (2.0 * np.pi / H) * np.arange(H, dtype=np.float32)

    from vlnce_tpu.envs.scene_import import _scene_stem

    for scene_id in scene_ids:
        scene = get_scene(scene_id)
        # the reference's connectivity_graphs.pkl keys by scene STEM
        # ('17DRP5sb8fy'), episode scene_ids carry the full relative path —
        # match both (same normalization as scene_import.scenes_from_connectivity)
        graph = None
        if graphs is not None:
            graph = graphs.get(scene_id) or graphs.get(_scene_stem(scene_id))
        if graph is not None:
            nodes = graph_nodes(graph)
        else:
            nodes = lattice_nodes(scene, args.spacing)
        M = nodes.shape[0]
        # fixed-size padded chunks: one compiled render+encode shape for the
        # whole run (a ragged final chunk recompiles per distinct remainder)
        rgb_all, depth_all, rgb_shape, depth_shape = encode_scene_bank(
            policy, transforms, specs, scene, nodes, headings, chunk=args.chunk
        )

        out = os.path.join(args.bank_dir, f"{os.path.splitext(os.path.basename(scene_id))[0]}.npz")
        save_scene_bank(out, nodes, rgb_all, depth_all, rgb_shape, depth_shape)
        logger.info(
            f"{scene_id}: {M} nodes -> {out} "
            f"({(rgb_all.nbytes + depth_all.nbytes) / 2**21:.1f} MiB f16)"
        )


if __name__ == "__main__":
    main()
