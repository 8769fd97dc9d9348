#!/usr/bin/env python3
"""Export real-scene geometry grids for the device-resident pipelines.

Writes ``{out_dir}/{scene_stem}.npz`` occupancy-grid twins
(envs/scene_import.py schema) from either source:

  * ``--connectivity data/connectivity_graphs.pkl`` — the reference's MP3D
    panorama graph asset (reference habitat_extensions/measures.py:336-337);
    walkable corridors are rasterized around nodes+edges. Works with no
    simulator installed — the asset-light path.
  * ``--habitat --exp-config <mp3d task>`` — samples the true navmesh through
    a live habitat_sim instance (``pathfinder.is_navigable`` per cell,
    reference habitat_extensions/actions.py:37-55 surface). Requires
    habitat_sim + MP3D scenes on disk; preferred on asset day.

At runtime, point ``TASK_CONFIG.SIMULATOR.GEOMETRY_DIR`` at ``--out-dir``:
every host and device pipeline then steps the exported geometry, and
scripts/generate_feature_bank.py supplies matching real visuals.

Usage:
    python scripts/export_scene_geometry.py \
        --connectivity data/connectivity_graphs.pkl \
        --out-dir data/scene_geometry [--scenes 17DRP5sb8fy ...]
    python scripts/export_scene_geometry.py \
        --habitat --exp-config vlnce_tpu/config/experiments/cma.yaml \
        --out-dir data/scene_geometry
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--connectivity", default="",
                    help="MP3D connectivity_graphs.pkl to rasterize")
    ap.add_argument("--habitat", action="store_true",
                    help="sample the navmesh through habitat_sim (needs assets)")
    ap.add_argument("--exp-config", default="",
                    help="experiment yaml naming the dataset (scene selection; "
                         "required with --habitat)")
    ap.add_argument("--scenes", nargs="*", default=None,
                    help="scene stems to export (default: all in the source)")
    ap.add_argument("--corridor-radius", type=float, default=None,
                    help="graph rasterization corridor half-width in meters")
    ap.add_argument("opts", nargs="*", default=[])
    args = ap.parse_args()
    if not args.connectivity and not args.habitat:
        ap.error("need --connectivity and/or --habitat")

    from vlnce_tpu.envs import scene_import as si
    from vlnce_tpu.utils.logging import logger

    os.makedirs(args.out_dir, exist_ok=True)
    exported = {}

    if args.connectivity:
        kw = {}
        if args.corridor_radius is not None:
            kw["corridor_radius"] = args.corridor_radius
        scenes = si.import_connectivity_graphs(
            args.connectivity, scene_ids=args.scenes, register=False, **kw
        )
        exported.update(scenes)
        logger.info(f"rasterized {len(scenes)} scenes from {args.connectivity}")

    if args.habitat:
        if not args.exp_config:
            raise SystemExit("--habitat requires --exp-config to name the dataset")
        try:
            import habitat_sim  # noqa: F401
        except ImportError:
            raise SystemExit(
                "--habitat requires habitat_sim; in asset-less environments "
                "use --connectivity instead"
            )
        from vlnce_tpu.config import get_config
        # import the adapter module (not the class) AFTER the habitat_sim
        # check so the faked-backend tests can reload it underneath us
        from vlnce_tpu.envs import habitat_adapter
        from vlnce_tpu.tasks.datasets import make_dataset

        cfg = get_config(args.exp_config, opts=list(args.opts) or None)
        task_cfg = cfg.TASK_CONFIG
        dataset = make_dataset(task_cfg.DATASET.TYPE, task_cfg.DATASET)
        scene_ids = sorted({ep.scene_id for ep in dataset.episodes})
        if args.scenes:
            want = set(args.scenes)
            scene_ids = [s for s in scene_ids if si._scene_stem(s) in want]
        sim = habitat_adapter.HabitatSimAdapter(task_cfg.SIMULATOR)
        for scene_id in scene_ids:
            sim.reconfigure(scene_id)
            stem = si._scene_stem(scene_id)
            exported[stem] = si.scene_from_habitat(stem, sim._sim)
            logger.info(f"sampled navmesh for {stem}")
        sim.close()

    for stem, scene in exported.items():
        out = os.path.join(args.out_dir, f"{si._scene_stem(stem)}.npz")
        si.save_scene_geometry(out, scene)
        logger.info(
            f"{stem}: {scene.n}x{scene.n} cells @ origin {scene.origin} -> {out}"
        )
    logger.info(f"{len(exported)} scenes exported; set "
                f"TASK_CONFIG.SIMULATOR.GEOMETRY_DIR={args.out_dir} to use them")


if __name__ == "__main__":
    main()
