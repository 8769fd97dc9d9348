#!/usr/bin/env python3
"""North-star SPL/nDTW parity evaluation against a reference checkpoint —
and the one-command asset-day driver for the device-resident path.

Ready to run when MP3D assets + habitat_sim land (SURVEY.md §6: R2R
val_unseen SPL/nDTW within 1 point of the reference checkpoints,
reference README.md:209-218). Until then the activation-level parity is
covered offline by tests/test_policy_parity.py (full-policy torch-vs-flax
forward equality) and the whole flow is dry-runnable on synthetic fixtures
(tests/test_scene_import.py::test_eval_parity_asset_day_dryrun).

Stage 1 (always): host-loop eval of the checkpoint, compared to
--expected-spl/--expected-ndtw.

Stage 2 (--resident): the device-resident scan-eval of the SAME checkpoint
on the SAME episodes, driving the full asset pipeline first when needed:

  * geometry import — if --geometry-dir has no .npz files, exports
    occupancy-grid twins via scripts/export_scene_geometry.py from
    --connectivity (the reference's connectivity_graphs.pkl,
    measures.py:336-337) or --habitat-geometry (live navmesh sampling);
  * feature bank — if --bank-dir has no .npz files, renders + encodes
    per-(node, heading) features via scripts/generate_feature_bank.py
    (the habitat backend engages automatically on MP3D task configs);
  * resident scan-eval — EVAL.ON_DEVICE_SCAN over the imported geometry
    with bank visuals, compared against BOTH the expected numbers and the
    stage-1 host-loop results (--resident-tolerance).

Usage:
    python scripts/eval_parity.py \
        --exp-config vlnce_tpu/config/experiments/r2r_baselines/cma_pm_da.yaml \
        --checkpoint data/checkpoints/CMA_PM_DA_Aug.pth \
        --expected-spl 0.27 --expected-ndtw 0.53 [--tolerance 0.01] \
        [--resident --geometry-dir data/scene_geometry \
         --connectivity data/connectivity_graphs.pkl \
         --bank-dir data/feature_banks/r2r] \
        [opts ...]

The checkpoint may be a reference torch .pth (converted transparently) or a
native checkpoint. Exits nonzero when any requested comparison exceeds its
tolerance.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _NullWriter:
    def add_scalar(self, *a, **k):
        pass

    def add_video_from_np_images(self, *a, **k):
        pass


def _run_eval(config, checkpoint: str, registry):
    trainer = registry.get_trainer(config.TRAINER_NAME)(config)
    return trainer._eval_checkpoint(checkpoint, _NullWriter(), 0)


def _run_script(main_fn, argv, logger) -> None:
    """Drive a sibling script's main() in-process (shared device backend, no
    subprocess JAX re-init) with its own argv."""
    logger.info("running: " + " ".join(argv))
    old = sys.argv
    try:
        sys.argv = list(argv)
        main_fn()
    finally:
        sys.argv = old


def _ensure_geometry(args, logger) -> None:
    """Populate --geometry-dir via export_scene_geometry when empty."""
    if glob.glob(os.path.join(args.geometry_dir, "*.npz")):
        logger.info(f"geometry: reusing {args.geometry_dir}")
        return
    from scripts.export_scene_geometry import main as export_main

    argv = ["export_scene_geometry.py", "--out-dir", args.geometry_dir]
    if args.connectivity:
        argv += ["--connectivity", args.connectivity]
    if args.habitat_geometry:
        argv += ["--habitat", "--exp-config", args.exp_config]
    _run_script(export_main, argv, logger)


def _ensure_bank(args, geometry_opts, logger) -> None:
    """Populate --bank-dir via generate_feature_bank when empty."""
    if glob.glob(os.path.join(args.bank_dir, "*.npz")):
        logger.info(f"feature bank: reusing {args.bank_dir}")
        return
    from scripts.generate_feature_bank import main as gen_main

    argv = ["generate_feature_bank.py",
            "--exp-config", args.exp_config,
            "--bank-dir", args.bank_dir,
            "--headings", str(args.bank_headings),
            "--spacing", str(args.bank_spacing)]
    if args.connectivity:
        argv += ["--connectivity", args.connectivity]
    argv += [str(o) for o in geometry_opts] + [str(o) for o in (args.opts or [])]
    argv += ["TASK_CONFIG.DATASET.SPLIT", args.split]
    _run_script(gen_main, argv, logger)


def _check(stats, expected_pairs, tolerance, tag, logger, failures) -> None:
    for name, expected in expected_pairs:
        if expected is None or name not in stats:
            continue
        got = float(stats[name])
        delta = abs(got - expected)
        status = "OK" if delta <= tolerance else "FAIL"
        logger.info(
            f"[{tag}] {name}: got {got:.4f}, expected {expected:.4f}, "
            f"|d|={delta:.4f} [{status}]"
        )
        if delta > tolerance:
            failures.append(f"{tag}:{name}")


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--exp-config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--split", default="val_unseen")
    parser.add_argument("--expected-spl", type=float, default=None)
    parser.add_argument("--expected-ndtw", type=float, default=None)
    parser.add_argument("--tolerance", type=float, default=0.01,
                        help="max |metric - expected| (1 point = 0.01)")
    parser.add_argument("--resident", action="store_true",
                        help="also run the device-resident scan-eval "
                             "(geometry import + feature bank + scan-eval)")
    parser.add_argument("--geometry-dir", default="",
                        help="scene-geometry npz dir (exported when empty); "
                             "omit to use geometry already configured/synthetic")
    parser.add_argument("--connectivity", default="",
                        help="MP3D connectivity_graphs.pkl for geometry export")
    parser.add_argument("--habitat-geometry", action="store_true",
                        help="sample the navmesh via habitat_sim instead")
    parser.add_argument("--bank-dir", default="",
                        help="feature-bank npz dir (generated when empty); "
                             "omit to scan-eval with live raycast rendering")
    parser.add_argument("--bank-headings", type=int, default=24)
    parser.add_argument("--bank-spacing", type=float, default=2.0)
    parser.add_argument("--resident-tolerance", type=float, default=0.02,
                        help="max |resident metric - host-loop metric|")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args()

    import vlnce_tpu.tasks  # noqa: F401
    import vlnce_tpu.models  # noqa: F401
    import vlnce_tpu.trainers  # noqa: F401
    from vlnce_tpu.config import get_config
    from vlnce_tpu.envs import ensure_registered
    from vlnce_tpu.envs import rl_envs  # noqa: F401
    from vlnce_tpu.registry import registry
    from vlnce_tpu.utils.logging import logger

    ensure_registered()

    base_opts = list(args.opts or [])
    geometry_opts = []
    if args.geometry_dir:
        geometry_opts = ["TASK_CONFIG.SIMULATOR.GEOMETRY_DIR", args.geometry_dir]
    eval_opts = base_opts + [
        "EVAL.SPLIT", args.split,
        "EVAL.USE_CKPT_CONFIG", False,
        "EVAL.EPISODE_COUNT", -1,  # the full split: exact-set parity
        "EVAL.SAVE_RESULTS", True,
    ]
    failures: list = []
    expected = (("spl", args.expected_spl), ("ndtw", args.expected_ndtw))

    # ---------------------------------------------------- stage 1: host loop
    if args.resident and args.geometry_dir:
        _ensure_geometry(args, logger)  # host loop steps the SAME geometry
    config = get_config(args.exp_config, eval_opts + geometry_opts)
    host_stats = _run_eval(config, args.checkpoint, registry)
    if host_stats is None:
        logger.info("eval skipped (stats file already exists) — delete it to rerun")
        return 1
    logger.info("host-loop stats: " + json.dumps(host_stats, indent=2, default=float))
    _check(host_stats, expected, args.tolerance, "host", logger, failures)

    # ------------------------------------------- stage 2: resident scan-eval
    if args.resident:
        bank_opts = []
        if args.bank_dir:
            _ensure_bank(args, geometry_opts, logger)
            bank_opts = ["TPU.FEATURE_BANK_DIR", args.bank_dir]
        resident_cfg = get_config(
            args.exp_config,
            eval_opts + geometry_opts + bank_opts + [
                "EVAL.ON_DEVICE_SCAN", True,
                # separate stats file: don't collide with stage 1's
                "RESULTS_DIR", os.path.join(config.RESULTS_DIR, "resident"),
            ],
        )
        resident_stats = _run_eval(resident_cfg, args.checkpoint, registry)
        if resident_stats is None:
            logger.info("resident eval skipped (stats exist) — delete to rerun")
            return 1
        logger.info(
            "resident scan-eval stats: "
            + json.dumps(resident_stats, indent=2, default=float)
        )
        _check(resident_stats, expected, args.tolerance, "resident", logger, failures)
        # resident vs host: same checkpoint, same episodes, same geometry —
        # the resident pipeline must agree with the host loop
        host_pairs = tuple(
            (name, float(host_stats[name]))
            for name in ("spl", "ndtw", "success")
            if name in host_stats and name in resident_stats
        )
        _check(resident_stats, host_pairs, args.resident_tolerance,
               "resident-vs-host", logger, failures)

    if failures:
        logger.info(f"PARITY FAILED for: {failures}")
        return 1
    logger.info("PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
