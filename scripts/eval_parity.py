#!/usr/bin/env python3
"""North-star SPL/nDTW parity evaluation against a reference checkpoint.

Ready to run when MP3D assets + habitat_sim land (SURVEY.md §6: R2R
val_unseen SPL/nDTW within 1 point of the reference checkpoints). Until
then the activation-level parity is covered offline by
tests/test_policy_parity.py (full-policy torch-vs-flax forward equality).

Usage:
    python scripts/eval_parity.py \
        --exp-config vlnce_tpu/config/experiments/r2r_baselines/cma_pm_da.yaml \
        --checkpoint data/checkpoints/CMA_PM_DA_Aug.pth \
        --expected-spl 0.27 --expected-ndtw 0.53 [--tolerance 0.01] \
        [opts ...]

The checkpoint may be a reference torch .pth (converted transparently) or a
native checkpoint. Exits nonzero when |SPL - expected| or |nDTW - expected|
exceeds the tolerance.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--exp-config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--split", default="val_unseen")
    parser.add_argument("--expected-spl", type=float, default=None)
    parser.add_argument("--expected-ndtw", type=float, default=None)
    parser.add_argument("--tolerance", type=float, default=0.01,
                        help="max |metric - expected| (1 point = 0.01)")
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

    opts = list(args.opts or [])
    opts += [
        "EVAL.SPLIT", args.split,
        "EVAL.USE_CKPT_CONFIG", False,
        "EVAL.EPISODE_COUNT", -1,  # the full split: exact-set parity
        "EVAL.SAVE_RESULTS", True,
    ]
    config = get_config(args.exp_config, opts)

    trainer = registry.get_trainer(config.TRAINER_NAME)(config)

    class _NullWriter:
        def add_scalar(self, *a, **k):
            pass

        def add_video_from_np_images(self, *a, **k):
            pass

    stats = trainer._eval_checkpoint(args.checkpoint, _NullWriter(), 0)
    if stats is None:
        logger.info("eval skipped (stats file already exists) — delete it to rerun")
        return 1
    logger.info("parity eval stats: " + json.dumps(stats, indent=2, default=float))

    failures = []
    for name, expected in (("spl", args.expected_spl), ("ndtw", args.expected_ndtw)):
        if expected is None or name not in stats:
            continue
        got = float(stats[name])
        delta = abs(got - expected)
        status = "OK" if delta <= args.tolerance else "FAIL"
        logger.info(f"{name}: got {got:.4f}, expected {expected:.4f}, |d|={delta:.4f} [{status}]")
        if delta > args.tolerance:
            failures.append(name)

    if failures:
        logger.info(f"PARITY FAILED for: {failures}")
        return 1
    logger.info("PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
