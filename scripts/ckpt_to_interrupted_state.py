#!/usr/bin/env python3
"""Convert a training checkpoint into a requeue interrupted-state file.

Parity with reference scripts/ckpt_to_interrupted_state.py:1-43: lets a
DD-PPO run restart from an arbitrary checkpoint via
RL.DDPPO.start_from_requeue + requeue_path.

Usage:
    python scripts/ckpt_to_interrupted_state.py --ckpt ckpt.5.ckpt \
        --out data/interrupted_state.ckpt [--update 1250]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--out", default="data/interrupted_state.ckpt")
    parser.add_argument("--update", type=int, default=0, help="update counter to resume from")
    args = parser.parse_args()

    from vlnce_tpu.utils.checkpoints import load_checkpoint, save_checkpoint
    from vlnce_tpu.config.node import Config

    ckpt = load_checkpoint(args.ckpt)
    extra = dict(ckpt.get("extra_state") or {})
    extra.setdefault("update", args.update)
    extra.setdefault("count_steps", 0)

    config = None
    if "config_yaml" in ckpt:
        import yaml

        config = Config(yaml.safe_load(ckpt["config_yaml"]))
    save_checkpoint(
        args.out, ckpt["state_dict"], config=config,
        optim_state=ckpt.get("optim_state"), extra_state=extra,
    )
    print(f"wrote interrupted state to {args.out} (resume update {extra['update']})")


if __name__ == "__main__":
    main()
