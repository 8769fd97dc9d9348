#!/usr/bin/env python3
"""Single entry point: train / eval / inference.

CLI parity with reference run.py:22-43:
    python run.py --exp-config path/to/experiment.yaml \
        --run-type {train,eval,inference} [KEY VALUE ...]
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np

# persistent XLA compilation cache: the big jitted programs (rollout scans,
# sharded train steps) take minutes to compile on remote-attached chips; the
# cache makes every run after the first start in seconds. Overridable, and
# harmless on CPU.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compilation_cache")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--run-type",
        choices=["train", "eval", "inference"],
        required=True,
        help="run type of the experiment (train, eval, inference)",
    )
    parser.add_argument(
        "--exp-config",
        type=str,
        required=True,
        help="path to config yaml containing info about experiment",
    )
    parser.add_argument(
        "opts",
        default=None,
        nargs=argparse.REMAINDER,
        help="Modify config options from command line",
    )
    args = parser.parse_args()
    run_exp(args.exp_config, args.run_type, args.opts)


def run_exp(exp_config: str, run_type: str, opts=None) -> None:
    import jax

    from vlnce_tpu.config import get_config
    from vlnce_tpu.utils.logging import logger

    # populate registries
    import vlnce_tpu.tasks  # noqa: F401
    import vlnce_tpu.models  # noqa: F401
    from vlnce_tpu.envs import ensure_registered
    from vlnce_tpu.envs import rl_envs  # noqa: F401
    import vlnce_tpu.trainers  # noqa: F401

    ensure_registered()

    # multi-host init (jax.distributed over SLURM / TPU-pod env vars) must
    # run before any device use so the global mesh spans all hosts; a no-op
    # on single-host runs (reference init_distrib_slurm analog,
    # ddppo_waypoint_trainer.py:310)
    from vlnce_tpu.parallel.distributed import init_distributed

    multihost = init_distributed()

    config = get_config(exp_config, opts)
    logger.info(f"config: {config.dump()}" if config.VERBOSE else f"run_type: {run_type}")
    if config.LOG_FILE:
        log_file = config.LOG_FILE
        if multihost:
            log_file = f"{log_file}.rank{jax.process_index()}"
        logger.add_filehandler(log_file)

    random.seed(config.TASK_CONFIG.SEED)
    np.random.seed(config.TASK_CONFIG.SEED)

    # nonlearning shortcuts (reference run.py:71-77)
    from vlnce_tpu.trainers.nonlearning_agents import (
        evaluate_agent,
        nonlearning_inference,
    )

    if run_type == "eval" and config.EVAL.EVAL_NONLEARNING:
        evaluate_agent(config)
        return
    if run_type == "inference" and config.INFERENCE.INFERENCE_NONLEARNING:
        nonlearning_inference(config)
        return

    from vlnce_tpu.registry import registry

    trainer_cls = registry.get_trainer(config.TRAINER_NAME)
    trainer = trainer_cls(config)
    getattr(trainer, run_type)()


if __name__ == "__main__":
    main()
