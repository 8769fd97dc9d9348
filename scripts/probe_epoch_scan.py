#!/usr/bin/env python3
"""Isolated comparison of the two resident-DAgger epoch execution modes on
one pre-collected HBM bank: per-batch dispatch (ResidentBatchIterator +
train_step per batch) vs the fused epoch scan (run_fused_epoch,
TPU.RESIDENT_EPOCH_SCAN). bench.py --dagger-collect times collect+epoch
together, so relay variance in collection can mask the epoch delta; this
probe collects ONCE and times only the epochs, interleaved A/B to cancel
drift. Diagnostic only; not part of the driver bench.
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compilation_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 32
RGB_HW, DEPTH_HW = 224, 256
REPS = 5


def main() -> None:
    import jax
    import optax
    from gymnasium import spaces as gspaces

    from vlnce_tpu.config import get_config
    from vlnce_tpu.models.cma_policy import CMAPolicy
    from vlnce_tpu.ops.obs_transforms import get_active_obs_transforms
    from vlnce_tpu.tasks.datasets import make_dataset
    from vlnce_tpu.trainers.device_dagger import collect_episodes_resident
    from vlnce_tpu.data.device_bank import ResidentBatchIterator, run_fused_epoch
    from vlnce_tpu.parallel.il_step import build_il_train_step

    cfg = get_config(
        opts=[
            "BASE_TASK_CONFIG_PATH", "vlnce_tpu/tasks/config/vlnce_task.yaml",
            "TASK_CONFIG.DATASET.TYPE", "Synthetic-VLN-v0",
            "TASK_CONFIG.DATASET.NUM_EPISODES", B,
            "NUM_ENVIRONMENTS", B,
            "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False,
            "MODEL.INSTRUCTION_ENCODER.bidirectional", True,
        ]
    )
    episodes = list(make_dataset("Synthetic-VLN-v0", cfg.TASK_CONFIG.DATASET).episodes)
    space = gspaces.Dict(
        {
            "rgb": gspaces.Box(0, 255, (RGB_HW, RGB_HW, 3), np.uint8),
            "depth": gspaces.Box(0, 1, (DEPTH_HW, DEPTH_HW, 1), np.float32),
            "instruction": gspaces.Box(0, 10000, (200,), np.int32),
            "progress": gspaces.Box(0, 1, (1,), np.float32),
        }
    )
    policy = CMAPolicy.from_config(cfg, space, gspaces.Discrete(4))
    policy.init_params(jax.random.PRNGKey(0), batch_size=B)
    transforms = get_active_obs_transforms(cfg)

    bank = collect_episodes_resident(
        policy, transforms, cfg, episodes, 1.0, jax.random.PRNGKey(3)
    )
    print(f"bank: {len(bank)} episodes, {bank.num_steps} steps")

    optimizer = optax.adam(2.5e-4)
    train_step = build_il_train_step(
        policy.module, optimizer, policy.num_recurrent_layers, policy.hidden_size
    )

    def fresh_state():
        params = jax.tree_util.tree_map(lambda x: x + 0, policy.params)
        return params, optimizer.init(params)

    def epoch_per_batch(state):
        params, opt = state
        for batch in ResidentBatchIterator(bank, batch_size=8, seed=1, time_major=True):
            obs_tn, prev_tn, masks_tn, corrected, weights = batch
            params, opt, loss, _, _ = train_step(
                params, opt, obs_tn, prev_tn, masks_tn, corrected, weights
            )
        float(loss)  # readback barrier
        return params, opt

    scan_cache = {}

    def epoch_scan(state):
        params, opt = state
        riter = ResidentBatchIterator(bank, batch_size=8, seed=1, time_major=True)
        params, opt, triples = run_fused_epoch(
            params, opt, riter, policy.module, optimizer,
            policy.num_recurrent_layers, policy.hidden_size, None, scan_cache,
        )
        assert triples
        return params, opt

    # warm both (compiles)
    sa, sb = fresh_state(), fresh_state()
    sa = epoch_per_batch(sa)
    sb = epoch_scan(sb)

    t_batch, t_scan = [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        sa = epoch_per_batch(sa)
        t_batch.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        sb = epoch_scan(sb)
        t_scan.append(time.perf_counter() - t0)

    fmt = lambda ts: f"min {min(ts)*1e3:7.1f}  med {sorted(ts)[len(ts)//2]*1e3:7.1f}  max {max(ts)*1e3:7.1f} ms"
    print(f"per-batch epoch ({bank.num_steps} steps): {fmt(t_batch)}")
    print(f"fused-scan epoch:                 {fmt(t_scan)}")
    print(f"steps/s per-batch: {bank.num_steps/min(t_batch):.0f}   "
          f"steps/s scan: {bank.num_steps/min(t_scan):.0f}")


if __name__ == "__main__":
    main()
