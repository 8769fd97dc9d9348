#!/usr/bin/env python3
"""Phase-level timing probe for the fused resident DAgger collect->train path.

Separates: collection scan, bank assembly, per-batch gather dispatch, and the
feature-level IL train step — each with a value-readback barrier — to find
which phase bounds `bench.py --dagger-collect`'s fused metric on the attached
chip. Diagnostic only; not part of the driver bench.
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


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax
    from gymnasium import spaces as gspaces

    from vlnce_tpu.config import get_config
    from vlnce_tpu.models.cma_policy import CMAPolicy
    from vlnce_tpu.ops.obs_transforms import get_active_obs_transforms
    from vlnce_tpu.tasks.datasets import make_dataset
    from vlnce_tpu.trainers.device_dagger import collect_episodes_resident
    from vlnce_tpu.data.device_bank import ResidentBatchIterator
    from vlnce_tpu.parallel.il_step import build_il_train_step

    cfg = get_config(
        opts=[
            "BASE_TASK_CONFIG_PATH", "vlnce_tpu/tasks/config/vlnce_task.yaml",
            "TASK_CONFIG.DATASET.TYPE", "Synthetic-VLN-v0",
            "TASK_CONFIG.DATASET.NUM_EPISODES", 2 * B,
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

    def stamp(label, t0):
        t = time.perf_counter() - t0
        print(f"{label:42s} {t*1e3:9.1f} ms")
        return time.perf_counter()

    # warm everything once
    bank = collect_episodes_resident(
        policy, transforms, cfg, episodes[:B], 1.0, jax.random.PRNGKey(3)
    )
    optimizer = optax.adam(2.5e-4)
    train_step = build_il_train_step(
        policy.module, optimizer, policy.num_recurrent_layers, policy.hidden_size
    )
    params = jax.tree_util.tree_map(lambda x: x + 0, policy.params)
    opt = optimizer.init(params)
    for batch in ResidentBatchIterator(bank, batch_size=8, seed=1):
        obs, prev, masks, corrected, weights = batch
        T, N = corrected.shape
        obs_tn = {k: v.reshape((T, N) + v.shape[1:]) for k, v in obs.items()}
        params, opt, loss, _, _ = train_step(
            params, opt, obs_tn, prev.reshape(T, N), masks.reshape(T, N),
            corrected, weights,
        )
    float(loss)
    print("== warmed ==")

    # phase 1: collection scan only (bank.prev readback barrier)
    t0 = time.perf_counter()
    bank = collect_episodes_resident(
        policy, transforms, cfg, episodes[:B], 1.0, jax.random.PRNGKey(3)
    )
    jax.block_until_ready(bank.prev)
    float(np.asarray(bank.lengths).sum())
    t0 = stamp(f"collect+assemble ({bank.num_steps} steps)", t0)

    # phase 2: param clone + opt init
    params = jax.tree_util.tree_map(lambda x: x + 0, policy.params)
    opt = optimizer.init(params)
    jax.block_until_ready(params)
    t0 = stamp("param clone + optimizer.init", t0)

    # phase 3: batches — time gather and train dispatch separately
    n_batches = 0
    t_gather = t_reshape = t_train = 0.0
    it = ResidentBatchIterator(bank, batch_size=8, seed=1)
    for ids in _batches(it):
        ta = time.perf_counter()
        batch = bank.gather_batch(ids, it.coef, it.length_quantum)
        jax.block_until_ready(batch[0])
        tb = time.perf_counter()
        obs, prev, masks, corrected, weights = batch
        T, N = corrected.shape
        obs_tn = {k: v.reshape((T, N) + v.shape[1:]) for k, v in obs.items()}
        prev_tn, masks_tn = prev.reshape(T, N), masks.reshape(T, N)
        jax.block_until_ready(obs_tn)
        tc = time.perf_counter()
        params, opt, loss, _, _ = train_step(
            params, opt, obs_tn, prev_tn, masks_tn, corrected, weights
        )
        float(loss)
        td = time.perf_counter()
        t_gather += tb - ta
        t_reshape += tc - tb
        t_train += td - tc
        n_batches += 1
        print(f"  batch T={T} N={N}: gather {1e3*(tb-ta):7.1f} ms  "
              f"reshape {1e3*(tc-tb):7.1f} ms  train {1e3*(td-tc):7.1f} ms")
    print(f"{n_batches} batches: gather {t_gather*1e3:.1f} ms  "
          f"reshape {t_reshape*1e3:.1f} ms  train {t_train*1e3:.1f} ms")
    print(f"bank steps={bank.num_steps}; fused steps/s (post-warm) = "
          f"{bank.num_steps / (t_gather + t_reshape + t_train):.1f} (train only)")


def _batches(it):
    """Episode-id batches in the iterator's order (mirrors __iter__)."""
    from vlnce_tpu.data.collate import iterate_episode_keys

    batch = []
    for k in iterate_episode_keys(
        len(it.bank), lambda i: int(it.bank.lengths[i]),
        it.batch_size, it._rng, it.preload_size,
    ):
        batch.append(k)
        if len(batch) == it.batch_size:
            yield batch
            batch = []


if __name__ == "__main__":
    main()
