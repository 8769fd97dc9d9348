#!/usr/bin/env python3
"""Op-level profile of the production IL train step (bench shapes).

Captures a jax.profiler trace of several train-step invocations and prints
the top ops by self time from the trace's op-stats, to locate where the
device time of the full-pixel CMA update goes (mfu_train in bench.py).
Diagnostic only.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compilation_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RGB_HW, DEPTH_HW, INSTR_LEN = 224, 256, 200
T, N = 16, 4


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax
    from gymnasium import spaces

    from vlnce_tpu.config import get_config
    from vlnce_tpu.models.cma_policy import CMAPolicy
    from vlnce_tpu.parallel.il_step import build_il_train_step

    cfg = get_config(
        opts=[
            "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False,
            "MODEL.INSTRUCTION_ENCODER.bidirectional", True,
            "MODEL.PROGRESS_MONITOR.use", True,
            "MODEL.RGB_ENCODER.trainable", True,
            "MODEL.DEPTH_ENCODER.trainable", True,
        ]
    )
    space = spaces.Dict(
        {
            "rgb": spaces.Box(0, 255, (RGB_HW, RGB_HW, 3), np.uint8),
            "depth": spaces.Box(0, 1, (DEPTH_HW, DEPTH_HW, 1), np.float32),
            "instruction": spaces.Box(0, 10000, (INSTR_LEN,), np.int32),
            "progress": spaces.Box(0, 1, (1,), np.float32),
        }
    )
    policy = CMAPolicy.from_config(cfg, space, spaces.Discrete(4))
    policy.init_params(jax.random.PRNGKey(0), batch_size=2)
    optimizer = optax.adam(2.5e-4)
    opt = optimizer.init(policy.params)
    train_step = build_il_train_step(
        policy.module, optimizer, policy.num_recurrent_layers, policy.hidden_size
    )

    rng = np.random.RandomState(0)
    obs = {
        "rgb": jnp.asarray(rng.randint(0, 255, (T, N, RGB_HW, RGB_HW, 3), dtype=np.uint8)),
        "depth": jnp.asarray(rng.rand(T, N, DEPTH_HW, DEPTH_HW, 1).astype(np.float32)),
        "instruction": jnp.asarray(
            np.pad(rng.randint(1, 2000, (T, N, 40)), ((0, 0), (0, 0), (0, INSTR_LEN - 40))).astype(np.int32)
        ),
        "progress": jnp.zeros((T, N, 1), jnp.float32),
    }
    prev = jnp.zeros((T, N), jnp.int32)
    masks = jnp.ones((T, N), jnp.float32).at[0].set(0.0)
    corrected = jnp.ones((T, N), jnp.int32)
    weights = jnp.ones((T, N), jnp.float32)

    params, o = policy.params, opt
    params, o, loss, _, _ = train_step(params, o, obs, prev, masks, corrected, weights)
    float(loss)  # compile + warm

    trace_dir = "/tmp/il_step_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            params, o, loss, _, _ = train_step(params, o, obs, prev, masks, corrected, weights)
        float(loss)
    print("trace captured to", trace_dir)

    # summarize: find the .trace.json.gz and aggregate device-op durations
    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no trace json found; inspect with tensorboard instead")
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid names containing TPU/device; aggregate complete events
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
    }
    device_pids = {
        p for p, n in pid_names.items()
        if any(s in n.lower() for s in ("tpu", "device", "xla", "axon"))
        and "host" not in n.lower()
    }
    totals = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        totals[name] = totals.get(name, 0.0) + float(e.get("dur", 0.0))
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:40]
    total = sum(totals.values())
    print(f"device total (3 steps): {total/1e3:.2f} ms")
    for name, dur in top:
        print(f"  {dur/1e3:9.2f} ms  {100*dur/max(total,1e-9):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
