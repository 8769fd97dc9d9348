#!/usr/bin/env python3
"""On-chip A/B of the recurrent-scan unroll factor (_SCAN_UNROLL).

The GRU/LSTM scans' per-iteration matmuls are MXU-tiny, so iteration cost is
dominated by loop latency; unrolling packs more steps per loop iteration.
This probe measures the production act step (in-jit T-step scan) and the
frozen-encoder IL train step at unroll 1/4/8 on the attached chip and prints
one JSON line per setting — the measurement PERFORMANCE.md's "scan unroll"
section records (VERDICT r3 weak #5).

Usage: python scripts/probe_scan_unroll.py [--unrolls 1 4 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compilation_cache")


def measure(unroll: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    # patch BOTH bindings before building modules: rnn_state_encoder owns the
    # constant; instruction_encoder imported it by value
    from vlnce_tpu.models import rnn_state_encoder
    from vlnce_tpu.models.encoders import instruction_encoder

    rnn_state_encoder._SCAN_UNROLL = unroll
    instruction_encoder._SCAN_UNROLL = unroll

    import bench

    t0 = time.perf_counter()
    act = bench.bench_tpu()
    act_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    train = bench.bench_il_train_step()["frozen"]
    train_compile_s = time.perf_counter() - t0
    return {
        "unroll": unroll,
        "act_device_ms": round(act["act_device_s"] * 1e3, 3),
        "act_sps": round(bench.B / act["act_device_s"], 1),
        "train_device_ms": round(train["device_s"] * 1e3, 3),
        "train_fwd_ms": round(train["fwd_ms"], 3),
        "act_wall_s_incl_compile": round(act_compile_s, 1),
        "train_wall_s_incl_compile": round(train_compile_s, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--unrolls", type=int, nargs="*", default=[1, 4, 8])
    args = ap.parse_args()
    for u in args.unrolls:
        print(json.dumps(measure(u)), flush=True)


if __name__ == "__main__":
    main()
