"""(Re)generate the committed XLA compile-cache seed (tests/.jax_cache_seed).

Runs the full multi-chip dryrun with the persistent compilation cache pointed
directly at the seed directory, then records the host fingerprint that gates
restores (vlnce_tpu/utils/cache_seed.py). Because dryrun_multichip re-execs
its stages with a PINNED environment, the cache keys produced here are the
same ones a driver run produces regardless of how the driver initialized JAX
— that is the property that makes shipping the seed worthwhile at all.

Run after any change to the dryrun's compiled programs (policy shapes,
mp_smoke workloads, jax upgrade):

    python scripts/build_cache_seed.py [--devices 8]

then commit the refreshed tests/.jax_cache_seed contents.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument(
        "--fresh", action="store_true",
        help="delete existing seed entries first (default: refresh in place)",
    )
    args = ap.parse_args()

    from vlnce_tpu.utils.cache_seed import default_seed_dir, record_fingerprint

    seed_dir = default_seed_dir()
    if args.fresh and os.path.isdir(seed_dir):
        shutil.rmtree(seed_dir)
    os.makedirs(seed_dir, exist_ok=True)
    os.environ["JAX_COMPILATION_CACHE_DIR"] = seed_dir

    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(args.devices)
    fp = record_fingerprint(seed_dir)
    entries = [n for n in os.listdir(seed_dir) if not n.endswith(".json")]
    size_mb = sum(
        os.path.getsize(os.path.join(seed_dir, n)) for n in entries
    ) / 1e6
    print(
        f"seed built: {len(entries)} entries, {size_mb:.1f} MB, "
        f"jax {fp['jax']} / jaxlib {fp['jaxlib']}"
    )


if __name__ == "__main__":
    main()
