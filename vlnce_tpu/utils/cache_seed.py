"""Committed XLA compile-cache seeding.

A fresh clone pays full cold XLA:CPU compiles in the multi-chip dryrun and
the 2-process slow tests — ~40% of their wall time on a 1-core host
(measured: ``__graft_entry__.dryrun_multichip`` 521 s cold vs 318 s warm).
The repo therefore ships the persistent-cache entries for exactly those
programs in ``tests/.jax_cache_seed`` (regenerate with
``scripts/build_cache_seed.py``), and this module restores them into the
live cache directory at startup.

Safety: XLA:CPU AOT artifacts encode the compile host's ISA features, and
loading them on a host missing one of those features can SIGILL
(``cpu_aot_loader.cc`` warns exactly this). Entries are therefore restored
only when

  (a) the jax/jaxlib versions match the ones recorded at seed time
      (different versions cannot hit the same cache keys anyway), and
  (b) the seed host's /proc/cpuinfo feature flags are a subset of this
      host's (the compiled code then uses no instruction this CPU lacks).

When either guard fails the caller simply runs with a cold cache — slower,
never wrong. Restoring is hardlink-or-copy per entry and never overwrites
existing entries, so a stale seed degrades to exactly the uncached behavior.
"""

from __future__ import annotations

import json
import os
import shutil

FINGERPRINT_FILE = "FINGERPRINT.json"


def default_seed_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tests",
        ".jax_cache_seed",
    )


def _cpu_flags():
    """The host CPU's feature-flag set from /proc/cpuinfo, or None when
    unavailable (non-Linux): callers then skip seeding, the safe default."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return set(line.split(":", 1)[1].split())
    except OSError:
        return None
    return None


def _versions() -> dict:
    import jax
    import jaxlib

    return {"jax": jax.__version__, "jaxlib": jaxlib.__version__}


def record_fingerprint(seed_dir: str) -> dict:
    """Write the seed-time host fingerprint next to the cache entries."""
    flags = _cpu_flags()
    fp = _versions() | {"cpu_flags": sorted(flags) if flags else None}
    os.makedirs(seed_dir, exist_ok=True)
    with open(os.path.join(seed_dir, FINGERPRINT_FILE), "w") as f:
        json.dump(fp, f, indent=1)
    return fp


def seed_compatible(seed_dir: str) -> bool:
    """True when this host can safely execute the seed's AOT artifacts."""
    path = os.path.join(seed_dir, FINGERPRINT_FILE)
    try:
        with open(path) as f:
            fp = json.load(f)
    except (OSError, ValueError):
        return False
    if fp.get("cpu_flags") is None:
        return False
    if _versions() != {k: fp.get(k) for k in ("jax", "jaxlib")}:
        return False
    host = _cpu_flags()
    return host is not None and set(fp["cpu_flags"]).issubset(host)


def seed_cache(cache_dir: str, seed_dir: str | None = None) -> int:
    """Restore committed cache entries into ``cache_dir``; returns the number
    of entries linked/copied (0 when the guard fails or nothing to do)."""
    seed_dir = seed_dir or default_seed_dir()
    if not os.path.isdir(seed_dir) or not seed_compatible(seed_dir):
        return 0
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return 0  # read-only checkout: run uncached
    n = 0
    for name in os.listdir(seed_dir):
        if name == FINGERPRINT_FILE:
            continue
        src = os.path.join(seed_dir, name)
        dst = os.path.join(cache_dir, name)
        if not os.path.isfile(src) or os.path.exists(dst):
            continue
        try:
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)
            n += 1
        except OSError:
            continue
    return n
