"""Fingerprint-guarded XLA cache seeding (vlnce_tpu/utils/cache_seed.py).

The committed seed (tests/.jax_cache_seed) must only ever restore onto a
host whose CPU can execute the seed-time AOT code: a wrong restore can
SIGILL, a skipped restore merely recompiles."""

import json
import os

from vlnce_tpu.utils import cache_seed


def _write_fp(seed_dir, **overrides):
    fp = cache_seed._versions() | {
        "cpu_flags": sorted(cache_seed._cpu_flags() or {"sse2"})
    }
    fp.update(overrides)
    os.makedirs(seed_dir, exist_ok=True)
    with open(os.path.join(seed_dir, cache_seed.FINGERPRINT_FILE), "w") as f:
        json.dump(fp, f)
    return fp


def test_restores_on_matching_host(tmp_path):
    seed = tmp_path / "seed"
    cache = tmp_path / "cache"
    _write_fp(str(seed))
    (seed / "jit_foo-abc-cache").write_bytes(b"\x01\x02")
    (seed / "jit_bar-def-cache").write_bytes(b"\x03")
    assert cache_seed.seed_cache(str(cache), str(seed)) == 2
    assert (cache / "jit_foo-abc-cache").read_bytes() == b"\x01\x02"
    # idempotent: existing entries are never overwritten or re-counted
    assert cache_seed.seed_cache(str(cache), str(seed)) == 0


def test_skips_on_version_mismatch(tmp_path):
    seed = tmp_path / "seed"
    _write_fp(str(seed), jax="0.0.1-other")
    (seed / "jit_foo-cache").write_bytes(b"x")
    assert cache_seed.seed_cache(str(tmp_path / "cache"), str(seed)) == 0


def test_skips_when_host_lacks_seed_cpu_features(tmp_path):
    seed = tmp_path / "seed"
    flags = sorted((cache_seed._cpu_flags() or set()) | {"not_a_real_isa_flag"})
    _write_fp(str(seed), cpu_flags=flags)
    (seed / "jit_foo-cache").write_bytes(b"x")
    assert cache_seed.seed_cache(str(tmp_path / "cache"), str(seed)) == 0


def test_skips_without_fingerprint_or_seed_dir(tmp_path):
    seed = tmp_path / "seed"
    os.makedirs(seed)
    (seed / "jit_foo-cache").write_bytes(b"x")
    assert cache_seed.seed_cache(str(tmp_path / "cache"), str(seed)) == 0
    assert cache_seed.seed_cache(str(tmp_path / "c2"), str(tmp_path / "missing")) == 0


def test_committed_seed_is_restorable_here():
    """The shipped seed must carry a fingerprint and (on the build hosts,
    which share this image) pass the compatibility guard."""
    seed_dir = cache_seed.default_seed_dir()
    assert os.path.isdir(seed_dir), "tests/.jax_cache_seed missing from checkout"
    assert os.path.isfile(os.path.join(seed_dir, cache_seed.FINGERPRINT_FILE))
    entries = [n for n in os.listdir(seed_dir) if n != cache_seed.FINGERPRINT_FILE]
    assert entries, "seed directory has no cache entries"
    assert cache_seed.seed_compatible(seed_dir), (
        "committed seed incompatible with this host: regenerate with "
        "scripts/build_cache_seed.py"
    )
