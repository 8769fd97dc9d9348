"""On-disk trajectory store (LMDB replacement).

The reference stores msgpack'd (obs-dict, prev_actions, oracle_actions)
episodes in LMDB under integer keys (reference dagger_trainer.py:145-151,
323-372). This is a from-scratch append-only segment store with the same
contract: integer keys 0..N-1, single writer, many concurrent mmap readers,
periodic commit. Layout:

    <dir>/data.bin    -- concatenated msgpack blobs
    <dir>/index.bin   -- int64 pairs (offset, length) per key

A C++ fast path (vlnce_tpu/native) can mmap the same files; the format is
deliberately trivial.
"""

from __future__ import annotations

import mmap
import os
import struct
import threading
from typing import Any, List, Optional

import msgpack
import numpy as np

_IDX_FMT = "<qq"  # offset, length
_IDX_SIZE = struct.calcsize(_IDX_FMT)


def _pack_default(obj):
    if isinstance(obj, np.ndarray):
        return {
            b"__nd__": True,
            b"dtype": obj.dtype.str,
            b"shape": list(obj.shape),
            b"data": obj.tobytes(),
        }
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    raise TypeError(f"cannot serialize {type(obj)}")


def _unpack_hook(obj):
    if b"__nd__" in obj:
        return np.frombuffer(obj[b"data"], dtype=np.dtype(obj[b"dtype"])).reshape(obj[b"shape"]).copy()
    if "__nd__" in obj:
        return np.frombuffer(obj["data"], dtype=np.dtype(obj["dtype"])).reshape(obj["shape"]).copy()
    return obj


def pack_episode(obj: Any) -> bytes:
    return msgpack.packb(obj, default=_pack_default, use_bin_type=True)


def unpack_episode(buf: bytes) -> Any:
    return msgpack.unpackb(buf, object_hook=_unpack_hook, raw=False, strict_map_key=False)


class TrajectoryStoreWriter:
    """Single-writer appender with explicit commit (fsync) points."""

    def __init__(self, directory: str, drop_existing: bool = False):
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        self._data_path = os.path.join(directory, "data.bin")
        self._index_path = os.path.join(directory, "index.bin")
        mode = "wb" if drop_existing or not os.path.exists(self._data_path) else "r+b"
        self._data_f = open(self._data_path, mode)
        self._index_f = open(self._index_path, mode if mode == "wb" else "r+b")
        self._data_f.seek(0, os.SEEK_END)
        self._index_f.seek(0, os.SEEK_END)
        self._offset = self._data_f.tell()
        self._count = self._index_f.tell() // _IDX_SIZE

    def __len__(self) -> int:
        return self._count

    def put(self, obj: Any) -> int:
        """Append one episode; returns its integer key."""
        blob = pack_episode(obj)
        self._data_f.write(blob)
        self._index_f.write(struct.pack(_IDX_FMT, self._offset, len(blob)))
        self._offset += len(blob)
        key = self._count
        self._count += 1
        return key

    def commit(self) -> None:
        self._data_f.flush()
        self._index_f.flush()
        os.fsync(self._data_f.fileno())
        os.fsync(self._index_f.fileno())

    def close(self) -> None:
        self.commit()
        self._data_f.close()
        self._index_f.close()


class TrajectoryStoreReader:
    """mmap reader; safe to open in many processes/threads."""

    def __init__(self, directory: str):
        self.directory = directory
        self._data_path = os.path.join(directory, "data.bin")
        self._index_path = os.path.join(directory, "index.bin")
        with open(self._index_path, "rb") as f:
            raw = f.read()
        self._index = np.frombuffer(raw, dtype=np.int64).reshape(-1, 2)
        self._data_f = open(self._data_path, "rb")
        self._mm = mmap.mmap(self._data_f.fileno(), 0, access=mmap.ACCESS_READ) if self._index.size else None

    def __len__(self) -> int:
        return len(self._index)

    def get(self, key: int) -> Any:
        offset, length = self._index[key]
        return unpack_episode(self._mm[offset : offset + length])

    def get_raw(self, key: int) -> bytes:
        offset, length = self._index[key]
        return self._mm[offset : offset + length]

    def close(self) -> None:
        if self._mm is not None:
            self._mm.close()
        self._data_f.close()


def store_exists(directory: str) -> bool:
    return os.path.exists(os.path.join(directory, "index.bin"))


def store_length(directory: str) -> int:
    path = os.path.join(directory, "index.bin")
    if not os.path.exists(path):
        return 0
    return os.path.getsize(path) // _IDX_SIZE
