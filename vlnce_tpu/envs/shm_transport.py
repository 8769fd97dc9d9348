"""Shared-memory observation transport (ctypes over the native ring).

Moves bulk sensor data from env worker processes to the driver through the
C++ shm ring (vlnce_tpu/native/obs_ring.cpp) instead of pickled pipes. The
pipe still carries control traffic and small scalars; image sensors above a
size threshold ride the ring. Schema (sensor -> shape/dtype/offset) is fixed
after the first reset, which also makes every downstream batch fixed-shape.

Enabled in VectorEnv with use_shm=True (auto-fallback to pickle when the
native library isn't built).
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "native", "libobsring.so")
_lib = None


def native_available() -> bool:
    return _load() is not None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.obs_ring_open.restype = ctypes.c_void_p
    lib.obs_ring_open.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
    lib.obs_ring_close.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    lib.obs_ring_write_nopub.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
    lib.obs_ring_publish.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint64]
    lib.obs_ring_seq.restype = ctypes.c_uint64
    lib.obs_ring_seq.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.obs_ring_gather.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
    ]
    lib.obs_ring_wait.restype = ctypes.c_int
    lib.obs_ring_wait.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_uint64, ctypes.c_int64,
    ]
    _lib = lib
    return lib


class ObsSchema:
    """Fixed layout of one slot: sensor -> (offset, nbytes, shape, dtype)."""

    def __init__(self, template: Dict[str, np.ndarray], min_bytes: int = 4096):
        self.fields: Dict[str, Tuple[int, int, tuple, np.dtype]] = {}
        offset = 0
        for k in sorted(template):
            v = np.asarray(template[k])
            if v.nbytes < min_bytes:
                continue  # small sensors stay on the pipe
            self.fields[k] = (offset, v.nbytes, v.shape, v.dtype)
            offset += (v.nbytes + 63) // 64 * 64  # 64B-align fields
        self.slot_bytes = max(offset, 64)

    def shm_keys(self):
        return self.fields.keys()


class ObsRing:
    def __init__(self, name: str, n_slots: int, schema: ObsSchema, create: bool):
        self.lib = _load()
        assert self.lib is not None, "native obs ring not built (make -C vlnce_tpu/native)"
        self.name = name.encode()
        self.schema = schema
        self.n_slots = n_slots
        self.handle = self.lib.obs_ring_open(self.name, n_slots, schema.slot_bytes, 1 if create else 0)
        assert self.handle, f"failed to open shm ring {name}"
        self._owner = create

    # -- worker side ---------------------------------------------------------
    def write_obs(self, slot: int, obs: Dict[str, np.ndarray], sequence: int) -> Dict[str, np.ndarray]:
        """Write shm-eligible sensors; returns the remainder to pipe."""
        rest = {}
        for k, v in obs.items():
            if k in self.schema.fields:
                offset, nbytes, shape, dtype = self.schema.fields[k]
                arr = np.ascontiguousarray(np.asarray(v, dtype=dtype))
                assert arr.nbytes == nbytes, f"{k}: {arr.nbytes} != {nbytes}"
                self.lib.obs_ring_write_nopub(
                    self.handle, slot, offset, arr.ctypes.data_as(ctypes.c_void_p), nbytes
                )
            else:
                rest[k] = v
        self.lib.obs_ring_publish(self.handle, slot, sequence)
        return rest

    # -- driver side ---------------------------------------------------------
    def wait(self, slots: List[int], sequence: int, max_spins: int = 2_000_000_000) -> None:
        arr = (ctypes.c_int64 * len(slots))(*slots)
        rc = self.lib.obs_ring_wait(self.handle, arr, len(slots), sequence, max_spins)
        if rc != 0:
            raise TimeoutError(f"obs ring wait timed out (seq {sequence})")

    def gather(self, slots: List[int], out: Optional[Dict[str, np.ndarray]] = None) -> Dict[str, np.ndarray]:
        """Assemble batched [len(slots), ...] arrays for every shm sensor."""
        n = len(slots)
        slot_arr = (ctypes.c_int64 * n)(*slots)
        result = out if out is not None else {}
        for k, (offset, nbytes, shape, dtype) in self.schema.fields.items():
            if k not in result:
                result[k] = np.empty((n,) + shape, dtype)
            dst = result[k]
            assert dst.flags["C_CONTIGUOUS"] and dst.nbytes == n * nbytes
            self.lib.obs_ring_gather(
                self.handle, slot_arr, n, offset, nbytes, dst.ctypes.data_as(ctypes.c_void_p)
            )
        return result

    def close(self) -> None:
        if self.handle:
            self.lib.obs_ring_close(self.handle, self.name, 1 if self._owner else 0)
            self.handle = None
