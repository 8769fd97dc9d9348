"""Checkpoint save/load.

Format: one msgpack file (flax.serialization) holding numpy pytrees plus the
config dumped as YAML — the config-in-checkpoint behavior the reference
relies on for eval/inference (EVAL.USE_CKPT_CONFIG, reference
base_il_trainer.py:117-132,235-237,439-445). Keys:

    {"state_dict": params, "optim_state": ..., "extra_state": {...},
     "config_yaml": str}

Torch ``.pth`` checkpoints from the reference are loaded transparently and
converted (vlnce_tpu/models/convert.py).

TPU-native write path:

- the device snapshot is ONE batched `jax.device_get` of the whole
  (params, optim_state) tree — per-leaf `np.asarray` pays a full relay
  round trip per leaf on a remote-attached chip (PERFORMANCE.md rules);
- files are written to a temp name and atomically renamed, so the
  eval-many mtime poller (`poll_checkpoint_folder`) and requeued jobs can
  never observe a torn checkpoint;
- with `async_write=True` (TPU.ASYNC_CHECKPOINT) serialization + file IO
  run in a background thread while training continues — only the device
  snapshot is synchronous. One write in flight at a time; errors surface
  on the next save or at `wait_for_pending()`, which trainers call when
  their train loop ends (and an atexit hook covers aborts).
"""

from __future__ import annotations

import atexit
import os
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from vlnce_tpu.config.node import Config


def _host_snapshot(tree):
    """One batched device->host transfer of a whole pytree. Device leaves
    come back as fresh host arrays; numpy leaves (already host) are COPIED —
    device_get returns them as-is, and an aliased snapshot handed to the
    async writer would race live training state."""
    got = jax.device_get(tree)
    return jax.tree_util.tree_map(
        lambda a, b: np.array(b) if b is a else np.asarray(b), tree, got
    )


def _write_atomic(path: str, payload: Dict[str, Any]) -> None:
    blob = serialization.msgpack_serialize(payload)
    # unique temp name: concurrent writers of the same path (e.g. several
    # pod ranks sharing CHECKPOINT_FOLDER) must not race on one temp file —
    # with a fixed name, one rank's os.replace would rename the other's
    # in-progress temp away and its own replace would then FileNotFoundError
    tmp = f"{path}.tmp.{os.getpid()}-{threading.get_ident()}"
    with open(tmp, "wb") as f:
        f.write(blob)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic: pollers never see a torn file


class _AsyncWriter:
    """At most one checkpoint write in flight; exceptions are re-raised on
    the next submit/wait so a failing disk cannot silently drop epochs."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._exc: Optional[BaseException] = None

    def _run(self, path: str, payload: Dict[str, Any]) -> None:
        try:
            _write_atomic(path, payload)
        except BaseException as e:  # surfaced on the next submit/wait
            self._exc = e

    def submit(self, path: str, payload: Dict[str, Any]) -> None:
        self.wait()
        self._thread = threading.Thread(
            target=self._run, args=(path, payload),
            name="ckpt-writer", daemon=False,
        )
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise RuntimeError("async checkpoint write failed") from exc


_WRITER = _AsyncWriter()
atexit.register(_WRITER.wait)


def wait_for_pending() -> None:
    """Block until any in-flight async checkpoint write completes (raises if
    it failed). Trainers call this when their train loop ends, so a caller
    that loads the last checkpoint right after train() can never race the
    writer."""
    _WRITER.wait()


def save_checkpoint(
    path: str,
    params,
    config=None,
    optim_state=None,
    extra_state: Optional[Dict[str, Any]] = None,
    async_write: bool = False,
    all_ranks: bool = False,
) -> None:
    # one writer per pod by default: params are replicated, so non-zero
    # ranks writing the same shared path would only duplicate IO. all_ranks
    # opts out for NODE-LOCAL paths every rank must be able to read back —
    # the requeue interrupted state on pods without a shared filesystem
    # (unique temp names keep concurrent same-path writes benign).
    if not all_ranks and jax.process_count() > 1 and jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # ONE batched device->host transfer for the whole checkpoint tree
    params_sd = serialization.to_state_dict(params)
    optim_sd = (
        # to_state_dict converts optax NamedTuple states into plain dicts
        serialization.to_state_dict(optim_state)
        if optim_state is not None else None
    )
    params_sd, optim_sd = _host_snapshot((params_sd, optim_sd))
    payload = {"state_dict": params_sd}
    if optim_sd is not None:
        payload["optim_state"] = optim_sd
    if extra_state is not None:
        payload["extra_state"] = extra_state
    if config is not None:
        payload["config_yaml"] = config.dump()
    if async_write:
        # the device snapshot above is already host numpy — serialization
        # and file IO overlap the next training steps
        _WRITER.submit(path, payload)
    else:
        _WRITER.wait()  # keep ordering if a prior async write is in flight
        _write_atomic(path, payload)


def load_checkpoint(path: str) -> Dict[str, Any]:
    if path.endswith(".pth"):
        import torch

        ckpt = torch.load(path, map_location="cpu")
        ckpt["__torch__"] = True
        return ckpt
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return payload


def config_from_checkpoint(ckpt: Dict[str, Any]) -> Optional[Config]:
    import yaml

    if "config_yaml" in ckpt:
        return Config(yaml.safe_load(ckpt["config_yaml"]))
    if ckpt.get("__torch__") and "config" in ckpt:
        return None  # yacs config object from torch ckpt; caller handles
    return None


def poll_checkpoint_folder(checkpoint_dir: str, previous_index: int) -> Optional[str]:
    """Next unevaluated checkpoint in a directory, ordered by mtime
    (habitat poll_checkpoint_folder equivalent; reference README.md:251
    eval-many behavior)."""
    if not os.path.isdir(checkpoint_dir):
        return checkpoint_dir if previous_index < 0 else None
    models = [
        os.path.join(checkpoint_dir, f)
        for f in os.listdir(checkpoint_dir)
        if f.endswith((".ckpt", ".pth", ".msgpack"))
    ]
    models.sort(key=os.path.getmtime)
    ind = previous_index + 1
    if ind < len(models):
        return models[ind]
    return None
