"""Checkpoint save/load.

Format: one msgpack file (flax.serialization) holding numpy pytrees plus the
config dumped as YAML — the config-in-checkpoint behavior the reference
relies on for eval/inference (EVAL.USE_CKPT_CONFIG, reference
base_il_trainer.py:117-132,235-237,439-445). Keys:

    {"state_dict": params, "optim_state": ..., "extra_state": {...},
     "config_yaml": str}

Torch ``.pth`` checkpoints from the reference are loaded transparently and
converted (vlnce_tpu/models/convert.py).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from vlnce_tpu.config.node import Config


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    params,
    config=None,
    optim_state=None,
    extra_state: Optional[Dict[str, Any]] = None,
) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"state_dict": _to_numpy_tree(serialization.to_state_dict(params))}
    if optim_state is not None:
        # to_state_dict converts optax NamedTuple states into plain dicts
        payload["optim_state"] = _to_numpy_tree(serialization.to_state_dict(optim_state))
    if extra_state is not None:
        payload["extra_state"] = extra_state
    if config is not None:
        payload["config_yaml"] = config.dump()
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


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
