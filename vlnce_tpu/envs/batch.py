"""Host -> device observation batching.

batch_obs equivalent (reference habitat batch_obs used at
base_il_trainer.py:25,284), designed for TPU: all per-env numpy obs are
stacked host-side into one contiguous array per sensor and moved with a
single device transfer per step. Batch sizes stay FIXED across an eval/rollout
(paused envs keep their slot, handled by an `active` mask) so jit never
recompiles when envs finish (SURVEY.md §7 hard part 3 — the reference
shrinks tensors in _pause_envs, which is recompile-poison under jit).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def stack_obs(observations: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """List of per-env obs dicts -> dict of [N, ...] numpy arrays."""
    keys = observations[0].keys()
    return {k: np.stack([np.asarray(o[k]) for o in observations], axis=0) for k in keys}


def batch_obs(
    observations: List[Dict[str, np.ndarray]],
    pad_to: Optional[int] = None,
    device=None,
) -> Dict[str, jnp.ndarray]:
    """Stack and transfer obs; optionally zero-pad the env axis to a fixed
    size so device programs see a static batch."""
    stacked = stack_obs(observations)
    n = len(observations)
    if pad_to is not None and pad_to > n:
        for k, v in stacked.items():
            pad = np.zeros((pad_to - n,) + v.shape[1:], v.dtype)
            stacked[k] = np.concatenate([v, pad], axis=0)
    return {k: jax.device_put(v, device) for k, v in stacked.items()}


def update_batch_slots(
    batch: Dict[str, np.ndarray], observations: List[Dict[str, np.ndarray]], slots: List[int]
) -> None:
    """In-place update of host-side stacked obs at given env slots."""
    for i, obs in zip(slots, observations):
        for k, v in obs.items():
            batch[k][i] = np.asarray(v)
