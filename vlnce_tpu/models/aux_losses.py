"""Auxiliary-loss plumbing.

The reference uses a mutable global singleton that modules push losses into
during forward (reference vlnce_baselines/common/aux_losses.py:1-44). That
pattern is incompatible with pure functions under jit, so nets here *return*
an aux dict of per-sample loss terms alongside their outputs; this module
provides the same masked reduction the trainer applied.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def reduce_aux_losses(aux: Dict[str, Tuple[jnp.ndarray, float]], mask: jnp.ndarray) -> jnp.ndarray:
    """aux maps name -> (per_sample_loss [B'], alpha). Returns the sum of
    masked means, mirroring _AuxLosses.reduce (reference aux_losses.py:24-32).
    mask: [B'] with 1 for valid samples."""
    total = jnp.zeros((), jnp.float32)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    for _, (loss, alpha) in aux.items():
        total = total + alpha * jnp.sum(loss.reshape(-1) * mask) / denom
    return total
