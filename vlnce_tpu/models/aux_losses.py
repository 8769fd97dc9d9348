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


class AuxLosses:
    """API-compatible shim of the reference singleton for user code written
    against the reference interface (activate/deactivate/register_loss/
    reduce). Only usable OUTSIDE jit; framework nets use returned aux dicts
    instead."""

    _losses: Dict[str, Tuple[jnp.ndarray, float]] = {}
    _is_active: bool = False

    @classmethod
    def activate(cls) -> None:
        cls._is_active = True

    @classmethod
    def deactivate(cls) -> None:
        cls._is_active = False

    @classmethod
    def is_active(cls) -> bool:
        return cls._is_active

    @classmethod
    def clear(cls) -> None:
        cls._losses = {}

    @classmethod
    def register_loss(cls, name: str, loss, alpha: float = 1.0) -> None:
        cls._losses[name] = (loss, alpha)

    @classmethod
    def get_loss(cls, name: str):
        return cls._losses[name][0]

    @classmethod
    def reduce(cls, mask) -> jnp.ndarray:
        return reduce_aux_losses(cls._losses, mask)


def reduce_aux_losses(aux: Dict[str, Tuple[jnp.ndarray, float]], mask: jnp.ndarray) -> jnp.ndarray:
    """aux maps name -> (per_sample_loss [B'], alpha). Returns the sum of
    masked means, mirroring _AuxLosses.reduce (reference aux_losses.py:24-32).
    mask: [B'] with 1 for valid samples."""
    total = jnp.zeros((), jnp.float32)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    for _, (loss, alpha) in aux.items():
        total = total + alpha * jnp.sum(loss.reshape(-1) * mask) / denom
    return total
