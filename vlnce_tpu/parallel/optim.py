"""Optimizer construction shared by the IL and RL trainers.

Frozen-parameter masking: the reference hands ALL policy parameters to torch
Adam (reference base_il_trainer.py:69-70), but torch skips parameters whose
.grad is None — i.e. the frozen ResNets (resnet_encoders.py:45-46,141-143)
and the frozen instruction-embedding table never get optimizer state or
update traffic. The naive optax translation (adam over the full pytree)
silently pays for them: zero gradients still stream m/v moments for ~90% of
parameter BYTES (two frozen ResNet50s dominate the CMA tree) through HBM
every step, and hold 2x their size in moment buffers.

``masked_adam`` restores the reference semantics: leaves under a frozen
subtree get ``optax.set_to_zero`` (no state, no traffic, update == 0 —
numerically identical to unmasked Adam on zero grads, where m=v=0 keeps the
update at exactly 0/(sqrt(0)+eps)=0).
"""

from __future__ import annotations

from typing import Any, Optional

import optax


# Subtree names that stop_gradient their contents when the matching config
# flag freezes them. These names are unique to their modules:
#   - "visual_encoder": GNResNetEncoder inside VlnResnetDepthEncoder
#     (visual_wrappers.py:73)
#   - "cnn": TVResNet inside TorchVisionResNetEncoder (visual_wrappers.py:132)
#   - "embedding" under "instruction_encoder": the token table
#     (instruction_encoder.py:110-114)
_DEPTH_FROZEN = "visual_encoder"
_RGB_FROZEN = "cnn"


def trainable_mask(params, model_config) -> Any:
    """Pytree of bools matching ``params``: True = Adam updates the leaf.

    ``model_config=None`` (e.g. a stub policy with no config) means no
    freezing information — every leaf trains, matching plain Adam."""
    import jax

    if model_config is None:
        return jax.tree_util.tree_map(lambda _: True, params)

    frozen_roots = set()
    if not bool(model_config.DEPTH_ENCODER.trainable):
        frozen_roots.add(_DEPTH_FROZEN)
    if not bool(model_config.RGB_ENCODER.trainable):
        frozen_roots.add(_RGB_FROZEN)
    # only a PRETRAINED embedding table is frozen (reference
    # instruction_encoder.py:35-45); a fresh Gaussian table always trains
    ie = model_config.INSTRUCTION_ENCODER
    freeze_embedding = bool(getattr(ie, "use_pretrained_embeddings", False)) and not bool(
        getattr(ie, "fine_tune_embeddings", True)
    )

    def walk(tree, parent_key: str, frozen: bool):
        if isinstance(tree, dict):
            return {
                k: walk(
                    v, k,
                    frozen
                    or k in frozen_roots
                    or (freeze_embedding and k == "embedding"
                        and "instruction_encoder" in parent_key),
                )
                for k, v in tree.items()
            }
        return not frozen

    # flax params are nested dicts keyed by module names; tolerate FrozenDict
    # by unfreezing through tree_map-compatible plain dicts
    plain = jax.tree_util.tree_map(lambda x: x, params)  # copy leaves
    if not isinstance(plain, dict):
        try:
            plain = dict(plain)
        except TypeError:
            return jax.tree_util.tree_map(lambda _: True, params)
    return walk(plain, "", False)


def masked_adam(lr, params, model_config, eps: float = 1e-8,
                max_grad_norm: Optional[float] = None) -> optax.GradientTransformation:
    """Adam over the trainable leaves only; frozen leaves get set_to_zero
    (reference torch-Adam-skips-None-grads semantics). With max_grad_norm,
    prepends global-norm clipping over ALL leaves (frozen grads are exact
    zeros, so the norm equals the trainable-only norm — same as the
    reference clipping after DDP's allreduce)."""
    mask = trainable_mask(params, model_config)
    adam = optax.adam(lr, eps=eps)
    tx = optax.masked(adam, mask)
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
