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

from collections.abc import Mapping
from typing import Any, Optional

import optax


# Frozen subtrees are matched by (parent key, child key) PATH ANCHORS, not
# bare names at any depth — a future module that happens to reuse "cnn" or
# "visual_encoder" under a different parent cannot be silently frozen:
#   - depth_encoder/visual_encoder: GNResNetEncoder inside
#     VlnResnetDepthEncoder (visual_wrappers.py:73)
#   - rgb_encoder/cnn: TVResNet inside TorchVisionResNetEncoder
#     (visual_wrappers.py:132)
#   - instruction_encoder/embedding: the token table
#     (instruction_encoder.py:110-114)
_FROZEN_ANCHORS = {
    "depth": ("depth_encoder", "visual_encoder"),
    "rgb": ("rgb_encoder", "cnn"),
    "embedding": ("instruction_encoder", "embedding"),
}


def trainable_mask(params, model_config) -> Any:
    """Pytree of bools matching ``params``: True = Adam updates the leaf.

    ``model_config=None`` (e.g. a stub policy with no config) means no
    freezing information — every leaf trains, matching plain Adam.

    Fails LOUDLY when the config freezes an encoder whose anchored subtree
    does not exist in ``params`` (a renamed module would otherwise silently
    train weights the reference keeps frozen), and when ``params`` is a
    container type the walk cannot traverse while freezing is requested."""
    import jax

    if model_config is None:
        return jax.tree_util.tree_map(lambda _: True, params)

    want = {}
    if not bool(model_config.DEPTH_ENCODER.trainable):
        want["depth"] = _FROZEN_ANCHORS["depth"]
    if not bool(model_config.RGB_ENCODER.trainable):
        want["rgb"] = _FROZEN_ANCHORS["rgb"]
    # only a PRETRAINED embedding table is frozen (reference
    # instruction_encoder.py:35-45); a fresh Gaussian table always trains
    ie = model_config.INSTRUCTION_ENCODER
    if bool(getattr(ie, "use_pretrained_embeddings", False)) and not bool(
        getattr(ie, "fine_tune_embeddings", True)
    ):
        want["embedding"] = _FROZEN_ANCHORS["embedding"]

    if not want:
        return jax.tree_util.tree_map(lambda _: True, params)
    if not isinstance(params, Mapping):
        raise TypeError(
            f"trainable_mask: config freezes {sorted(want)} but params is a "
            f"{type(params).__name__}, not a mapping — cannot locate the "
            f"frozen subtrees"
        )

    found = {name: 0 for name in want}

    def walk(tree, parent_key: str, frozen: bool):
        if isinstance(tree, Mapping):
            out = {}
            for k, v in tree.items():
                f = frozen
                for name, (pk, ck) in want.items():
                    if k == ck and parent_key == pk:
                        f = True
                        found[name] += 1
                out[k] = walk(v, k, f)
            return out
        return not frozen

    mask = walk(params, "", False)
    missing = [f"{want[n][0]}/{want[n][1]}" for n in sorted(want) if found[n] == 0]
    if missing:
        raise ValueError(
            f"trainable_mask: config freezes {missing} but no such subtree "
            f"exists in params (top-level keys: {sorted(params)[:8]}) — a "
            f"renamed module would silently train weights the reference "
            f"keeps frozen (resnet_encoders.py:45-46,141-143)"
        )
    if not isinstance(params, dict):
        # mirror the container type so optax.masked's tree_map over
        # (mask, params) sees one treedef (e.g. flax FrozenDict params)
        from flax.core import freeze

        mask = freeze(mask)
    return mask


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


def restore_optim_state(optim_state, state_dict):
    """``flax.serialization.from_state_dict`` with migration of pre-masking
    checkpoints (plain Adam over the full tree) into the masked layout.

    masked_adam wraps Adam's state in ``optax.MaskedState(inner_state=...)``
    with ``MaskedNode`` placeholders at frozen leaves, so a checkpoint saved
    by the earlier plain-Adam trainers no longer from_state_dict's directly:
    the serialized tree gains an ``inner_state`` level and loses the frozen
    moment buffers. Migration = descend through the extra level and copy the
    moments the target still carries (the trainable ones); frozen moments in
    the legacy checkpoint are zeros by construction (zero grads in, zero
    moments out), so dropping them restores the numerically identical
    optimizer. IL.is_requeue restores route through here
    (trainers/base_trainer.py)."""
    from flax import serialization

    try:
        return serialization.from_state_dict(optim_state, state_dict)
    except (ValueError, KeyError, TypeError):
        target = serialization.to_state_dict(optim_state)
        merged = _merge_legacy_state(target, state_dict)
        return serialization.from_state_dict(optim_state, merged)


def _merge_legacy_state(target, legacy):
    """Copy legacy values into the target state-dict skeleton wherever paths
    align; insert the MaskedState ``inner_state`` level when the legacy tree
    lacks it; keep target placeholders (MaskedNode -> {}) elsewhere."""
    if isinstance(target, dict):
        if (
            set(target) == {"inner_state"}
            and isinstance(legacy, dict)
            and "inner_state" not in legacy
        ):
            return {"inner_state": _merge_legacy_state(target["inner_state"], legacy)}
        if not isinstance(legacy, dict):
            return target
        return {
            k: (_merge_legacy_state(v, legacy[k]) if k in legacy else v)
            for k, v in target.items()
        }
    return legacy
