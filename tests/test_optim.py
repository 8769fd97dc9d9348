"""parallel/optim.py unit tests: path-anchored freezing, loud failure on
renamed modules, and legacy (pre-masking) optimizer-state restoration.

The reference freezes its visual encoders by never giving them gradients
(resnet_encoders.py:45-46,141-143); masked_adam mirrors that by masking the
anchored subtrees, so a silent mask miss = silently training frozen weights.
"""

import numpy as np
import optax
import pytest

from vlnce_tpu.config import get_config
from vlnce_tpu.parallel.optim import masked_adam, restore_optim_state, trainable_mask


def _leaf(shape=(2,)):
    return np.ones(shape, np.float32)


def _params():
    """Minimal tree with the production anchors (CMA-style net/ nesting)."""
    return {
        "net": {
            "depth_encoder": {"visual_encoder": {"w": _leaf()}, "head": {"w": _leaf()}},
            "rgb_encoder": {"cnn": {"w": _leaf()}, "fc": {"w": _leaf()}},
            "instruction_encoder": {"embedding": _leaf((4, 2)), "rnn": {"w": _leaf()}},
        },
        "action_head": {"w": _leaf()},
    }


def test_trainable_mask_anchored_paths():
    """Frozen subtrees are matched by parent/child anchor, not bare name: a
    'cnn' under an unrelated parent stays trainable (ADVICE r4)."""
    cfg = get_config(opts=[
        "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", True,
        "MODEL.INSTRUCTION_ENCODER.fine_tune_embeddings", False,
    ])
    params = _params()
    params["decoy"] = {"cnn": {"w": _leaf()}, "visual_encoder": {"w": _leaf()}}
    mask = trainable_mask(params, cfg.MODEL)
    assert mask["net"]["depth_encoder"]["visual_encoder"]["w"] is False
    assert mask["net"]["rgb_encoder"]["cnn"]["w"] is False
    assert mask["net"]["instruction_encoder"]["embedding"] is False
    assert mask["net"]["depth_encoder"]["head"]["w"] is True
    assert mask["net"]["rgb_encoder"]["fc"]["w"] is True
    # decoys under the wrong parent are NOT frozen
    assert mask["decoy"]["cnn"]["w"] is True
    assert mask["decoy"]["visual_encoder"]["w"] is True


def test_trainable_mask_missing_subtree_fails_loudly():
    """A renamed frozen module must raise, not silently train (VERDICT r4 #9)."""
    cfg = get_config()
    assert not cfg.MODEL.RGB_ENCODER.trainable  # production default: frozen
    params = _params()
    params["net"]["rgb_encoder"] = {"renamed_cnn": {"w": _leaf()}, "fc": {"w": _leaf()}}
    with pytest.raises(ValueError, match="rgb_encoder/cnn"):
        trainable_mask(params, cfg.MODEL)


def test_trainable_mask_non_mapping_params():
    """Non-mapping params + freezing requested = loud TypeError; with no
    freezing flags it's all-True like plain Adam (ADVICE r4)."""
    cfg = get_config()
    with pytest.raises(TypeError, match="not a mapping"):
        trainable_mask([_leaf(), _leaf()], cfg.MODEL)
    cfg_all_trainable = get_config(opts=[
        "MODEL.RGB_ENCODER.trainable", True,
        "MODEL.DEPTH_ENCODER.trainable", True,
        "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False,
    ])
    assert trainable_mask([_leaf(), _leaf()], cfg_all_trainable.MODEL) == [True, True]


def test_trainable_mask_fresh_embedding_trains():
    """A fresh (non-pretrained) embedding table always trains (reference
    instruction_encoder.py:35-45)."""
    cfg = get_config(opts=["MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False])
    mask = trainable_mask(_params(), cfg.MODEL)
    assert mask["net"]["instruction_encoder"]["embedding"] is True


def _zero_grads(params):
    import jax

    return jax.tree_util.tree_map(lambda x: np.zeros_like(x), params)


def _legacy_plain_adam_state_dict(params, lr, n_steps=3):
    """What a pre-masking checkpoint stored: optax.adam state over the FULL
    tree after a few steps (frozen leaves' moments are zeros: zero grads)."""
    import jax
    from flax import serialization

    tx = optax.adam(lr)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(lambda x: np.full_like(x, 0.1), params)
    # zero out the frozen subtrees' grads, as stop_gradient does in training
    grads["net"]["depth_encoder"]["visual_encoder"] = _zero_grads(
        grads["net"]["depth_encoder"]["visual_encoder"])
    grads["net"]["rgb_encoder"]["cnn"] = _zero_grads(grads["net"]["rgb_encoder"]["cnn"])
    p = params
    for _ in range(n_steps):
        updates, state = tx.update(grads, state, p)
        p = optax.apply_updates(p, updates)
    return serialization.to_state_dict(state), state, grads, p


def test_restore_optim_state_migrates_legacy_plain_adam():
    """IL.is_requeue restore of a pre-masking checkpoint: the plain-Adam
    state_dict migrates into the MaskedState layout with trainable moments
    preserved bit-exact, and the next update step matches the trajectory the
    legacy optimizer would have taken (ADVICE r4 checkpoint-break item)."""
    cfg = get_config()
    lr = 2.5e-4
    params = _params()
    legacy_sd, legacy_state, grads, p_after = _legacy_plain_adam_state_dict(params, lr)

    masked = masked_adam(lr, params, cfg.MODEL)
    restored = restore_optim_state(masked.init(params), legacy_sd)

    # trainable moments carried over exactly
    inner = restored.inner_state[0]
    np.testing.assert_array_equal(
        np.asarray(inner.mu["net"]["rgb_encoder"]["fc"]["w"]),
        np.asarray(legacy_state[0].mu["net"]["rgb_encoder"]["fc"]["w"]),
    )
    assert int(inner.count) == int(legacy_state[0].count)
    # frozen leaves stay MaskedNode (no buffers resurrected)
    assert isinstance(
        inner.mu["net"]["depth_encoder"]["visual_encoder"]["w"], optax.MaskedNode
    )

    # next-step parity: masked-from-restored == plain-from-legacy on
    # trainable leaves; frozen leaves untouched by both
    mu, _ = masked.update(grads, restored, p_after)
    pu, _ = optax.adam(lr).update(grads, legacy_state, p_after)
    p_m = optax.apply_updates(p_after, mu)
    p_p = optax.apply_updates(p_after, pu)
    np.testing.assert_allclose(
        np.asarray(p_m["net"]["rgb_encoder"]["fc"]["w"]),
        np.asarray(p_p["net"]["rgb_encoder"]["fc"]["w"]), rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(p_m["net"]["rgb_encoder"]["cnn"]["w"]),
        np.asarray(params["net"]["rgb_encoder"]["cnn"]["w"]),
    )


def test_restore_optim_state_current_layout_roundtrip():
    """Same-layout checkpoints restore through the plain from_state_dict path."""
    from flax import serialization

    cfg = get_config()
    params = _params()
    masked = masked_adam(1e-3, params, cfg.MODEL)
    state = masked.init(params)
    grads = jax_tree_full(params, 0.1)
    _, state = masked.update(grads, state, params)
    sd = serialization.to_state_dict(state)
    restored = restore_optim_state(masked.init(params), sd)
    np.testing.assert_array_equal(
        np.asarray(restored.inner_state[0].mu["action_head"]["w"]),
        np.asarray(state.inner_state[0].mu["action_head"]["w"]),
    )


def jax_tree_full(params, v):
    import jax

    return jax.tree_util.tree_map(lambda x: np.full_like(x, v), params)
