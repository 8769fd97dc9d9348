"""End-to-end full-policy activation parity: torch reference-layout policies
vs the flax policies after weight conversion.

The torch fixtures (tests/torch_policies.py) reproduce the reference
architectures with the reference's state_dict key names; converting their
weights through vlnce_tpu/models/convert.py and comparing full-forward
activations (logits, values, recurrent states, progress heads) at REAL
production shapes is the strongest offline check that real reference
checkpoints reproduce behavior. Asset-gated SPL parity on MP3D is
scripts/eval_parity.py.
"""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from gymnasium import spaces

from vlnce_tpu.config import get_config
from vlnce_tpu.models.convert import convert_policy_state_dict

from tests.torch_policies import (
    TorchCMAPolicy,
    TorchSeq2SeqPolicy,
    TorchWaypointPolicy,
    randomize_bn_stats,
)

VOCAB, EMB, INSTR_H = 100, 50, 128


def _tokens(rng, B, T):
    toks = np.zeros((B, T), np.int64)
    for b in range(B):
        n = rng.randint(T // 3, T)
        toks[b, :n] = rng.randint(1, VOCAB, size=n)
    return toks


def _norm_randomize(module, seed=0):
    randomize_bn_stats(module, seed)
    g = torch.Generator().manual_seed(seed + 1)
    for m in module.modules():
        if isinstance(m, (torch.nn.GroupNorm, torch.nn.LayerNorm)):
            m.weight.data.normal_(1.0, 0.2, generator=g)
            m.bias.data.normal_(0.0, 0.2, generator=g)


@pytest.mark.slow  # >25s compile-heavy; full tier: pytest -m ""
def test_cma_full_policy_activation_parity():
    """CMA at production shapes (224^2 rgb, 256^2 depth, resnet50 both,
    biLSTM instructions, progress monitor) — reference cma_policy.py:219-307."""
    B, T = 2, 80
    rng = np.random.RandomState(0)
    torch.manual_seed(0)

    tpol = TorchCMAPolicy(
        H=512, rgb_out=256, depth_out=128, num_actions=4,
        vocab=VOCAB, emb=EMB, instr_hidden=INSTR_H,
        rgb_version="resnet50", depth_backbone="resnet50", depth_hw=(256, 256),
    ).eval()
    _norm_randomize(tpol)

    obs_np = {
        "rgb": rng.randint(0, 255, (B, 224, 224, 3)).astype(np.uint8),
        "depth": rng.rand(B, 256, 256, 1).astype(np.float32),
        "instruction": _tokens(rng, B, T),
        "progress": rng.rand(B, 1).astype(np.float32),
    }
    rnn_states = rng.randn(B, 2, 512).astype(np.float32)
    prev_actions = rng.randint(0, 4, (B, 1)).astype(np.int64)
    masks = np.array([[1.0], [0.0]], np.float32)  # one mid-episode, one reset

    with torch.no_grad():
        t_logits, t_rnn, t_progress = tpol(
            {
                "rgb": torch.from_numpy(obs_np["rgb"].transpose(0, 3, 1, 2)).float(),
                "depth": torch.from_numpy(obs_np["depth"].transpose(0, 3, 1, 2)),
                "instruction": torch.from_numpy(obs_np["instruction"]),
            },
            torch.from_numpy(rnn_states), torch.from_numpy(prev_actions),
            torch.from_numpy(masks),
        )

    cfg = get_config(opts=[
        "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False,
        "MODEL.INSTRUCTION_ENCODER.vocab_size", VOCAB,
        "MODEL.INSTRUCTION_ENCODER.bidirectional", True,
        "MODEL.PROGRESS_MONITOR.use", True,
        "TPU.PRECISION.compute_dtype", "float32",
    ])
    space = spaces.Dict({
        "rgb": spaces.Box(0, 255, (224, 224, 3), np.uint8),
        "depth": spaces.Box(0, 1, (256, 256, 1), np.float32),
        "instruction": spaces.Box(0, VOCAB, (T,), np.int64),
        "progress": spaces.Box(0, 1, (1,), np.float32),
    })
    from vlnce_tpu.models.cma_policy import CMAPolicy

    pol = CMAPolicy.from_config(cfg, space, spaces.Discrete(4))
    pol.init_params(jax.random.PRNGKey(0), batch_size=1)
    pol.params = convert_policy_state_dict(tpol.state_dict(), pol.params, "CMAPolicy")

    logits, rnn_out, aux = pol.module.apply(
        {"params": pol.params},
        {k: jnp.asarray(v) for k, v in obs_np.items()},
        jnp.asarray(rnn_states), jnp.asarray(prev_actions), jnp.asarray(masks),
    )

    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(rnn_out), t_rnn.numpy(), atol=1e-4, rtol=1e-3)
    t_loss = ((t_progress.squeeze(-1) - torch.from_numpy(obs_np["progress"]).squeeze(-1)) ** 2).numpy()
    np.testing.assert_allclose(np.asarray(aux["progress_monitor"][0]), t_loss, atol=1e-4, rtol=1e-3)


def test_seq2seq_full_policy_activation_parity():
    """Seq2Seq at production shapes with prev-action + progress monitor —
    reference seq2seq_policy.py:52-179."""
    B, T = 2, 60
    rng = np.random.RandomState(1)
    torch.manual_seed(1)

    tpol = TorchSeq2SeqPolicy(
        H=512, rgb_out=256, depth_out=128, num_actions=4,
        vocab=VOCAB, emb=EMB, instr_hidden=INSTR_H,
        rgb_version="resnet18", depth_backbone="resnet50", depth_hw=(256, 256),
        use_prev_action=True,
    ).eval()
    _norm_randomize(tpol, seed=1)

    obs_np = {
        "rgb": rng.randint(0, 255, (B, 224, 224, 3)).astype(np.uint8),
        "depth": rng.rand(B, 256, 256, 1).astype(np.float32),
        "instruction": _tokens(rng, B, T),
        "progress": rng.rand(B, 1).astype(np.float32),
    }
    rnn_states = rng.randn(B, 1, 512).astype(np.float32)
    prev_actions = rng.randint(0, 4, (B, 1)).astype(np.int64)
    masks = np.ones((B, 1), np.float32)

    with torch.no_grad():
        t_logits, t_rnn, t_progress = tpol(
            {
                "rgb": torch.from_numpy(obs_np["rgb"].transpose(0, 3, 1, 2)).float(),
                "depth": torch.from_numpy(obs_np["depth"].transpose(0, 3, 1, 2)),
                "instruction": torch.from_numpy(obs_np["instruction"]),
            },
            torch.from_numpy(rnn_states), torch.from_numpy(prev_actions),
            torch.from_numpy(masks),
        )

    cfg = get_config(opts=[
        "MODEL.policy_name", "Seq2SeqPolicy",
        "MODEL.RGB_ENCODER.cnn_type", "TorchVisionResNet18",
        "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False,
        "MODEL.INSTRUCTION_ENCODER.vocab_size", VOCAB,
        "MODEL.INSTRUCTION_ENCODER.bidirectional", False,
        "MODEL.SEQ2SEQ.use_prev_action", True,
        "MODEL.PROGRESS_MONITOR.use", True,
        "TPU.PRECISION.compute_dtype", "float32",
    ])
    space = spaces.Dict({
        "rgb": spaces.Box(0, 255, (224, 224, 3), np.uint8),
        "depth": spaces.Box(0, 1, (256, 256, 1), np.float32),
        "instruction": spaces.Box(0, VOCAB, (T,), np.int64),
        "progress": spaces.Box(0, 1, (1,), np.float32),
    })
    from vlnce_tpu.models.seq2seq_policy import Seq2SeqPolicy

    pol = Seq2SeqPolicy.from_config(cfg, space, spaces.Discrete(4))
    pol.init_params(jax.random.PRNGKey(0), batch_size=1)
    pol.params = convert_policy_state_dict(tpol.state_dict(), pol.params, "Seq2SeqPolicy")

    logits, rnn_out, aux = pol.module.apply(
        {"params": pol.params},
        {k: jnp.asarray(v) for k, v in obs_np.items()},
        jnp.asarray(rnn_states), jnp.asarray(prev_actions), jnp.asarray(masks),
    )
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(rnn_out), t_rnn.numpy(), atol=1e-4, rtol=1e-3)
    t_loss = ((t_progress.squeeze(-1) - torch.from_numpy(obs_np["progress"]).squeeze(-1)) ** 2).numpy()
    np.testing.assert_allclose(np.asarray(aux["progress_monitor"][0]), t_loss, atol=1e-4, rtol=1e-3)


def _wpn_case(continuous: bool, rgb_version: str, depth_backbone: str,
              img: int, depth_img: int, seed: int):
    B, T, P, H = 1, 50, 12, 512
    rng = np.random.RandomState(seed)
    torch.manual_seed(seed)

    tpol = TorchWaypointPolicy(
        H=H, rgb_out=256, depth_out=128, vocab=VOCAB, emb=EMB, instr_hidden=INSTR_H,
        rgb_version=rgb_version, depth_backbone=depth_backbone,
        depth_hw=(depth_img, depth_img),
        continuous_distance=continuous, continuous_offset=continuous,
    ).eval()
    _norm_randomize(tpol, seed=seed)

    obs_np = {
        "rgb": rng.randint(0, 255, (B, P, img, img, 3)).astype(np.uint8),
        "depth": rng.rand(B, P, depth_img, depth_img, 1).astype(np.float32),
        "rgb_history": rng.randint(0, 255, (B, img, img, 3)).astype(np.uint8),
        "depth_history": rng.rand(B, depth_img, depth_img, 1).astype(np.float32),
        "instruction": _tokens(rng, B, T),
        "angle_features": rng.rand(B, P, 4).astype(np.float32),
    }
    rnn_states = rng.randn(B, 2, H).astype(np.float32)
    prev_np = {
        "pano": rng.randint(0, P, (B, 1)).astype(np.float32),
        "offset": (rng.rand(B, 1).astype(np.float32) - 0.5) * 0.4,
        "distance": rng.rand(B, 1).astype(np.float32) + 0.3,
    }
    masks = np.ones((B, 1), np.float32)

    with torch.no_grad():
        t_out = tpol(
            {
                "rgb": torch.from_numpy(obs_np["rgb"].transpose(0, 1, 4, 2, 3)).float(),
                "depth": torch.from_numpy(obs_np["depth"].transpose(0, 1, 4, 2, 3)),
                "rgb_history": torch.from_numpy(obs_np["rgb_history"].transpose(0, 3, 1, 2)).float(),
                "depth_history": torch.from_numpy(obs_np["depth_history"].transpose(0, 3, 1, 2)),
                "instruction": torch.from_numpy(obs_np["instruction"]),
                "angle_features": torch.from_numpy(obs_np["angle_features"]),
            },
            torch.from_numpy(rnn_states),
            {k: torch.from_numpy(v) for k, v in prev_np.items()},
            torch.from_numpy(masks),
        )

    cfg = get_config(opts=[
        "MODEL.policy_name", "WaypointPolicy",
        "MODEL.RGB_ENCODER.cnn_type",
        "TorchVisionResNet50" if rgb_version == "resnet50" else "TorchVisionResNet18",
        "MODEL.DEPTH_ENCODER.backbone", depth_backbone,
        "MODEL.STATE_ENCODER.hidden_size", H,
        "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False,
        "MODEL.INSTRUCTION_ENCODER.vocab_size", VOCAB,
        "MODEL.INSTRUCTION_ENCODER.bidirectional", True,
        "MODEL.INSTRUCTION_ENCODER.final_state_only", False,
        "MODEL.WAYPOINT.continuous_distance", continuous,
        "MODEL.WAYPOINT.continuous_offset", continuous,
        "TPU.PRECISION.compute_dtype", "float32",
    ])
    space = spaces.Dict({
        "rgb": spaces.Box(0, 255, (P, img, img, 3), np.uint8),
        "depth": spaces.Box(0, 1, (P, depth_img, depth_img, 1), np.float32),
        "rgb_history": spaces.Box(0, 255, (img, img, 3), np.uint8),
        "depth_history": spaces.Box(0, 1, (depth_img, depth_img, 1), np.float32),
        "instruction": spaces.Box(0, VOCAB, (T,), np.int64),
        "angle_features": spaces.Box(-1, 1, (P, 4), np.float32),
    })
    from vlnce_tpu.models.waypoint_policy import WaypointPolicy

    pol = WaypointPolicy.from_config(cfg, space)
    pol.init_params(jax.random.PRNGKey(0), batch_size=1)
    pol.params = convert_policy_state_dict(tpol.state_dict(), pol.params, "WaypointPolicy")

    out = pol.module.apply(
        {"params": pol.params},
        {k: jnp.asarray(v) for k, v in obs_np.items()},
        jnp.asarray(rnn_states),
        {k: jnp.asarray(v) for k, v in prev_np.items()},
        jnp.asarray(masks),
    )

    np.testing.assert_allclose(
        np.asarray(out["pano_stop_logits"]), t_out["pano_stop_logits"].numpy(), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(np.asarray(out["value"]), t_out["value"].numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["rnn_states"]), t_out["rnn_states"].numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["distance_var1"]), t_out["distance_var1"].numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["offset_var1"]), t_out["offset_var1"].numpy(), atol=1e-4, rtol=1e-3)
    if continuous:
        np.testing.assert_allclose(np.asarray(out["distance_var2"]), t_out["distance_var2"].numpy(), atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(out["offset_var2"]), t_out["offset_var2"].numpy(), atol=1e-4, rtol=1e-3)


@pytest.mark.slow  # >25s compile-heavy; full tier: pytest -m ""
def test_waypoint_continuous_parity_real_shapes():
    """WPN continuous heads at production shapes (12-pano 224^2 rgb / 256^2
    depth, resnet50) — reference waypoint_predictors.py:330-615."""
    _wpn_case(continuous=True, rgb_version="resnet50", depth_backbone="resnet50",
              img=224, depth_img=256, seed=2)


def test_waypoint_discrete_heads_parity():
    """Discrete distance/offset head branch (WPN-D* rows) at reduced image
    size; exercises the categorical head conversion."""
    _wpn_case(continuous=False, rgb_version="resnet18", depth_backbone="resnet18",
              img=224, depth_img=256, seed=3)
