"""Seq2Seq policy (ECCV'20 baseline).

concat(instruction final state, depth 128-d, rgb 256-d [, prev-action 32-d])
-> GRU(512) -> categorical head. Parity with reference
vlnce_baselines/models/seq2seq_policy.py:20-179.

TPU-native batching: encoders always run on a flat [B', ...] batch (B' = B or
T*N); only the recurrent core reshapes to [T, N, ...] for the lax.scan. One
compiled program serves act (T=None) and one serves training (static T).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlnce_tpu.registry import registry
from vlnce_tpu.config.node import to_static
from vlnce_tpu.models.encoders.instruction_encoder import InstructionEncoder
from vlnce_tpu.models.encoders.visual_wrappers import (
    TorchVisionResNetEncoder,
    VlnResnetDepthEncoder,
)
from vlnce_tpu.models.policy import ILPolicy, categorical_head
from vlnce_tpu.models.rnn_state_encoder import RNNStateEncoder


class Seq2SeqNet(nn.Module):
    model_config: Any  # frozen MODEL config subtree
    num_actions: int
    depth_input_hw: Tuple[int, int] = (256, 256)
    compute_dtype: Any = jnp.float32

    @property
    def output_size(self) -> int:
        return self.model_config.STATE_ENCODER.hidden_size

    @property
    def num_recurrent_layers(self) -> int:
        return 2 if self.model_config.STATE_ENCODER.rnn_type == "LSTM" else 1

    @nn.compact
    def __call__(self, observations, rnn_states, prev_actions, masks, seq_len: Optional[int] = None):
        mc = self.model_config
        instruction_embedding = InstructionEncoder.from_config(mc.INSTRUCTION_ENCODER, name="instruction_encoder")(observations)
        depth_embedding = VlnResnetDepthEncoder(
            input_hw=self.depth_input_hw,
            output_size=mc.DEPTH_ENCODER.output_size,
            backbone=mc.DEPTH_ENCODER.backbone,
            trainable=mc.DEPTH_ENCODER.trainable,
            remat=mc.DEPTH_ENCODER.remat,
            spatial_output=False,
            compute_dtype=self.compute_dtype,
            name="depth_encoder",
        )(observations)
        rgb_embedding = TorchVisionResNetEncoder(
            version="resnet50" if mc.RGB_ENCODER.cnn_type == "TorchVisionResNet50" else "resnet18",
            output_size=mc.RGB_ENCODER.output_size,
            normalize_visual_inputs=mc.normalize_rgb,
            trainable=mc.RGB_ENCODER.trainable,
            remat=mc.RGB_ENCODER.remat,
            spatial_output=False,
            compute_dtype=self.compute_dtype,
            name="rgb_encoder",
        )(observations)

        if mc.ablate_instruction:
            instruction_embedding = instruction_embedding * 0
        if mc.ablate_depth:
            depth_embedding = depth_embedding * 0
        if mc.ablate_rgb:
            rgb_embedding = rgb_embedding * 0

        x = jnp.concatenate([instruction_embedding, depth_embedding, rgb_embedding], axis=1)

        if mc.SEQ2SEQ.use_prev_action:
            embed = self.param("prev_action_embedding", nn.initializers.normal(1.0), (self.num_actions + 1, 32))
            idx = ((prev_actions.reshape(-1).astype(jnp.float32) + 1.0) * masks.reshape(-1)).astype(jnp.int32)
            x = jnp.concatenate([x, embed[idx]], axis=1)

        state_encoder = RNNStateEncoder(
            input_size=x.shape[-1], hidden_size=mc.STATE_ENCODER.hidden_size,
            rnn_type=mc.STATE_ENCODER.rnn_type, name="state_encoder",
        )
        if seq_len is None:
            x, rnn_states_out = state_encoder(x, rnn_states, masks)
        else:
            T = seq_len
            N = x.shape[0] // T
            x_seq = x.reshape(T, N, -1)
            m_seq = masks.reshape(T, N, 1)
            out, rnn_states_out = state_encoder(x_seq, rnn_states, m_seq)
            x = out.reshape(T * N, -1)

        aux: Dict[str, Tuple[jnp.ndarray, float]] = {}
        if mc.PROGRESS_MONITOR.use:
            progress_hat = jnp.tanh(nn.Dense(1, name="progress_monitor")(x))
            progress_loss = (progress_hat.squeeze(-1) - observations["progress"].reshape(-1)) ** 2
            aux["progress_monitor"] = (progress_loss, mc.PROGRESS_MONITOR.alpha)

        return x, rnn_states_out, aux


class Seq2SeqModule(nn.Module):
    model_config: Any
    num_actions: int
    depth_input_hw: Tuple[int, int] = (256, 256)
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, observations, rnn_states, prev_actions, masks, seq_len: Optional[int] = None):
        net = Seq2SeqNet(
            self.model_config, self.num_actions, self.depth_input_hw, self.compute_dtype, name="net"
        )
        features, rnn_states_out, aux = net(observations, rnn_states, prev_actions, masks, seq_len)
        logits = categorical_head(features, self.num_actions, name="action_distribution")
        return logits, rnn_states_out, aux


@registry.register_policy(name="Seq2SeqPolicy")
class Seq2SeqPolicy(ILPolicy):
    num_recurrent_layers_per_rnn = {"GRU": 1, "LSTM": 2}

    @classmethod
    def build_module(cls, config, observation_space, num_actions: int) -> nn.Module:
        depth_hw = observation_space["depth"].shape[:2] if "depth" in observation_space.spaces else (256, 256)
        dtype = jnp.bfloat16 if getattr(config, "TPU", None) and config.TPU.PRECISION.compute_dtype == "bfloat16" else jnp.float32
        return Seq2SeqModule(
            model_config=to_static(config.MODEL), num_actions=num_actions,
            depth_input_hw=tuple(depth_hw), compute_dtype=dtype,
        )

    @classmethod
    def num_recurrent_layers_from_config(cls, config) -> int:
        return cls.num_recurrent_layers_per_rnn[config.MODEL.STATE_ENCODER.rnn_type]
