"""Cross-Modal Attention (CMA) policy (ECCV'20).

Two recurrent layers with text/visual cross-attention between them. Parity
with reference vlnce_baselines/models/cma_policy.py:52-309: GRU#1 over
[rgb256, depth128, prev_a32]; state-query -> instruction K/V attention with
padding mask; text-query -> rgb/depth K/V attention via 1x1 convs; GRU#2 over
the compressed concat; optional progress-monitor aux loss.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlnce_tpu.registry import registry
from vlnce_tpu.config.node import to_static
from vlnce_tpu.models.attention import scaled_dot_attn
from vlnce_tpu.models.encoders.instruction_encoder import InstructionEncoder
from vlnce_tpu.models.encoders.visual_wrappers import (
    TorchVisionResNetEncoder,
    VlnResnetDepthEncoder,
)
from vlnce_tpu.models.policy import ILPolicy, categorical_head
from vlnce_tpu.models.rnn_state_encoder import RNNStateEncoder


def _conv1d(x: jnp.ndarray, features: int, name: str) -> jnp.ndarray:
    """1x1 Conv1d over [B, C, P] -> [B, features, P] (torch layout)."""
    y = nn.Dense(features, name=name)(x.transpose(0, 2, 1))
    return y.transpose(0, 2, 1)


class CMANet(nn.Module):
    model_config: Any
    num_actions: int
    depth_input_hw: Tuple[int, int] = (256, 256)
    compute_dtype: Any = jnp.float32

    @property
    def output_size(self) -> int:
        return self.model_config.STATE_ENCODER.hidden_size

    @nn.compact
    def __call__(self, observations, rnn_states, prev_actions, masks, seq_len: Optional[int] = None):
        mc = self.model_config
        H = mc.STATE_ENCODER.hidden_size

        instruction_embedding = InstructionEncoder.from_config(
            mc.INSTRUCTION_ENCODER, final_state_only=False, name="instruction_encoder"
        )(observations)  # [B', C_t, T_text]

        depth_embedding = VlnResnetDepthEncoder(
            input_hw=self.depth_input_hw,
            output_size=mc.DEPTH_ENCODER.output_size,
            backbone=mc.DEPTH_ENCODER.backbone,
            trainable=mc.DEPTH_ENCODER.trainable,
            remat=mc.DEPTH_ENCODER.remat,
            spatial_output=True,
            compute_dtype=self.compute_dtype,
            name="depth_encoder",
        )(observations)  # [B', C_d, h, w]
        depth_embedding = depth_embedding.reshape(*depth_embedding.shape[:2], -1)  # [B', C_d, P]

        rgb_embedding = TorchVisionResNetEncoder(
            version="resnet50" if mc.RGB_ENCODER.cnn_type == "TorchVisionResNet50" else "resnet18",
            output_size=mc.RGB_ENCODER.output_size,
            normalize_visual_inputs=mc.normalize_rgb,
            trainable=mc.RGB_ENCODER.trainable,
            remat=mc.RGB_ENCODER.remat,
            spatial_output=True,
            compute_dtype=self.compute_dtype,
            name="rgb_encoder",
        )(observations)  # [B', C_r, 4, 4]
        rgb_embedding = rgb_embedding.reshape(*rgb_embedding.shape[:2], -1)  # [B', C_r, 16]

        prev_action_embed_table = self.param(
            "prev_action_embedding", nn.initializers.normal(1.0), (self.num_actions + 1, 32)
        )
        idx = ((prev_actions.reshape(-1).astype(jnp.float32) + 1.0) * masks.reshape(-1)).astype(jnp.int32)
        prev_actions_emb = prev_action_embed_table[idx]  # [B', 32]

        if mc.ablate_instruction:
            instruction_embedding = instruction_embedding * 0
        if mc.ablate_depth:
            depth_embedding = depth_embedding * 0
        if mc.ablate_rgb:
            rgb_embedding = rgb_embedding * 0

        # rgb_linear: avg-pool over spatial positions then Dense + ReLU
        rgb_in = nn.relu(nn.Dense(mc.RGB_ENCODER.output_size, name="rgb_linear")(jnp.mean(rgb_embedding, axis=2).astype(jnp.float32)))
        # depth_linear: flatten everything then Dense + ReLU
        depth_in = nn.relu(nn.Dense(mc.DEPTH_ENCODER.output_size, name="depth_linear")(depth_embedding.reshape(depth_embedding.shape[0], -1).astype(jnp.float32)))

        state_in = jnp.concatenate([rgb_in, depth_in, prev_actions_emb], axis=1)

        first_rnn = RNNStateEncoder(
            input_size=state_in.shape[-1], hidden_size=H,
            rnn_type=mc.STATE_ENCODER.rnn_type, name="state_encoder",
        )
        second_rnn = RNNStateEncoder(
            input_size=H, hidden_size=H,
            rnn_type=mc.STATE_ENCODER.rnn_type, name="second_state_encoder",
        )
        L1 = first_rnn.num_recurrent_layers

        def run_rnn(rnn, x, states, m, T):
            if T is None:
                return rnn(x, states, m)
            N = x.shape[0] // T
            out, s = rnn(x.reshape(T, N, -1), states, m.reshape(T, N, 1))
            return out.reshape(T * N, -1), s

        state, rnn1_out = run_rnn(first_rnn, state_in, rnn_states[:, :L1], masks, seq_len)

        scale = 1.0 / ((H // 2) ** 0.5)
        text_state_q = nn.Dense(H // 2, name="state_q")(state)
        text_state_k = _conv1d(instruction_embedding, H // 2, name="text_k")
        text_mask = jnp.all(instruction_embedding == 0.0, axis=1)  # [B', T_text]

        if seq_len is not None:
            # attention operates per flattened sample; shapes already [B', ...]
            pass
        text_embedding = scaled_dot_attn(text_state_q, text_state_k, instruction_embedding, scale, text_mask, mask_mode="additive")

        rgb_kv = _conv1d(rgb_embedding.astype(jnp.float32), H // 2 + mc.RGB_ENCODER.output_size, name="rgb_kv")
        rgb_k, rgb_v = rgb_kv[:, : H // 2], rgb_kv[:, H // 2 :]
        depth_kv = _conv1d(depth_embedding.astype(jnp.float32), H // 2 + mc.DEPTH_ENCODER.output_size, name="depth_kv")
        depth_k, depth_v = depth_kv[:, : H // 2], depth_kv[:, H // 2 :]

        text_q = nn.Dense(H // 2, name="text_q")(text_embedding)
        rgb_attended = scaled_dot_attn(text_q, rgb_k, rgb_v, scale)
        depth_attended = scaled_dot_attn(text_q, depth_k, depth_v, scale)

        x = jnp.concatenate([state, text_embedding, rgb_attended, depth_attended, prev_actions_emb], axis=1)
        x = nn.relu(nn.Dense(H, name="second_state_compress")(x))
        x, rnn2_out = run_rnn(second_rnn, x, rnn_states[:, L1:], masks, seq_len)

        rnn_states_out = jnp.concatenate([rnn1_out, rnn2_out], axis=1)

        aux: Dict[str, Tuple[jnp.ndarray, float]] = {}
        if mc.PROGRESS_MONITOR.use:
            progress_hat = jnp.tanh(nn.Dense(
                1,
                kernel_init=nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal"),
                name="progress_monitor",
            )(x))
            progress_loss = (progress_hat.squeeze(-1) - observations["progress"].reshape(-1)) ** 2
            aux["progress_monitor"] = (progress_loss, mc.PROGRESS_MONITOR.alpha)

        return x, rnn_states_out, aux


class CMAModule(nn.Module):
    model_config: Any
    num_actions: int
    depth_input_hw: Tuple[int, int] = (256, 256)
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, observations, rnn_states, prev_actions, masks, seq_len: Optional[int] = None):
        net = CMANet(self.model_config, self.num_actions, self.depth_input_hw, self.compute_dtype, name="net")
        features, rnn_states_out, aux = net(observations, rnn_states, prev_actions, masks, seq_len)
        logits = categorical_head(features, self.num_actions, name="action_distribution")
        return logits, rnn_states_out, aux


@registry.register_policy(name="CMAPolicy")
class CMAPolicy(ILPolicy):
    @classmethod
    def build_module(cls, config, observation_space, num_actions: int) -> nn.Module:
        depth_hw = observation_space["depth"].shape[:2] if "depth" in observation_space.spaces else (256, 256)
        dtype = jnp.bfloat16 if getattr(config, "TPU", None) and config.TPU.PRECISION.compute_dtype == "bfloat16" else jnp.float32
        return CMAModule(
            model_config=to_static(config.MODEL), num_actions=num_actions,
            depth_input_hw=tuple(depth_hw), compute_dtype=dtype,
        )

    @classmethod
    def num_recurrent_layers_from_config(cls, config) -> int:
        per = 2 if config.MODEL.STATE_ENCODER.rnn_type == "LSTM" else 1
        return 2 * per  # two recurrent encoders
