"""Waypoint prediction network (ICCV'21 WPN/HPN).

Parity with reference vlnce_baselines/models/waypoint_predictors.py:29-625:
pano-batched RGB/depth encoding with the history frame concatenated as a
13th frame, 4-d prev-action featurization (sin/cos pano + offset + distance),
visual-history GRU, instruction attention, per-frame spatial attention, pano
MHA, main GRU, pano-stop logits via dotted features + stop head, and
distance/offset heads with bounded variances.

TPU notes: all 13 frames x B are encoded as one [(13B), H, W, C] batch
through each frozen CNN (one big MXU program); attention shapes stay
[B*12, ...] dense.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlnce_tpu.models.attention import MultiHeadDotProductAttention, scaled_dot_attn
from vlnce_tpu.models.encoders.instruction_encoder import InstructionEncoder
from vlnce_tpu.models.encoders.visual_wrappers import (
    TorchVisionResNetEncoder,
    VlnResnetDepthEncoder,
)
from vlnce_tpu.models.rnn_state_encoder import RNNStateEncoder

PREV_ACTION_DIM = 4
PANO_ATTN_KEY_DIM = 128
ANGLE_FEATURE_SIZE = 4


def distance_to_continuous(distance: jnp.ndarray, wypt_cfg) -> jnp.ndarray:
    """Discrete distance index -> meters (reference waypoint_predictors.py:
    184-198)."""
    if wypt_cfg.continuous_distance:
        return distance
    range_dist = wypt_cfg.max_distance_prediction - wypt_cfg.min_distance_prediction
    meters_per = range_dist / (wypt_cfg.discrete_distances - 1)
    return wypt_cfg.min_distance_prediction + distance * meters_per


def offset_to_continuous(offset: jnp.ndarray, wypt_cfg, num_panos: int) -> jnp.ndarray:
    """Discrete offset index -> radians (reference waypoint_predictors.py:
    200-209)."""
    if wypt_cfg.continuous_offset:
        return offset
    radians_per_pano = 2 * math.pi / num_panos
    rad_per_offset = radians_per_pano / (wypt_cfg.discrete_offsets - 1)
    return (-radians_per_pano / 2) + offset * rad_per_offset


class WaypointPredictionNet(nn.Module):
    model_config: Any
    num_panos: int = 12
    rgb_hw: Tuple[int, int] = (224, 224)
    depth_hw: Tuple[int, int] = (256, 256)
    compute_dtype: Any = jnp.float32

    @property
    def hidden_size(self) -> int:
        return self.model_config.STATE_ENCODER.hidden_size

    @property
    def num_recurrent_layers(self) -> int:
        per = 2 if self.model_config.STATE_ENCODER.rnn_type == "LSTM" else 1
        return 2 * per

    @nn.compact
    def __call__(self, observations, rnn_states, prev_actions: Dict[str, jnp.ndarray], masks, seq_len: Optional[int] = None):
        mc = self.model_config
        wc = mc.WAYPOINT
        H = self.hidden_size
        P = self.num_panos
        B = observations["rgb"].shape[0]

        instruction_embedding = InstructionEncoder.from_config(
            mc.INSTRUCTION_ENCODER, final_state_only=False, name="instruction_encoder"
        )(observations)  # [B, C_t, T]

        # -- pano + history frames through the frozen CNNs ------------------
        m = masks.reshape(B, 1, 1, 1)
        rgb_frames = jnp.concatenate(
            [observations["rgb"], (observations["rgb_history"] * m)[:, None]], axis=1
        )  # [B, 13, H, W, 3]
        rgb_flat = rgb_frames.reshape((B * (P + 1),) + rgb_frames.shape[2:])
        rgb_embedding = TorchVisionResNetEncoder(
            version="resnet50" if mc.RGB_ENCODER.cnn_type == "TorchVisionResNet50" else "resnet18",
            output_size=mc.RGB_ENCODER.output_size,
            normalize_visual_inputs=mc.normalize_rgb,
            remat=mc.RGB_ENCODER.remat,
            spatial_output=True,
            single_spatial_filter=False,
            compute_dtype=self.compute_dtype,
            name="rgb_encoder",
        )({"rgb": rgb_flat})  # [(13B), C_r, 4, 4]
        C_r = rgb_embedding.shape[1]
        rgb_embedding = rgb_embedding.reshape(B, P + 1, C_r, -1)  # [B, 13, C_r, 16]

        depth_frames = jnp.concatenate(
            [observations["depth"], (observations["depth_history"] * m)[:, None]], axis=1
        )
        depth_flat = depth_frames.reshape((B * (P + 1),) + depth_frames.shape[2:])
        depth_embedding = VlnResnetDepthEncoder(
            input_hw=self.depth_hw,
            output_size=mc.DEPTH_ENCODER.output_size,
            backbone=mc.DEPTH_ENCODER.backbone,
            remat=mc.DEPTH_ENCODER.remat,
            spatial_output=True,
            compute_dtype=self.compute_dtype,
            name="depth_encoder",
        )({"depth": depth_flat})  # [(13B), C_d, h, w]
        C_d = depth_embedding.shape[1]
        depth_embedding = depth_embedding.reshape(B, P + 1, C_d, -1)  # [B, 13, C_d, 16]

        rgb_history = rgb_embedding[:, P]  # [B, C_r, 16]
        rgb_embedding = rgb_embedding[:, :P]
        depth_history = depth_embedding[:, P]
        depth_embedding = depth_embedding[:, :P]

        # -- prev action featurization: [sin, cos, offset, distance] * mask -
        pano_prev = prev_actions["pano"].reshape(B, 1).astype(jnp.float32)
        delta_rot = 2 * math.pi / P
        heading_feats = jnp.concatenate(
            [jnp.sin(pano_prev * delta_rot), jnp.cos(pano_prev * delta_rot)], axis=1
        )
        prev_action_feats = (
            jnp.concatenate(
                [
                    heading_feats,
                    offset_to_continuous(prev_actions["offset"].reshape(B, 1).astype(jnp.float32), wc, P),
                    distance_to_continuous(prev_actions["distance"].reshape(B, 1).astype(jnp.float32), wc),
                ],
                axis=1,
            )
            * masks.reshape(B, 1)
        )

        if mc.ablate_instruction:
            instruction_embedding = instruction_embedding * 0
        if mc.ablate_rgb:
            rgb_embedding = rgb_embedding * 0
            rgb_history = rgb_history * 0
        if mc.ablate_depth:
            depth_embedding = depth_embedding * 0
            depth_history = depth_history * 0

        # -- visual history GRU ---------------------------------------------
        resnet_layer_size = 2048 if mc.RGB_ENCODER.cnn_type == "TorchVisionResNet50" else 512
        # mean-pool current pano rgb (non-spatial channels only)
        pooled = jnp.mean(rgb_embedding[:, :, :resnet_layer_size], axis=3)  # [B, 12, 2048]
        pooled = nn.Dense(mc.RGB_ENCODER.output_size, name="rgb_pool_linear")(pooled.astype(jnp.float32))
        rgb_pooled = jnp.mean(pooled, axis=1)  # [B, 256]

        rgb_hist_in = nn.relu(nn.Dense(mc.RGB_ENCODER.output_size, name="rgb_hist_linear")(
            jnp.mean(rgb_history, axis=2).astype(jnp.float32)
        ))
        depth_hist_in = nn.relu(nn.Dense(mc.DEPTH_ENCODER.output_size, name="depth_hist_linear")(
            depth_history.reshape(B, -1).astype(jnp.float32)
        ))

        visual_rnn = RNNStateEncoder(
            input_size=mc.RGB_ENCODER.output_size + PREV_ACTION_DIM + mc.RGB_ENCODER.output_size + mc.DEPTH_ENCODER.output_size,
            hidden_size=H, rnn_type=mc.STATE_ENCODER.rnn_type, name="visual_rnn",
        )
        L1 = visual_rnn.num_recurrent_layers

        def run_rnn(rnn, x, states, m):
            # sequence mode (seq_len=T, x flattened [T*n, D]) or single step
            if seq_len is None:
                return rnn(x, states, m)
            T = seq_len
            n = x.shape[0] // T
            out, s = rnn(x.reshape(T, n, -1), states, m.reshape(T, n, 1))
            return out.reshape(T * n, -1), s

        rnn_in = jnp.concatenate([rgb_pooled, prev_action_feats, rgb_hist_in, depth_hist_in], axis=1)
        visual_hist_feats, rnn1_out = run_rnn(visual_rnn, rnn_in, rnn_states[:, :L1], masks)

        # -- instruction attention ------------------------------------------
        dk = H // 2
        scale = 1.0 / math.sqrt(dk)
        inst_q = nn.relu(nn.Dense(dk, name="inst_attn_q")(visual_hist_feats))
        inst_k = nn.Dense(dk, name="inst_attn_k")(instruction_embedding.transpose(0, 2, 1)).transpose(0, 2, 1)
        text_mask = jnp.logical_not(jnp.all(instruction_embedding == 0.0, axis=1))
        text_embedding = scaled_dot_attn(
            inst_q, inst_k, instruction_embedding, scale, text_mask, mask_mode="multiplicative"
        )

        # -- spatial attention per pano frame -------------------------------
        flat_rgb = rgb_embedding.reshape(B * P, C_r, -1)
        flat_depth = depth_embedding.reshape(B * P, C_d, -1)
        text_q_spatial = nn.Dense(dk, name="text_q_linear")(text_embedding)  # [B, dk]
        text_q_rep = jnp.repeat(text_q_spatial, P, axis=0)  # [B*12, dk]

        rgb_kv = nn.Dense(dk + mc.RGB_ENCODER.output_size, name="rgb_kv_spatial")(
            flat_rgb.transpose(0, 2, 1).astype(jnp.float32)
        ).transpose(0, 2, 1)
        rgb_k, rgb_v = rgb_kv[:, :dk], rgb_kv[:, dk:]
        depth_kv = nn.Dense(dk + mc.DEPTH_ENCODER.output_size, name="depth_kv_spatial")(
            flat_depth.transpose(0, 2, 1).astype(jnp.float32)
        ).transpose(0, 2, 1)
        depth_k, depth_v = depth_kv[:, :dk], depth_kv[:, dk:]

        spatial_rgb = scaled_dot_attn(text_q_rep, rgb_k, rgb_v, scale).reshape(B, P, -1)
        spatial_depth = scaled_dot_attn(text_q_rep, depth_k, depth_v, scale).reshape(B, P, -1)

        # -- pano attention (MHA over the 12 frames) ------------------------
        shared = jnp.concatenate(
            [spatial_rgb, spatial_depth, observations["angle_features"]], axis=2
        )  # [B, 12, d_kv]
        shared_cf = shared.transpose(0, 2, 1)  # [B, d_kv, 12]
        attended_pano = MultiHeadDotProductAttention(
            d_qk=PANO_ATTN_KEY_DIM, d_v=PANO_ATTN_KEY_DIM, num_heads=1,
            d_out=shared.shape[2], name="pano_attn",
        )(text_embedding, shared_cf, shared_cf)

        # -- main GRU --------------------------------------------------------
        x = jnp.concatenate([text_embedding, attended_pano, visual_hist_feats, prev_action_feats], axis=1)
        x = nn.relu(nn.Dense(H, name="main_state_compress")(x))
        main_rnn = RNNStateEncoder(input_size=H, hidden_size=H, rnn_type=mc.STATE_ENCODER.rnn_type, name="main_state_encoder")
        x, rnn2_out = run_rnn(main_rnn, x, rnn_states[:, L1:], masks)
        rnn_states_out = jnp.concatenate([rnn1_out, rnn2_out], axis=1)

        # -- output heads ----------------------------------------------------
        final_feature_size = mc.RGB_ENCODER.output_size + mc.DEPTH_ENCODER.output_size + ANGLE_FEATURE_SIZE
        attended_visual = shared  # [B, 12, d]
        x_small = nn.relu(nn.Dense(final_feature_size, name="compress_x_linear")(x))
        dotted = jnp.sum(attended_visual * x_small[:, None, :], axis=2)  # [B, 12]
        stop_logit = nn.Dense(1, name="stop_linear")(x)
        pano_stop_logits = jnp.concatenate([dotted, stop_logit], axis=1)  # [B, 13]

        catted = jnp.concatenate(
            [attended_visual, jnp.broadcast_to(x[:, None, :], (B, P, x.shape[-1]))], axis=2
        )  # [B, 12, H + d]

        if wc.continuous_distance:
            d1 = jax.nn.sigmoid(nn.Dense(1, name="distance_linear")(catted)).squeeze(2)
            d1 = (wc.max_distance_prediction - wc.min_distance_prediction) * d1 + wc.min_distance_prediction
            d2 = (wc.max_distance_var - wc.min_distance_var) * jax.nn.sigmoid(
                nn.Dense(1, name="distance_var_linear")(catted)
            ).squeeze(2) + wc.min_distance_var
        else:
            d1 = nn.Dense(wc.discrete_distances, name="distance_linear")(catted)
            d2 = None

        if wc.continuous_offset:
            offset_scale = math.pi / P
            o1 = offset_scale * jnp.tanh(
                nn.Dense(1, name="offset_linear")(catted) / wc.offset_temperature
            ).squeeze(2)
            o2 = (wc.max_offset_var - wc.min_offset_var) * jax.nn.sigmoid(
                nn.Dense(1, name="offset_var_linear")(catted)
            ).squeeze(2) + wc.min_offset_var
        else:
            o1 = nn.Dense(wc.discrete_offsets, name="offset_linear")(catted)
            o2 = None

        value = nn.Dense(
            1, kernel_init=nn.initializers.orthogonal(1.0), name="critic"
        )(x)

        return {
            "pano_stop_logits": pano_stop_logits,
            "offset_var1": o1,
            "offset_var2": o2,
            "distance_var1": d1,
            "distance_var2": d2,
            "features": x,
            "rnn_states": rnn_states_out,
            "value": value,
        }
