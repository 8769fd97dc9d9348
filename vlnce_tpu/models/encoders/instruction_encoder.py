"""Instruction encoder: token-embedding or BERT-feature path + masked RNN.

Parity with reference vlnce_baselines/models/encoders/instruction_encoder.py:
11-94. Packed-sequence semantics are reproduced with masked scans: hidden
state only updates for t < length, so the final state equals torch's packed
final state; for the bidirectional case the sequence is reversed *within each
row's length* before the backward pass, exactly like pack_padded_sequence.

Output:
- final_state_only=True  -> [B, H * num_directions] (final hidden)
- final_state_only=False -> [B, H * num_directions, T] (full outputs,
  channel-first to match the reference's .permute(0, 2, 1))
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlnce_tpu.models.rnn_state_encoder import (
    _SCAN_UNROLL,
    GRUCellParams,
    LSTMCellParams,
)


class _DirectionalRNN(nn.Module):
    """Scan an RNN over [B, T, E] with per-row lengths; returns full outputs
    [B, T, H] (zeroed past length) and the final state [B, H]."""

    input_size: int
    hidden_size: int
    rnn_type: str = "LSTM"

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        B, T, _ = x.shape
        cell = (LSTMCellParams if self.rnn_type == "LSTM" else GRUCellParams)(
            self.input_size, self.hidden_size, name="cell"
        )
        xi_all = cell.project_inputs(x.reshape(B * T, -1)).reshape(B, T, -1).transpose(1, 0, 2)
        t_idx = jnp.arange(T)
        valid = (t_idx[None, :] < lengths[:, None]).astype(x.dtype)  # [B, T]

        h0 = jnp.zeros((B, self.hidden_size), x.dtype)
        if self.rnn_type == "LSTM":
            c0 = jnp.zeros((B, self.hidden_size), x.dtype)

            def body(carry, inp):
                h, c = carry
                xi, m = inp  # m: [B, 1]
                h_new, c_new = cell.step(xi, h, c)
                h = jnp.where(m > 0, h_new, h)
                c = jnp.where(m > 0, c_new, c)
                return (h, c), h

            (h_final, _), outs = jax.lax.scan(
                body, (h0, c0), (xi_all, valid.T[:, :, None]), unroll=_SCAN_UNROLL
            )
        else:

            def body(h, inp):
                xi, m = inp
                h_new = cell.step(xi, h)
                h = jnp.where(m > 0, h_new, h)
                return h, h

            h_final, outs = jax.lax.scan(
                body, h0, (xi_all, valid.T[:, :, None]), unroll=_SCAN_UNROLL
            )

        outs = outs.transpose(1, 0, 2) * valid[:, :, None]  # [B, T, H], zero past length
        return outs, h_final


def _reverse_within_length(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, E] -> x' with x'[b, t] = x[b, len_b - 1 - t] for t < len_b."""
    B, T, _ = x.shape
    t_idx = jnp.arange(T)[None, :]
    idx = jnp.where(t_idx < lengths[:, None], lengths[:, None] - 1 - t_idx, t_idx)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


class InstructionEncoder(nn.Module):
    """config fields mirror MODEL.INSTRUCTION_ENCODER
    (reference vlnce_baselines/config/default.py:222-237)."""

    vocab_size: int = 2504
    embedding_size: int = 50
    hidden_size: int = 128
    rnn_type: str = "LSTM"
    final_state_only: bool = True
    bidirectional: bool = False
    sensor_uuid: str = "instruction"
    use_pretrained_embeddings: bool = True  # converter fills the table
    fine_tune_embeddings: bool = False

    @property
    def output_size(self) -> int:
        return self.hidden_size * (2 if self.bidirectional else 1)

    @nn.compact
    def __call__(self, observations) -> jnp.ndarray:
        if self.sensor_uuid == "instruction":
            tokens = observations["instruction"].astype(jnp.int32)  # [B, T]
            lengths = jnp.sum((tokens != 0).astype(jnp.int32), axis=1)
            embedding = self.param(
                "embedding", nn.initializers.normal(1.0), (self.vocab_size, self.embedding_size)
            )
            # reference semantics (instruction_encoder.py:35-45): ONLY a
            # pretrained table is frozen (unless fine-tuned); a fresh
            # Gaussian-initialized table always trains
            if self.use_pretrained_embeddings and not self.fine_tune_embeddings:
                embedding = jax.lax.stop_gradient(embedding)
            x = embedding[tokens]  # [B, T, E]
            input_size = self.embedding_size
        else:
            x = observations[self.sensor_uuid]  # [B, T, 768] BERT features
            nonzero = jnp.sum((x != 0.0).astype(jnp.int32), axis=2)
            lengths = jnp.sum((nonzero != 0).astype(jnp.int32), axis=1)
            input_size = x.shape[-1]

        fwd_out, fwd_final = _DirectionalRNN(
            input_size, self.hidden_size, self.rnn_type, name="rnn_fwd"
        )(x, lengths)

        if self.bidirectional:
            x_rev = _reverse_within_length(x, lengths)
            bwd_out_rev, bwd_final = _DirectionalRNN(
                input_size, self.hidden_size, self.rnn_type, name="rnn_bwd"
            )(x_rev, lengths)
            bwd_out = _reverse_within_length(bwd_out_rev, lengths)
            out = jnp.concatenate([fwd_out, bwd_out], axis=2)
            final = jnp.concatenate([fwd_final, bwd_final], axis=1)
        else:
            out, final = fwd_out, fwd_final

        if self.final_state_only:
            return final  # [B, H*dirs]
        return out.transpose(0, 2, 1)  # [B, H*dirs, T]

    @classmethod
    def from_config(cls, config, **overrides) -> "InstructionEncoder":
        kw = dict(
            vocab_size=config.vocab_size,
            embedding_size=config.embedding_size,
            hidden_size=config.hidden_size,
            rnn_type=config.rnn_type,
            final_state_only=config.final_state_only,
            bidirectional=config.bidirectional,
            sensor_uuid=config.sensor_uuid,
            use_pretrained_embeddings=config.use_pretrained_embeddings,
            fine_tune_embeddings=config.fine_tune_embeddings,
        )
        kw.update(overrides)
        return cls(**kw)
