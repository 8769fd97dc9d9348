"""Attention primitives as flax modules.

Single-query cross-attention over small key sets — exactly the shapes the
VLN-CE models use (reference vlnce_baselines/models/utils.py:155-266 and the
CMA _attn at cma_policy.py:207-217). These are tiny (P <= 512 keys, one
query), so the TPU-native play is fusing into surrounding matmuls via XLA,
not a pallas kernel; einsums keep everything MXU-shaped.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def scaled_dot_attn(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float, mask: Optional[jnp.ndarray] = None,
    mask_mode: str = "additive",
) -> jnp.ndarray:
    """q: [B, Dk]; k: [B, Dk, P]; v: [B, Dv, P] -> [B, Dv].

    mask_mode "additive": logits -= mask * 1e8 (mask marks PAD positions; CMA
    convention, reference cma_policy.py:212-215, applied pre-scale).
    mask_mode "multiplicative": logits *= mask (waypoint DotProductAttention
    convention, reference models/utils.py:173-177).
    """
    energy = jnp.einsum("bd,bdp->bp", q, k)
    if mask is not None:
        if mask_mode == "additive":
            energy = energy - mask.astype(energy.dtype) * 1e8
        else:
            energy = energy * mask.astype(energy.dtype)
    attn = jax.nn.softmax(energy * scale, axis=-1)
    return jnp.einsum("bp,bdp->bd", attn, v)


class DotProductAttention(nn.Module):
    """reference vlnce_baselines/models/utils.py:155-178 (multiplicative
    mask, scale applied after masking)."""

    key_dimension: int

    def __call__(self, q, k, v, mask=None):
        return scaled_dot_attn(q, k, v, 1.0 / (self.key_dimension**0.5), mask, mask_mode="multiplicative")


class MultiHeadDotProductAttention(nn.Module):
    """Single-query MHA without residual
    (reference vlnce_baselines/models/utils.py:181-266)."""

    d_qk: int
    d_v: int
    num_heads: int
    d_out: int
    normalize: bool = True
    dropout_p: float = 0.0

    @nn.compact
    def __call__(self, q, k, v, mask=None, deterministic: bool = True):
        """q: [B, d_q_in]; k: [B, d_k_in, P]; v: [B, d_v_in, P]."""
        B, _, P = k.shape
        H = self.num_heads
        q_proj = nn.Dense(self.d_qk * H, use_bias=False, name="q_linear")(q)  # [B, H*dqk]
        k_proj = nn.Dense(self.d_qk * H, use_bias=False, name="k_linear")(k.transpose(0, 2, 1))  # [B, P, H*dqk]
        v_proj = nn.Dense(self.d_v * H, use_bias=False, name="v_linear")(v.transpose(0, 2, 1))  # [B, P, H*dv]

        q_h = q_proj.reshape(B, H, self.d_qk)
        k_h = k_proj.reshape(B, P, H, self.d_qk)
        v_h = v_proj.reshape(B, P, H, self.d_v)

        energy = jnp.einsum("bhd,bphd->bhp", q_h, k_h)
        if mask is not None:
            energy = energy * mask[:, None, :].astype(energy.dtype)
        attn = jax.nn.softmax(energy * (1.0 / (self.d_qk**0.5)), axis=-1)
        attended = jnp.einsum("bhp,bphd->bhd", attn, v_h).reshape(B, H * self.d_v)

        out = nn.Dense(self.d_out, use_bias=False, name="final_linear")(attended)
        if self.dropout_p > 0.0:
            out = nn.Dropout(self.dropout_p)(out, deterministic=deterministic)
        if self.normalize:
            out = nn.LayerNorm(epsilon=1e-6, name="layer_norm")(out)
        return out
