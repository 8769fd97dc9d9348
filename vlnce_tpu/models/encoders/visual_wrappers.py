"""Depth/RGB encoder wrappers: spatial embeddings, pooling heads, and the
precomputed-feature bypass.

Parity with reference vlnce_baselines/models/encoders/resnet_encoders.py:
17-229. Outputs follow the reference's channel-first convention for spatial
features ([B, C, H, W] flattened to [B, C, P] by callers); internally
everything is NHWC for TPU.

The precomputed-feature bypass (`depth_features` / `rgb_features` in the obs
dict) is what DAgger's frozen-encoder caching rides on (reference
dagger_trainer.py:294-314): on TPU the encoder jit simply returns features
explicitly and collection stores those.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlnce_tpu.models.encoders.resnet import (
    GNResNetEncoder,
    TVResNet,
    adaptive_avg_pool,
)

Dtype = Any


class VlnResnetDepthEncoder(nn.Module):
    """GroupNorm ResNet over depth; DDPPO PointGoal weights load via the
    converter (reference resnet_encoders.py:17-115)."""

    input_hw: Tuple[int, int] = (256, 256)
    output_size: int = 128
    backbone: str = "resnet50"
    resnet_baseplanes: int = 32
    spatial_output: bool = False
    trainable: bool = False
    # rematerialize the backbone in the backward pass (jax.checkpoint): the
    # [B', H, W] conv activations are recomputed instead of stored, letting
    # full-pixel IL training run much larger T*N batches per chip. Only
    # meaningful when trainable (stop_gradient already frees frozen
    # activations). Param tree is unchanged (lifted transform).
    remat: bool = False
    compute_dtype: Dtype = jnp.float32

    def encoder_output_chw(self) -> Tuple[int, int, int]:
        return GNResNetEncoder(
            input_hw=self.input_hw, base_planes=self.resnet_baseplanes,
            ngroups=self.resnet_baseplanes // 2, backbone=self.backbone,
        ).output_shape_chw()

    @property
    def output_shape(self):
        c, h, w = self.encoder_output_chw()
        if self.spatial_output:
            return (c + 64, h, w)
        return (self.output_size,)

    @nn.compact
    def __call__(self, observations):
        if "depth_features" in observations:
            x = observations["depth_features"]  # [B, C, h, w] (cached)
        else:
            depth = observations["depth"]  # [B, H, W, 1]
            enc_cls = nn.remat(GNResNetEncoder) if self.remat else GNResNetEncoder
            feats = enc_cls(
                input_hw=self.input_hw, base_planes=self.resnet_baseplanes,
                ngroups=self.resnet_baseplanes // 2, backbone=self.backbone,
                dtype=self.compute_dtype, name="visual_encoder",
            )(depth)
            if not self.trainable:
                feats = jax.lax.stop_gradient(feats)
            x = feats.transpose(0, 3, 1, 2)  # -> [B, C, h, w] reference layout
            # expose frozen features for DAgger's caching collection path
            self.sow("intermediates", "cached_features", x)

        if self.spatial_output:
            b, c, h, w = x.shape
            emb = self.param("spatial_embeddings", nn.initializers.normal(1.0), (h * w, 64))
            spatial = emb.T.reshape(1, 64, h, w).astype(x.dtype)
            spatial = jnp.broadcast_to(spatial, (b, 64, h, w))
            return jnp.concatenate([x, spatial], axis=1)  # [B, C+64, h, w]

        flat = x.reshape(x.shape[0], -1).astype(jnp.float32)
        y = nn.Dense(self.output_size, name="visual_fc")(flat)
        return nn.relu(y)


class TorchVisionResNetEncoder(nn.Module):
    """ImageNet ResNet over RGB, frozen eval-mode BatchNorm
    (reference resnet_encoders.py:118-229). normalize=False by default:
    inputs only scaled to [0, 1] (reference:182-192)."""

    version: str = "resnet50"
    output_size: int = 256
    normalize_visual_inputs: bool = False
    spatial_output: bool = False
    trainable: bool = False
    # reference quirk (resnet_encoders.py:160-162): with
    # single_spatial_filter=False the original global avgpool is kept and the
    # 4x4 adaptive pool then just broadcasts the pooled vector spatially
    single_spatial_filter: bool = True
    # rematerialize the CNN in the backward pass (see VlnResnetDepthEncoder)
    remat: bool = False
    compute_dtype: Dtype = jnp.float32

    @property
    def resnet_layer_size(self) -> int:
        return 2048 if self.version == "resnet50" else 512

    @property
    def output_shape(self):
        if self.spatial_output:
            return (self.resnet_layer_size + 64, 4, 4)
        return (self.output_size,)

    @nn.compact
    def __call__(self, observations):
        if "rgb_features" in observations:
            x = observations["rgb_features"]  # [B, C, h, w]
        else:
            rgb = observations["rgb"].astype(self.compute_dtype) / 255.0  # [B, H, W, 3]
            if self.normalize_visual_inputs:
                mean = jnp.asarray([0.485, 0.456, 0.406], self.compute_dtype)
                std = jnp.asarray([0.229, 0.224, 0.225], self.compute_dtype)
                rgb = (rgb - mean) / std
            cnn_cls = nn.remat(TVResNet) if self.remat else TVResNet
            feats = cnn_cls(version=self.version, dtype=self.compute_dtype, name="cnn")(rgb)
            if not self.trainable:
                feats = jax.lax.stop_gradient(feats)
            if self.spatial_output:
                if self.single_spatial_filter:
                    feats = adaptive_avg_pool(feats, (4, 4))
                else:
                    pooled = jnp.mean(feats, axis=(1, 2), keepdims=True)
                    feats = jnp.broadcast_to(pooled, (pooled.shape[0], 4, 4, pooled.shape[3]))
            else:
                feats = jnp.mean(feats, axis=(1, 2), keepdims=True)  # global avgpool
            x = feats.transpose(0, 3, 1, 2)  # [B, C, h, w]
            self.sow("intermediates", "cached_features", x)

        if self.spatial_output:
            b, c, h, w = x.shape
            emb = self.param("spatial_embeddings", nn.initializers.normal(1.0), (h * w, 64))
            spatial = jnp.broadcast_to(emb.T.reshape(1, 64, h, w).astype(x.dtype), (b, 64, h, w))
            return jnp.concatenate([x, spatial], axis=1)

        flat = x.reshape(x.shape[0], -1).astype(jnp.float32)
        y = nn.Dense(self.output_size, name="fc")(flat)
        return nn.relu(y)


def TorchVisionResNet50(**kw):
    return TorchVisionResNetEncoder(version="resnet50", **kw)


def TorchVisionResNet18(**kw):
    return TorchVisionResNetEncoder(version="resnet18", **kw)
