"""Visual backbones in flax (NHWC, TPU-native layouts).

Two architectures, matching the reference's encoders so real checkpoints
convert weight-for-weight (reference vlnce_baselines/models/encoders/
resnet_encoders.py:17-229):

- GNResNetEncoder: habitat-DDPPO-style ResNet (GroupNorm, baseplanes 32,
  7x7 stem, avg-pool-2 input stem, 3x3 compression head to a ~2048-flat
  spatial output). Used for depth; loads converted DDPPO PointGoal weights.
- TVResNet: torchvision-style ResNet50/18 with BatchNorm folded to affine
  (frozen eval-mode semantics: y = x*gamma/sqrt(var+eps) + (beta -
  mean*gamma/sqrt(var+eps))). Used for RGB with ImageNet weights.

Everything runs in a configurable compute dtype (bfloat16 by default on TPU)
with float32 params.
"""

from __future__ import annotations

import math
from typing import Any, Callable, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class FrozenBatchNorm(nn.Module):
    """Eval-mode BatchNorm as a learned affine over running stats."""

    features: int
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param("weight", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        inv = gamma * jax.lax.rsqrt(var + self.epsilon)
        # Fold the affine in f32 (it's tiny, per-channel), apply in compute
        # dtype so the big [B,H,W,C] elementwise pass stays bf16 on the VPU.
        scale = inv.astype(self.dtype)
        shift = (beta - mean * inv).astype(self.dtype)
        return x.astype(self.dtype) * scale + shift


# ---------------------------------------------------------------------------
# GroupNorm ResNet (habitat-DDPPO architecture)
# ---------------------------------------------------------------------------


class GNBasicBlock(nn.Module):
    planes: int
    ngroups: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        residual = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.GroupNorm(num_groups=self.ngroups, epsilon=1e-5, dtype=self.dtype, name="gn1")(y).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.GroupNorm(num_groups=self.ngroups, epsilon=1e-5, dtype=self.dtype, name="gn2")(y).astype(self.dtype)
        if self.downsample:
            residual = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2, use_bias=False, dtype=self.dtype, name="ds_conv")(x)
            residual = nn.GroupNorm(num_groups=self.ngroups, epsilon=1e-5, dtype=self.dtype, name="ds_gn")(residual).astype(self.dtype)
        return nn.relu(y + residual)


class GNBottleneck(nn.Module):
    planes: int
    ngroups: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.GroupNorm(num_groups=self.ngroups, epsilon=1e-5, dtype=self.dtype, name="gn1")(y).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.GroupNorm(num_groups=self.ngroups, epsilon=1e-5, dtype=self.dtype, name="gn2")(y).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = nn.GroupNorm(num_groups=self.ngroups, epsilon=1e-5, dtype=self.dtype, name="gn3")(y).astype(self.dtype)
        if self.downsample:
            residual = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2, use_bias=False, dtype=self.dtype, name="ds_conv")(x)
            residual = nn.GroupNorm(num_groups=self.ngroups, epsilon=1e-5, dtype=self.dtype, name="ds_gn")(residual).astype(self.dtype)
        return nn.relu(y + residual)


class GNResNet(nn.Module):
    """habitat_baselines.rl.ddppo.policy.resnet.ResNet equivalent."""

    base_planes: int = 32
    ngroups: int = 16
    layers: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"  # or "basic"
    dtype: Dtype = jnp.float32

    @property
    def expansion(self) -> int:
        return 4 if self.block == "bottleneck" else 1

    @nn.compact
    def __call__(self, x):
        block_cls = GNBottleneck if self.block == "bottleneck" else GNBasicBlock
        x = nn.Conv(self.base_planes, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.GroupNorm(num_groups=self.ngroups, epsilon=1e-5, dtype=self.dtype, name="stem_gn")(x).astype(self.dtype)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        inplanes = self.base_planes
        for layer_idx, (num_blocks, stride) in enumerate(zip(self.layers, (1, 2, 2, 2))):
            planes = self.base_planes * (2**layer_idx)
            for b in range(num_blocks):
                s = stride if b == 0 else 1
                need_ds = (s != 1) or (inplanes != planes * self.expansion)
                x = block_cls(
                    planes=planes, ngroups=self.ngroups, stride=s, downsample=need_ds,
                    dtype=self.dtype, name=f"layer{layer_idx + 1}_{b}",
                )(x)
                inplanes = planes * self.expansion
        return x


class GNResNetEncoder(nn.Module):
    """habitat ResNetEncoder equivalent: avg-pool-2 stem -> GNResNet ->
    3x3 compression conv (GroupNorm(1), ReLU) sized for a ~2048-element flat
    output (reference resnet_encoders.py:31-43 via habitat ResNetEncoder)."""

    input_hw: Tuple[int, int] = (256, 256)
    base_planes: int = 32
    ngroups: int = 16
    backbone: str = "resnet50"
    dtype: Dtype = jnp.float32

    def output_shape_chw(self) -> Tuple[int, int, int]:
        spatial = self.input_hw[0] // 2  # avg-pool stem
        final_spatial = max(1, int(spatial * (1.0 / 32.0)))
        num_c = int(round(2048 / (final_spatial**2)))
        return (num_c, final_spatial, final_spatial)

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, C] float -> [B, h, w, c_compressed] (NHWC)."""
        layers = {"resnet18": (2, 2, 2, 2), "resnet50": (3, 4, 6, 3)}[self.backbone]
        block = "basic" if self.backbone == "resnet18" else "bottleneck"
        x = avg_pool_2x2(x.astype(self.dtype))
        x = GNResNet(
            base_planes=self.base_planes, ngroups=self.ngroups, layers=layers, block=block,
            dtype=self.dtype, name="backbone",
        )(x)
        num_c, _, _ = self.output_shape_chw()
        x = nn.Conv(num_c, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="compression_conv")(x)
        x = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype, name="compression_gn")(x).astype(self.dtype)
        return nn.relu(x)


# ---------------------------------------------------------------------------
# torchvision-style ResNet (frozen BatchNorm)
# ---------------------------------------------------------------------------


class TVBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(out_ch, dtype=self.dtype, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2, use_bias=False, dtype=self.dtype, name="ds_conv")(x)
            residual = FrozenBatchNorm(out_ch, dtype=self.dtype, name="ds_bn")(residual)
        return nn.relu(y + residual)


class TVBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2")(y)
        if self.downsample:
            residual = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2, use_bias=False, dtype=self.dtype, name="ds_conv")(x)
            residual = FrozenBatchNorm(self.planes, dtype=self.dtype, name="ds_bn")(residual)
        return nn.relu(y + residual)


class TVResNet(nn.Module):
    """torchvision resnet18/50 trunk (through layer4, no pool/fc)."""

    version: str = "resnet50"
    dtype: Dtype = jnp.float32

    @property
    def feature_dim(self) -> int:
        return 2048 if self.version == "resnet50" else 512

    @nn.compact
    def __call__(self, x):
        layers = {"resnet18": (2, 2, 2, 2), "resnet50": (3, 4, 6, 3)}[self.version]
        block_cls = TVBasicBlock if self.version == "resnet18" else TVBottleneck
        expansion = block_cls.expansion
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=self.dtype, name="conv1")(x.astype(self.dtype))
        x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)
        inplanes = 64
        for layer_idx, (num_blocks, stride) in enumerate(zip(layers, (1, 2, 2, 2))):
            planes = 64 * (2**layer_idx)
            for b in range(num_blocks):
                s = stride if b == 0 else 1
                need_ds = (s != 1) or (inplanes != planes * expansion)
                x = block_cls(planes=planes, stride=s, downsample=need_ds, dtype=self.dtype, name=f"layer{layer_idx + 1}_{b}")(x)
                inplanes = planes * expansion
        return x


def adaptive_avg_pool(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """NHWC adaptive average pool matching torch's bin splitting."""
    B, H, W, C = x.shape
    oh, ow = out_hw

    def pool_axis(arr, in_size, out_size, axis):
        # torch bins: [floor(i*in/out), ceil((i+1)*in/out))
        pieces = []
        for i in range(out_size):
            lo = (i * in_size) // out_size
            hi = -(-((i + 1) * in_size) // out_size)
            pieces.append(jnp.mean(jax.lax.slice_in_dim(arr, lo, hi, axis=axis), axis=axis, keepdims=True))
        return jnp.concatenate(pieces, axis=axis)

    x = pool_axis(x, H, oh, 1)
    x = pool_axis(x, W, ow, 2)
    return x
