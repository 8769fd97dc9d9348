"""Pallas-fused observation preprocessing.

The north-star hot path (BASELINE.json): RGB-D resize/crop/normalize fused
into one kernel. Bilinear resize is expressed as two small matmuls —
out = R_h @ img @ R_w^T with precomputed interpolation matrices — which maps
straight onto the MXU; the uint8 -> float conversion, 1/255 scaling,
mean/std normalization, and bfloat16 output write all fuse into the same
VMEM pass, so each image is read from HBM exactly once and written once at
half width.

Falls back to interpreter mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] interpolation weights matching jax.image bilinear
    (half-pixel centers)."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    R = np.zeros((out_size, in_size), np.float32)
    scale = in_size / out_size
    for o in range(out_size):
        src = (o + 0.5) * scale - 0.5
        src = min(max(src, 0.0), in_size - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        R[o, lo] += 1.0 - w
        R[o, hi] += w
    return R


def _preprocess_kernel(img_ref, rh_ref, rw_ref, scale_ref, bias_ref, out_ref, *, out_dtype):
    """img: [H, W, C]; rh: [out_h, H]; rw: [out_w, W]; scale/bias: [1, C]
    (channel affine folding 1/255 and mean/std); out: [out_h, out_w, C]."""
    img = img_ref[:]  # [H, W] one channel of one image
    if img.dtype == jnp.uint8:
        # Mosaic can't cast u8 -> f32 directly; hop through int32
        img = img.astype(jnp.int32)
    img = img.astype(jnp.float32)
    tmp = jnp.dot(rh_ref[:], img, preferred_element_type=jnp.float32)  # [out_h, W]
    out = jax.lax.dot_general(
        tmp, rw_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [out_h, out_w]
    i = pl.program_id(0)
    out_ref[:] = (out * scale_ref[0, i] + bias_ref[0, i]).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_hw", "normalize", "out_dtype", "interpret", "scale_values"),
)
def fused_resize_normalize(
    images: jnp.ndarray,
    out_hw: Tuple[int, int],
    normalize: bool = False,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    scale_values: bool = True,
) -> jnp.ndarray:
    """images: [B, H, W, C] uint8 (RGB) or float (depth) ->
    [B, out_h, out_w, C] out_dtype, scaled to [0, 1] (unless
    scale_values=False: resize-only, original value range), optionally
    ImageNet-normalized. One pallas program per image."""
    B, H, W, C = images.shape
    out_h, out_w = out_hw
    rh = jnp.asarray(_bilinear_matrix(H, out_h))
    rw = jnp.asarray(_bilinear_matrix(W, out_w))

    value_scale = 1.0 / 255.0 if images.dtype == jnp.uint8 and scale_values else 1.0
    if normalize:
        mean = np.array([0.485, 0.456, 0.406][:C], np.float32)
        std = np.array([0.229, 0.224, 0.225][:C], np.float32)
        scale_vec = value_scale / std
        bias_vec = -mean / std
    else:
        scale_vec = np.full((C,), value_scale, np.float32)
        bias_vec = np.zeros((C,), np.float32)

    # channels move to a leading axis first (cheap u8 transpose, fused by
    # XLA) so every pallas program sees a clean 2D [H, W] tile — a trailing
    # C=3 dim would lane-pad 43x in VMEM, and the minor dim cannot be
    # squeezed/strided by the TPU DMA
    planes = jnp.moveaxis(images, -1, 1).reshape(B * C, H, W)
    kernel = functools.partial(_preprocess_kernel, out_dtype=out_dtype)
    out_planes = pl.pallas_call(
        kernel,
        grid=(B * C,),
        in_specs=[
            pl.BlockSpec((None, H, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((out_h, H), lambda i: (0, 0)),
            pl.BlockSpec((out_w, W), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, out_h, out_w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * C, out_h, out_w), out_dtype),
        interpret=interpret,
    )(
        planes, rh, rw,
        jnp.asarray(np.tile(scale_vec, B))[None],  # per-plane affine, plain (0, i) indexing
        jnp.asarray(np.tile(bias_vec, B))[None],
    )
    return jnp.moveaxis(out_planes.reshape(B, C, out_h, out_w), 1, -1)


def preprocess_rgbd(
    rgb: Optional[jnp.ndarray],
    depth: Optional[jnp.ndarray],
    rgb_hw: Tuple[int, int],
    depth_hw: Tuple[int, int],
    normalize_rgb: bool = False,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
):
    """Convenience wrapper for the standard VLN-CE obs preprocessing pair."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    out = {}
    if rgb is not None:
        out["rgb"] = fused_resize_normalize(rgb, rgb_hw, normalize_rgb, out_dtype, interpret)
    if depth is not None:
        out["depth"] = fused_resize_normalize(depth, depth_hw, False, out_dtype, interpret)
    return out
