"""Fused preprocessing kernel parity (interpret mode on CPU)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vlnce_tpu.ops.pallas_preprocess import fused_resize_normalize


def torch_bilinear(x_u8, hw):
    t = torch.from_numpy(x_u8.astype(np.float32).transpose(0, 3, 1, 2)) / 255.0
    out = torch.nn.functional.interpolate(t, size=hw, mode="bilinear", align_corners=False)
    return out.numpy().transpose(0, 2, 3, 1)


def test_resize_matches_torch_bilinear():
    rng = np.random.RandomState(0)
    x = rng.randint(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    out = fused_resize_normalize(jnp.asarray(x), (48, 48), interpret=True, out_dtype=jnp.float32)
    ref = torch_bilinear(x, (48, 48))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_identity_size_is_exact_scale():
    rng = np.random.RandomState(1)
    x = rng.randint(0, 255, (1, 32, 32, 3), dtype=np.uint8)
    out = fused_resize_normalize(jnp.asarray(x), (32, 32), interpret=True, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), x.astype(np.float32) / 255.0, atol=1e-6)


def test_normalize_path():
    rng = np.random.RandomState(2)
    x = rng.randint(0, 255, (1, 32, 32, 3), dtype=np.uint8)
    out = fused_resize_normalize(jnp.asarray(x), (32, 32), normalize=True, interpret=True, out_dtype=jnp.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    ref = (x.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_float_depth_passthrough_scaling():
    rng = np.random.RandomState(3)
    d = rng.rand(2, 64, 64, 1).astype(np.float32)
    out = fused_resize_normalize(jnp.asarray(d), (32, 32), interpret=True, out_dtype=jnp.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(d.transpose(0, 3, 1, 2)), size=(32, 32), mode="bilinear", align_corners=False
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_bf16_output_dtype():
    x = np.zeros((1, 16, 16, 3), np.uint8)
    out = fused_resize_normalize(jnp.asarray(x), (8, 8), interpret=True)
    assert out.dtype == jnp.bfloat16


def test_resize_only_matches_einsum_path():
    """scale_values=False (the production resize_bilinear TPU path) must
    equal the einsum resize exactly."""
    import os

    from vlnce_tpu.ops import obs_transforms as ot

    rng = np.random.RandomState(3)
    x = rng.randint(0, 255, (2, 40, 40, 3), dtype=np.uint8)
    out = fused_resize_normalize(
        jnp.asarray(x), (24, 24), interpret=True, out_dtype=jnp.float32, scale_values=False
    )
    os.environ["VLNCE_TPU_DISABLE_PALLAS"] = "1"
    try:
        ref = ot.resize_bilinear(jnp.asarray(x).astype(jnp.float32), (24, 24))
    finally:
        del os.environ["VLNCE_TPU_DISABLE_PALLAS"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
