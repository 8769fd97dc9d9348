"""Observation transformers (device-side, jit-compatible).

Parity with reference habitat_extensions/obs_transformers.py:21-145 plus
habitat's ResizeShortestEdge: per-sensor center crops, pano frame stacking
(rgb, rgb_1..rgb_11 -> one [B, 12, H, W, C] tensor), and shortest-edge
resize. All transforms take/return the batched obs dict; they run inside the
jitted step on TPU (fused by XLA with the encoder preamble) rather than as a
separate torch pass.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import os

import jax
import jax.numpy as jnp
from gymnasium import spaces

from vlnce_tpu.registry import registry


class ObservationTransformer:
    def transform_observation_space(self, observation_space: spaces.Dict) -> spaces.Dict:
        return observation_space

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    @classmethod
    def from_config(cls, config):
        raise NotImplementedError


def center_crop(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """x: [..., H, W, C] -> center crop to hw."""
    H, W = x.shape[-3], x.shape[-2]
    th, tw = hw
    top = max(0, (H - th) // 2)
    left = max(0, (W - tw) // 2)
    return x[..., top : top + th, left : left + tw, :]


def _pallas_resize_enabled() -> bool:
    """The fused pallas resize is the production path on TPU backends; the
    einsum path (numerically identical, XLA-fused) serves CPU/tests and the
    VLNCE_TPU_DISABLE_PALLAS=1 escape hatch."""
    if os.environ.get("VLNCE_TPU_DISABLE_PALLAS") == "1":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing never fatal
        return False


def resize_bilinear(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """[..., H, W, C] bilinear resize (device-side).

    Uses 2-tap interpolation matrices matching cv2/torch bilinear semantics —
    NOT jax.image.resize, whose antialiased downscale differs numerically
    from the reference's cv2-based transforms. On TPU the resize runs as the
    fused pallas kernel (ops/pallas_preprocess.py: one HBM read per image,
    both contractions on the MXU); elsewhere as einsums XLA fuses the same
    way.
    """
    from vlnce_tpu.ops.pallas_preprocess import _bilinear_matrix, fused_resize_normalize

    H, W = x.shape[-3], x.shape[-2]
    orig_dtype = x.dtype
    if x.ndim >= 4 and _pallas_resize_enabled():
        lead = x.shape[:-3]
        flat = x.reshape((-1,) + x.shape[-3:])
        y = fused_resize_normalize(
            flat, tuple(hw), normalize=False, out_dtype=jnp.float32, scale_values=False
        )
        y = y.reshape(lead + y.shape[1:])
    else:
        rh = jnp.asarray(_bilinear_matrix(H, hw[0]))
        rw = jnp.asarray(_bilinear_matrix(W, hw[1]))
        y = jnp.einsum("oh,...hwc->...owc", rh, x.astype(jnp.float32))
        y = jnp.einsum("pw,...owc->...opc", rw, y)
    if jnp.issubdtype(orig_dtype, jnp.integer):
        y = jnp.clip(jnp.round(y), 0, 255).astype(orig_dtype)
    return y


@registry.register_obs_transformer(name="CenterCropperPerSensor")
class CenterCropperPerSensor(ObservationTransformer):
    """reference obs_transformers.py:21-86."""

    def __init__(self, sensor_crops: List[Tuple[str, Tuple[int, int]]]):
        self.sensor_crops = {k: tuple(v) for k, v in sensor_crops}

    def transform_observation_space(self, observation_space: spaces.Dict) -> spaces.Dict:
        out = dict(observation_space.spaces)
        for key, hw in self.sensor_crops.items():
            if key in out and tuple(out[key].shape[-3:-1]) != hw:
                s = out[key]
                new_shape = s.shape[:-3] + (hw[0], hw[1], s.shape[-1])
                out[key] = spaces.Box(
                    low=s.low.min(), high=s.high.max(), shape=new_shape, dtype=s.dtype
                )
        return spaces.Dict(out)

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = dict(batch)
        for key, hw in self.sensor_crops.items():
            if key in out and tuple(out[key].shape[-3:-1]) != hw:
                x = out[key]
                if x.shape[-3] < hw[0] or x.shape[-2] < hw[1]:
                    x = resize_bilinear(x, hw)  # upscale-then-crop degenerate case
                out[key] = center_crop(x, hw)
        return out

    @classmethod
    def from_config(cls, config):
        return cls(config.RL.POLICY.OBS_TRANSFORMS.CENTER_CROPPER_PER_SENSOR.SENSOR_CROPS)


@registry.register_obs_transformer(name="ObsStack")
class ObsStack(ObservationTransformer):
    """Stack sensor rewrites (rgb, rgb_1, ...) into one leading frame axis
    (reference obs_transformers.py:89-145)."""

    def __init__(self, sensor_rewrites: List[Tuple[str, List[str]]]):
        self.rewrite_dict = {target: list(srcs) for target, srcs in sensor_rewrites}

    def transform_observation_space(self, observation_space: spaces.Dict) -> spaces.Dict:
        out = dict(observation_space.spaces)
        for target, srcs in self.rewrite_dict.items():
            if not all(s in out for s in srcs):
                continue
            first = out[srcs[0]]
            for s in srcs:
                out.pop(s, None)
            out[target] = spaces.Box(
                low=first.low.min(), high=first.high.max(),
                shape=(len(srcs),) + tuple(first.shape), dtype=first.dtype,
            )
        return spaces.Dict(out)

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = dict(batch)
        for target, srcs in self.rewrite_dict.items():
            if not all(s in out for s in srcs):
                continue
            frames = [out.pop(s) for s in srcs]
            out[target] = jnp.stack(frames, axis=1)  # [B, F, H, W, C]
        return out

    @classmethod
    def from_config(cls, config):
        return cls(config.RL.POLICY.OBS_TRANSFORMS.OBS_STACK.SENSOR_REWRITES)


@registry.register_obs_transformer(name="ResizeShortestEdge")
class ResizeShortestEdge(ObservationTransformer):
    """habitat's shortest-edge resize (used by the RxR configs)."""

    def __init__(self, size: int, trans_keys=("rgb", "depth", "semantic")):
        self.size = int(size)
        self.trans_keys = trans_keys

    def _target_hw(self, h: int, w: int) -> Tuple[int, int]:
        scale = self.size / min(h, w)
        return (int(h * scale), int(w * scale))

    def transform_observation_space(self, observation_space: spaces.Dict) -> spaces.Dict:
        out = dict(observation_space.spaces)
        for key in self.trans_keys:
            if key in out:
                s = out[key]
                th, tw = self._target_hw(s.shape[-3], s.shape[-2])
                if (th, tw) != tuple(s.shape[-3:-1]):
                    out[key] = spaces.Box(
                        low=s.low.min(), high=s.high.max(),
                        shape=s.shape[:-3] + (th, tw, s.shape[-1]), dtype=s.dtype,
                    )
        return spaces.Dict(out)

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = dict(batch)
        for key in self.trans_keys:
            if key in out:
                h, w = out[key].shape[-3], out[key].shape[-2]
                th, tw = self._target_hw(h, w)
                if (th, tw) != (h, w):
                    out[key] = resize_bilinear(out[key], (th, tw))
        return out

    @classmethod
    def from_config(cls, config):
        return cls(config.RL.POLICY.OBS_TRANSFORMS.RESIZE_SHORTEST_EDGE.SIZE)


def get_active_obs_transforms(config) -> List[ObservationTransformer]:
    out = []
    for name in config.RL.POLICY.OBS_TRANSFORMS.ENABLED_TRANSFORMS:
        cls = registry.get_obs_transformer(name)
        out.append(cls.from_config(config))
    return out


def apply_obs_transforms_batch(batch: Dict[str, jnp.ndarray], transforms) -> Dict[str, jnp.ndarray]:
    for t in transforms:
        batch = t(batch)
    return batch


def apply_obs_transforms_obs_space(observation_space: spaces.Dict, transforms) -> spaces.Dict:
    for t in transforms:
        observation_space = t.transform_observation_space(observation_space)
    return observation_space
