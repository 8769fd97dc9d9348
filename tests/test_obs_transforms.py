import numpy as np
import pytest
from gymnasium import spaces

import jax.numpy as jnp

from vlnce_tpu.config import get_config
from vlnce_tpu.ops.obs_transforms import (
    CenterCropperPerSensor,
    ObsStack,
    ResizeShortestEdge,
    apply_obs_transforms_batch,
    apply_obs_transforms_obs_space,
    get_active_obs_transforms,
)


def test_center_crop():
    t = CenterCropperPerSensor([("rgb", (4, 4)), ("depth", (6, 6))])
    batch = {"rgb": jnp.arange(2 * 8 * 8 * 3).reshape(2, 8, 8, 3), "depth": jnp.ones((2, 8, 8, 1))}
    out = t(batch)
    assert out["rgb"].shape == (2, 4, 4, 3)
    assert out["depth"].shape == (2, 6, 6, 1)
    # center crop: rows 2..5
    np.testing.assert_array_equal(np.asarray(out["rgb"][0, 0, 0]), np.asarray(batch["rgb"][0, 2, 2]))

    space = spaces.Dict({"rgb": spaces.Box(0, 255, (8, 8, 3), np.uint8)})
    new_space = t.transform_observation_space(space)
    assert new_space["rgb"].shape == (4, 4, 3)


def test_obs_stack():
    t = ObsStack([("rgb", ["rgb", "rgb_1", "rgb_2"])])
    batch = {f: jnp.full((2, 4, 4, 3), i) for i, f in enumerate(["rgb", "rgb_1", "rgb_2"])}
    out = t(batch)
    assert out["rgb"].shape == (2, 3, 4, 4, 3)
    assert float(out["rgb"][0, 2, 0, 0, 0]) == 2.0
    space = spaces.Dict({f: spaces.Box(0, 255, (4, 4, 3), np.uint8) for f in ["rgb", "rgb_1", "rgb_2"]})
    new_space = t.transform_observation_space(space)
    assert new_space["rgb"].shape == (3, 4, 4, 3)
    assert "rgb_1" not in new_space.spaces


def test_resize_shortest_edge():
    t = ResizeShortestEdge(8)
    batch = {"rgb": jnp.zeros((2, 12, 16, 3), jnp.uint8)}
    out = t(batch)
    assert out["rgb"].shape == (2, 8, 10, 3)
    assert out["rgb"].dtype == jnp.uint8


def test_get_active_from_config():
    cfg = get_config(opts=["RL.POLICY.OBS_TRANSFORMS.ENABLED_TRANSFORMS", "[ObsStack, CenterCropperPerSensor]"])
    transforms = get_active_obs_transforms(cfg)
    assert len(transforms) == 2
    assert isinstance(transforms[0], ObsStack)
