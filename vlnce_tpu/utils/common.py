"""Small glue utilities (reference vlnce_baselines/common/utils.py:6-42)."""

from __future__ import annotations

from typing import Dict, List

import numpy as np
from gymnasium import spaces


def extract_instruction_tokens(
    observations: List[Dict], instruction_sensor_uuid: str, tokens_uuid: str = "tokens"
) -> List[Dict]:
    """Flatten {text, tokens} instruction observations to the token array.

    The reference's habitat InstructionSensor emits a dict; this framework's
    sensor already emits padded token arrays, so this is a passthrough that
    only unwraps dict-form observations (e.g. from a habitat backend)."""
    for obs in observations:
        v = obs.get(instruction_sensor_uuid)
        if isinstance(v, dict) and tokens_uuid in v:
            obs[instruction_sensor_uuid] = np.asarray(v[tokens_uuid])
    return observations


def single_frame_box_shape(box: spaces.Box) -> spaces.Box:
    """Strip the frame-stack axis from a Box space
    (reference common/utils.py:32-42)."""
    if len(box.shape) <= 3:
        return box
    return spaces.Box(
        low=box.low.min(), high=box.high.max(), shape=box.shape[1:], dtype=box.dtype
    )
