"""Video/observability frames (host-side, off the hot path).

Covers reference habitat_extensions/utils.py:27-680: composited frames from
RGB + depth + top-down map, instruction text overlay, and disk/TensorBoard
video output.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


def _depth_to_rgb(depth: np.ndarray) -> np.ndarray:
    d = np.clip(np.asarray(depth).squeeze(-1) if depth.ndim == 3 else depth, 0, 1)
    return (np.stack([d, d, d], axis=-1) * 255).astype(np.uint8)


def observations_to_image(observation: Dict, info: Dict, frame_height: int = 224) -> np.ndarray:
    """Compose rgb | depth | top-down-map into one frame
    (reference utils.py:27-109)."""
    import cv2

    panels: List[np.ndarray] = []
    if "rgb" in observation:
        rgb = np.asarray(observation["rgb"])
        if rgb.ndim == 4:  # pano [12, H, W, 3]: tile the front 4 frames
            rgb = np.concatenate([rgb[i] for i in (0, 3, 6, 9)], axis=1)
        panels.append(rgb.astype(np.uint8))
    if "depth" in observation:
        d = np.asarray(observation["depth"])
        if d.ndim == 4:
            d = d[0]
        panels.append(_depth_to_rgb(d))
    if "top_down_map_vlnce" in (info or {}):
        from vlnce_tpu.utils.maps import colorize_topdown_metric

        panels.append(colorize_topdown_metric(info["top_down_map_vlnce"]))

    if not panels:
        return np.zeros((frame_height, frame_height, 3), np.uint8)
    scaled = []
    for p in panels:
        scale = frame_height / p.shape[0]
        scaled.append(cv2.resize(p, (max(1, int(p.shape[1] * scale)), frame_height)))
    return np.concatenate(scaled, axis=1)


def pano_observations_to_image(observation: Dict, info: Dict, tile_height: int = 112) -> np.ndarray:
    """All pano frames tiled in one strip (+ depth strip + map); reference
    utils.py:112-214."""
    import cv2

    rgb = np.asarray(observation["rgb"])  # [P, H, W, 3]
    depth = np.asarray(observation.get("depth")) if "depth" in observation else None
    P = rgb.shape[0]
    scale = tile_height / rgb.shape[1]
    tiles = [cv2.resize(rgb[i], (int(rgb.shape[2] * scale), tile_height)) for i in range(P)]
    strip = np.concatenate(tiles, axis=1)
    rows = [strip]
    if depth is not None:
        d_tiles = [
            cv2.resize(_depth_to_rgb(depth[i]), (tiles[0].shape[1], tile_height)) for i in range(P)
        ]
        rows.append(np.concatenate(d_tiles, axis=1))
    frame = np.concatenate(rows, axis=0)
    if "top_down_map_vlnce" in (info or {}):
        from vlnce_tpu.utils.maps import colorize_topdown_metric

        m = colorize_topdown_metric(info["top_down_map_vlnce"])
        mh = frame.shape[0]
        m = cv2.resize(m, (int(m.shape[1] * mh / m.shape[0]), mh))
        frame = np.concatenate([frame, m], axis=1)
    return frame


def waypoint_observations_to_image(
    observation: Dict,
    info: Dict,
    pano: Optional[int] = None,
    agent_position=None,
    agent_heading: Optional[float] = None,
    r: Optional[float] = None,
    theta: Optional[float] = None,
    tile_height: int = 112,
) -> np.ndarray:
    """Pano strip with the selected pano highlighted and the predicted
    waypoint drawn on the map (reference utils.py:380-543)."""
    import cv2

    frame = pano_observations_to_image(observation, {}, tile_height=tile_height)
    rgb = np.asarray(observation["rgb"])
    P = rgb.shape[0]
    tile_w = frame.shape[1] // P if P else frame.shape[1]
    if pano is not None and P:
        x0 = int(pano) * tile_w
        cv2.rectangle(frame, (x0, 0), (x0 + tile_w - 1, tile_height - 1), (255, 140, 0), 3)
    if "top_down_map_vlnce" in (info or {}):
        from vlnce_tpu.utils import maps as map_utils
        from vlnce_tpu.tasks.geometry import rtheta_to_global_coordinates

        metric = info["top_down_map_vlnce"]
        if agent_position is None and r is not None and "agent_map_coord" in metric:
            # reconstruct the agent's world pose from the map metric so eval
            # loops don't need to thread sim state through
            mr, mc = metric["agent_map_coord"]
            mpp = metric["meters_per_px"]
            agent_position = [mc * mpp, 0.0, mr * mpp]
            agent_heading = metric["agent_angle"] if agent_heading is None else agent_heading
        if agent_position is not None and r is not None and theta is not None:
            # draw the prediction on a copy of the index map so the yellow
            # triangle only lives in this frame (reference maps.py:256-262)
            metric = dict(metric, map=np.array(metric["map"]))
            target = rtheta_to_global_coordinates(agent_position, agent_heading or 0.0, r, theta, dimensionality=3)
            map_utils.draw_waypoint_prediction(
                metric["map"], target, metric["meters_per_px"], metric["world_size"]
            )
        m = map_utils.colorize_topdown_metric(metric)
        mh = frame.shape[0]
        m = cv2.resize(m, (int(m.shape[1] * mh / m.shape[0]), mh))
        frame = np.concatenate([frame, m], axis=1)
    return frame


def navigator_video_frame(observation: Dict, info: Dict, instruction_text: str = "", plan_step: str = "") -> np.ndarray:
    """Frame for the discretized-navigator eval video (reference
    utils.py:546-637): first-person view + map + instruction + plan state."""
    frame = observations_to_image(observation, info)
    text = instruction_text
    if plan_step:
        text = f"[{plan_step}] {text}"
    return append_text_to_image(frame, text)


def append_text_to_image(image: np.ndarray, text: str, font_size: float = 0.5) -> np.ndarray:
    """Underlay of wrapped instruction text (reference utils.py:217-280)."""
    import cv2

    h, w = image.shape[:2]
    font = cv2.FONT_HERSHEY_SIMPLEX
    words = (text or "").split()
    lines, cur = [], ""
    for word in words:
        test = (cur + " " + word).strip()
        if cv2.getTextSize(test, font, font_size, 1)[0][0] > w - 10:
            lines.append(cur)
            cur = word
        else:
            cur = test
    lines.append(cur)
    line_h = int(cv2.getTextSize("Ag", font, font_size, 1)[0][1] * 1.6)
    banner = np.zeros((line_h * len(lines) + 10, w, 3), np.uint8)
    for i, line in enumerate(lines):
        cv2.putText(banner, line, (5, (i + 1) * line_h), font, font_size, (255, 255, 255), 1)
    return np.concatenate([image, banner], axis=0)


def images_to_video(images: List[np.ndarray], output_dir: str, video_name: str, fps: int = 10) -> str:
    import cv2

    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"{video_name}.mp4")
    h, w = images[0].shape[:2]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for frame in images:
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()
    return path


def generate_video(
    video_option: List[str],
    video_dir: Optional[str],
    images: List[np.ndarray],
    episode_id: str,
    checkpoint_idx: int,
    metrics: Dict[str, float],
    tb_writer=None,
    fps: int = 10,
) -> None:
    """Write frames to disk and/or TensorBoard (reference utils.py:640-680)."""
    if len(images) < 1:
        return
    metric_strs = [f"{k}={v:.2f}" for k, v in metrics.items()]
    video_name = f"episode={episode_id}-ckpt={checkpoint_idx}-" + "-".join(metric_strs)
    if "disk" in video_option and video_dir is not None:
        images_to_video(images, video_dir, video_name, fps=fps)
    if "tensorboard" in video_option and tb_writer is not None:
        tb_writer.add_video_from_np_images(f"episode{episode_id}", checkpoint_idx, images, fps=fps)
