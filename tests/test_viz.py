"""Smoke tests for viz utilities (maps, video frames, nav graph)."""

import numpy as np

from vlnce_tpu.utils import maps, video
from vlnce_tpu.utils.nav_graph import synthetic_lattice_graph


def make_metric():
    img = np.full((128, 128), maps.MAP_VALID_POINT, np.uint8)
    img[:, :4] = maps.MAP_INVALID_POINT
    fog = np.zeros((64, 64), np.uint8)
    fog[:32] = 1
    return {
        "map": img,
        "fog_of_war_mask": fog,
        "agent_map_coord": (24, 24),
        "agent_angle": 0.5,
        "meters_per_px": 16.0 / 128,
        "world_size": 16.0,
        "step_count": 3,
        "bounds": {"lower": (0.0, 0.0), "upper": (16.0, 16.0)},
    }


def test_colorize_topdown_metric():
    out = maps.colorize_topdown_metric(make_metric())
    assert out.shape == (128, 128, 3)
    # palette applied: invalid -> white, valid (unrevealed fog) dimmed grey
    assert (out[10, 1] == [255, 255, 255]).all()
    # revealed valid region keeps the full grey, unrevealed is darker
    assert out[20, 64].mean() > out[100, 64].mean()


def test_indicator_palette_matches_reference():
    assert (maps.TOP_DOWN_MAP_COLORS[maps.MAP_WAYPOINT_PREDICTION] == [255, 255, 0]).all()
    assert (maps.TOP_DOWN_MAP_COLORS[maps.MAP_ORACLE_WAYPOINT] == [255, 165, 0]).all()
    assert (maps.TOP_DOWN_MAP_COLORS[maps.MAP_SHORTEST_PATH_WAYPOINT] == [0, 150, 0]).all()
    assert (maps.TOP_DOWN_MAP_COLORS[maps.MAP_MP3D_WAYPOINT] == [0, 200, 0]).all()
    # step-gradient tail uses the JET colormap
    assert not (maps.TOP_DOWN_MAP_COLORS[15] == maps.TOP_DOWN_MAP_COLORS[255]).all()


def test_waypoint_prediction_triangle():
    m = make_metric()
    maps.draw_waypoint_prediction(m["map"], [8.0, 0.0, 8.0], m["meters_per_px"], 16.0)
    assert (m["map"] == maps.MAP_WAYPOINT_PREDICTION).any()
    out = maps.colorize_topdown_metric(m)
    ys, xs = np.where((out == [255, 255, 0]).all(axis=2))
    assert len(ys) > 0  # yellow triangle rendered


def test_observations_to_image_and_text():
    obs = {"rgb": np.zeros((32, 32, 3), np.uint8), "depth": np.ones((32, 32, 1), np.float32)}
    frame = video.observations_to_image(obs, {"top_down_map_vlnce": make_metric()})
    assert frame.ndim == 3 and frame.shape[2] == 3
    framed = video.append_text_to_image(frame, "turn left and go to the door")
    assert framed.shape[0] > frame.shape[0]


def test_pano_and_waypoint_frames():
    obs = {
        "rgb": np.zeros((12, 16, 16, 3), np.uint8),
        "depth": np.ones((12, 16, 16, 1), np.float32),
    }
    f1 = video.pano_observations_to_image(obs, {})
    assert f1.shape[2] == 3
    f2 = video.waypoint_observations_to_image(
        obs, {"top_down_map_vlnce": make_metric()}, pano=3,
        agent_position=[3, 0, 3], agent_heading=0.4, r=1.5, theta=0.2,
    )
    assert f2.shape[2] == 3


def test_reveal_fog_of_war_occlusion():
    occ = np.zeros((64, 64), bool)
    occ[:, 32] = True  # wall at z=8m
    fog = np.zeros((64, 64), np.uint8)
    maps.reveal_fog_of_war(occ, fog, [4.0, 0.0, 4.0], heading=np.pi, fov_deg=90, visibility_dist=10.0)
    # heading pi faces +z: cells just past the wall must stay hidden
    assert fog[16, 20] == 1  # before wall, revealed
    assert fog[16, 40] == 0  # behind wall, occluded


def test_aux_losses_shim():
    import jax.numpy as jnp

    from vlnce_tpu.models.aux_losses import AuxLosses

    AuxLosses.clear()
    AuxLosses.activate()
    assert AuxLosses.is_active()
    AuxLosses.register_loss("p", jnp.asarray([1.0, 2.0, 3.0]), alpha=0.5)
    out = AuxLosses.reduce(jnp.asarray([1.0, 1.0, 0.0]))
    assert abs(float(out) - 0.5 * (1.0 + 2.0) / 2.0) < 1e-6
    AuxLosses.deactivate()
    assert not AuxLosses.is_active()


def test_nearest_node_tracking_follows_edges():
    """update_nearest_node moves at most one graph edge per call and tracks
    the agent (reference maps.py:298-318)."""
    from vlnce_tpu.utils.nav_graph import get_nearest_node, update_nearest_node

    g = synthetic_lattice_graph(world_size=16.0, spacing=2.0)
    node = get_nearest_node(g, (1.2, 1.1))
    assert node == (1.0, 1.0)
    # agent jumps 2 lattice cells away: a single update may only move to a
    # NEIGHBOR of the current node, not teleport to the global nearest
    far = (5.0, 1.0)
    stepped = update_nearest_node(g, node, far)
    assert stepped == (3.0, 1.0)  # one hop toward the agent
    # a second update converges
    assert update_nearest_node(g, stepped, far) == (5.0, 1.0)
    # staying put keeps the node
    assert update_nearest_node(g, (5.0, 1.0), (5.2, 1.2)) == (5.0, 1.0)


def test_topdown_map_measure_end_to_end():
    """The measure paints the indicator map: trail gradient, source/target,
    shortest path, and the metric dict renders."""
    import vlnce_tpu.envs  # noqa: F401
    import vlnce_tpu.tasks  # noqa: F401
    from vlnce_tpu.envs.env import Env
    from vlnce_tpu.tasks.config.default import get_default_task_config

    cfg = get_default_task_config().defrost()
    cfg.DATASET.TYPE = "Synthetic-VLN-v0"
    cfg.TASK.SENSORS = ["INSTRUCTION_SENSOR", "SHORTEST_PATH_SENSOR"]
    cfg.TASK.MEASUREMENTS = ["DISTANCE_TO_GOAL", "SUCCESS", "SPL", "TOP_DOWN_MAP_VLNCE"]
    cfg.TASK.TOP_DOWN_MAP_VLNCE.MAP_RESOLUTION = 256
    cfg.TASK.TOP_DOWN_MAP_VLNCE.GRAPHS_FILE = "/nonexistent.pkl"  # synthetic fallback
    for s in ("RGB_SENSOR", "DEPTH_SENSOR"):
        getattr(cfg.SIMULATOR, s).HEIGHT = 16
        getattr(cfg.SIMULATOR, s).WIDTH = 16
    env = Env(cfg)
    obs = env.reset()
    for _ in range(8):
        if env.episode_over:
            break
        obs = env.step(int(obs["shortest_path_sensor"][0]))
    metric = env.get_metrics()["top_down_map_vlnce"]
    m = metric["map"]
    assert m.dtype == np.uint8 and m.ndim == 2
    assert (m == maps.MAP_SOURCE_POINT_INDICATOR).any()
    assert (m == maps.MAP_TARGET_POINT_INDICATOR).any()
    assert (m == maps.MAP_SHORTEST_PATH_WAYPOINT).any()
    assert (m >= 15).any()  # agent trail gradient painted
    frame = maps.colorize_topdown_metric(metric)
    assert frame.shape == (256, 256, 3)
    env.close()


def test_waypoint_frame_full_overlays():
    """Full waypoint debug composition (reference utils.py:380-543):
    per-pano probability row + stop gauge + step-stats band + instruction
    panel each add their strip to the frame, and the oracle waypoint draws
    without clobbering the shared map."""
    obs = {
        "rgb": np.zeros((12, 16, 16, 3), np.uint8),
        "depth": np.ones((12, 16, 16, 1), np.float32),
    }
    metric = make_metric()
    base_map = np.array(metric["map"])
    probs = np.full((13,), 1 / 13.0, np.float32)
    kwargs = dict(
        pano=3, agent_position=[3, 0, 3], agent_heading=0.4, r=1.5, theta=0.2,
    )
    plain = video.waypoint_observations_to_image(
        obs, {"top_down_map_vlnce": metric}, **kwargs
    )
    rich = video.waypoint_observations_to_image(
        obs, {"top_down_map_vlnce": metric},
        pano_distribution=probs,
        offset=0.12, offset_mode=0.10, distance=1.5, distance_mode=1.4,
        oracle_r=2.0, oracle_theta=1.0,
        instruction_text="walk straight down the hallway and stop at the door",
        **kwargs,
    )
    # annotation rows (pano ids + probs + stop gauge + stats) add height;
    # the instruction panel adds width
    assert rich.shape[0] > plain.shape[0]
    assert rich.shape[1] > plain.shape[1]
    assert rich.dtype == np.uint8 and rich.shape[2] == 3
    # the caller's metric map must be untouched (frames draw on copies)
    np.testing.assert_array_equal(np.array(metric["map"]), base_map)


def test_waypoint_frame_prob_row_without_map():
    """The annotation rows compose without a top-down map too (the rgb-only
    branch of the reference compositor)."""
    obs = {"rgb": np.zeros((12, 16, 16, 3), np.uint8)}
    probs = np.zeros((13,), np.float32)
    probs[-1] = 1.0  # STOP selected -> bold stop gauge, pano=None
    f = video.waypoint_observations_to_image(
        obs, {}, pano=None, pano_distribution=probs, distance=0.5,
    )
    assert f.ndim == 3 and f.shape[2] == 3
    # the instruction panel composes even without a map (the pre-overlay
    # path appended instruction text unconditionally)
    f_instr = video.waypoint_observations_to_image(
        obs, {}, pano=None, pano_distribution=probs, distance=0.5,
        instruction_text="turn left at the sofa",
    )
    assert f_instr.shape[1] > f.shape[1]
    assert f_instr.shape[0] == f.shape[0]


def test_navigator_video_frame_composition():
    """navigator_video_frame (reference utils.py:546-637): pano strip +
    map-with-waypoint-prediction + instruction panel; the prediction is drawn
    from the step's START pose."""
    obs = {
        "rgb": np.random.randint(0, 255, (12, 24, 32, 3), np.uint8),
        "instruction": {"text": "walk past the sofa and stop at the door"},
    }
    info = {"top_down_map_vlnce": make_metric()}
    action = {"action": "GO_TOWARD_POINT", "action_args": {"r": 2.0, "theta": 0.0}}

    plain = video.navigator_video_frame(obs, info, frame_width=256)
    with_wp = video.navigator_video_frame(
        obs, info, start_pos=[8.0, 0.0, 8.0], start_heading=0.0,
        action=action, frame_width=256,
    )
    assert plain.dtype == np.uint8 and plain.shape[1] == 256
    assert with_wp.shape == plain.shape
    # the waypoint triangle (yellow) only appears when action+pose are given
    yellow = lambda f: ((f == [255, 255, 0]).all(axis=2)).sum()
    assert yellow(with_wp) > yellow(plain)
    # quaternion start_heading accepted too ([x,y,z,w] identity, heading 0)
    with_quat = video.navigator_video_frame(
        obs, info, start_pos=[8.0, 0.0, 8.0],
        start_heading=np.array([0.0, 0.0, 0.0, 1.0]), action=action,
        frame_width=256,
    )
    assert yellow(with_quat) > yellow(plain)
    # single-frame rgb + no map still composes
    small = video.navigator_video_frame(
        {"rgb": np.zeros((24, 32, 3), np.uint8), "instruction": "go"}, {},
        frame_width=128,
    )
    assert small.shape[1] == 128
    # non-dict actions (int/str discrete forms Env.step accepts) must not
    # crash the recorder, and token-array instruction obs use the explicit
    # instruction_text override for the panel
    tok_obs = dict(obs, instruction=np.zeros((200,), np.int32))
    f_int = video.navigator_video_frame(
        tok_obs, info, start_pos=[8.0, 0.0, 8.0], start_heading=0.0,
        action=0, frame_width=256, instruction_text="turn left at the lamp",
    )
    f_blank = video.navigator_video_frame(
        tok_obs, info, start_pos=[8.0, 0.0, 8.0], start_heading=0.0,
        action=0, frame_width=256,
    )
    assert f_int.shape == f_blank.shape
    # the override renders ink on the panel; the token-array fallback is blank
    assert (f_int != f_blank).any()
    # single-camera frames are not seam-cropped: the tile keeps full width
    # (pano tiles lose 2*W//8; a lone 32px frame must contribute all 32 cols)
    assert video.navigator_video_frame(
        {"rgb": np.full((24, 32, 3), 7, np.uint8)}, {}, frame_width=32,
    ).shape[1] == 32
