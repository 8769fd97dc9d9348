"""Device-resident grid world: parity with the host GridWorldSim, and the
on-device scan-eval path end-to-end.

Parity strategy: the device sim must reproduce the host sim's dynamics and
rendering (float32 vs float64 rounding aside), and the scan-eval's metric
replay must agree with driving the production Env on the same actions.
"""

import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vlnce_tpu.tasks  # noqa: F401
import vlnce_tpu.models  # noqa: F401
import vlnce_tpu.trainers  # noqa: F401
from vlnce_tpu.config import get_config
from vlnce_tpu.envs import ensure_registered
from vlnce_tpu.envs import rl_envs  # noqa: F401 — registers env classes
from vlnce_tpu.envs.gridworld import GridWorldSim, get_scene
from vlnce_tpu.envs import device_sim as ds
from vlnce_tpu.registry import registry
from vlnce_tpu.tasks.geometry import quat_from_heading

ensure_registered()

IMG = 16


def _sim_config(img=IMG):
    cfg = get_config(opts=[
        "BASE_TASK_CONFIG_PATH", "vlnce_tpu/tasks/config/vlnce_task.yaml",
        "TASK_CONFIG.DATASET.TYPE", "Synthetic-VLN-v0",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", img,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", img,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", img,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", img,
    ])
    return cfg.TASK_CONFIG.SIMULATOR


def _host_sim(scene_id="synth_scene_0", img=IMG):
    sim = GridWorldSim(_sim_config(img))
    sim.reconfigure(scene_id)
    return sim


def _occ(scene_id="synth_scene_0"):
    return jnp.asarray(get_scene(scene_id).occupancy)


def test_dynamics_parity_action_sequences():
    """Positions/headings after mixed action sequences match the host sim."""
    sim = _host_sim()
    occ = _occ()
    rng = np.random.RandomState(0)
    fwd, turn = 0.25, math.radians(15.0)
    for start in ([1.5, 0.0, 1.5], [7.5, 0.0, 3.5], [13.2, 0.0, 9.1]):
        sim.set_agent_state(np.array(start), quat_from_heading(0.7))
        pos = jnp.asarray(np.array(start), jnp.float32)
        heading = jnp.asarray(0.7, jnp.float32)
        actions = rng.randint(1, 4, size=40)  # FORWARD/LEFT/RIGHT mix
        for a in actions:
            sim.step(int(a))
            pos, heading = ds.step_discrete(
                occ, pos, heading, jnp.int32(a), fwd, turn, allow_sliding=True
            )
        host = sim.get_agent_state()
        np.testing.assert_allclose(np.asarray(pos), host.position, atol=2e-4)
        host_heading = sim._heading
        dh = (float(heading) - host_heading + math.pi) % (2 * math.pi) - math.pi
        assert abs(dh) < 1e-4


@pytest.mark.slow  # >25s compile-heavy; full tier: pytest -m ""
def test_step_filter_slide_parity():
    """Diagonal moves into walls slide exactly like the host step_filter."""
    sim = _host_sim()
    occ = _occ()
    rng = np.random.RandomState(1)
    checked = 0
    for _ in range(200):
        start = np.array([rng.uniform(1, 15), 0.0, rng.uniform(1, 15)])
        if not sim.is_navigable(start):
            continue
        end = start + np.array([rng.uniform(-0.5, 0.5), 0.0, rng.uniform(-0.5, 0.5)])
        host = sim.step_filter(start, end)
        length = float(np.linalg.norm((end - start)[[0, 2]]))
        n_steps = max(2, int(length / (0.25 * 0.25)))
        dev = ds.step_filter(
            occ, jnp.asarray(start, jnp.float32), jnp.asarray(end, jnp.float32),
            n_steps, allow_sliding=True,
        )
        np.testing.assert_allclose(np.asarray(dev), host, atol=2e-4)
        checked += 1
    assert checked > 100


def test_render_parity_depth_and_rgb():
    """Device frames match the host raycast renderer at several poses."""
    sim = _host_sim()
    scene = get_scene("synth_scene_0")
    specs = ds.camera_specs_from_config(_sim_config())
    wall = jnp.asarray(scene.wall_colors)
    floor = jnp.asarray(scene.floor_color)
    ceil = jnp.asarray(scene.ceil_color)
    occ = _occ()
    for pose in ([1.5, 0.0, 1.5, 0.0], [7.5, 0.0, 7.5, 1.2], [3.1, 0.0, 11.0, 4.0]):
        pos = np.array(pose[:3])
        heading = pose[3]
        host_obs = sim.get_observations_at(pos, quat_from_heading(heading), keep_agent_at_new_pose=True)
        for spec in specs:
            dev = np.asarray(ds.render_camera(
                occ, wall, floor, ceil,
                jnp.asarray(pos, jnp.float32), jnp.asarray(heading, jnp.float32), spec,
            ))
            host = np.asarray(host_obs[spec.uuid])
            assert dev.shape == host.shape
            if spec.kind == "depth":
                np.testing.assert_allclose(dev, host, atol=1e-3)
            else:
                # uint8 shading can differ by 1 on float32-vs-float64 rounding,
                # and a hairline of pixels at wall edges may flip
                diff = np.abs(dev.astype(int) - host.astype(int))
                frac_large = float((diff > 1).mean())
                assert frac_large < 0.02, f"{spec.uuid}: {frac_large:.4f} pixels differ by >1"


def test_progress_batch_matches_sensor_semantics():
    scene = get_scene("synth_scene_0")
    sim = _host_sim()

    class Goal:
        position = [7.5, 0.0, 7.5]

    class Ep:
        scene_id = "synth_scene_0"
        goals = [Goal()]
        start_position = [1.5, 0.0, 1.5]

    scenes = ds.build_scene_batch([Ep()])
    pos = jnp.asarray([[3.5, 0.0, 5.5]], jnp.float32)
    prog = np.asarray(ds.progress_batch(scenes, pos))[0, 0]
    d0 = sim.geodesic_distance([1.5, 0.0, 1.5], [7.5, 0.0, 7.5])
    d_t = sim.geodesic_distance([3.5, 0.0, 5.5], [7.5, 0.0, 7.5])
    np.testing.assert_allclose(prog, (d0 - d_t) / d0, atol=1e-5)


def _eval_opts(tmp, extra=None):
    opts = [
        "BASE_TASK_CONFIG_PATH", "vlnce_tpu/tasks/config/vlnce_task.yaml",
        "TASK_CONFIG.DATASET.TYPE", "Synthetic-VLN-v0",
        "TASK_CONFIG.DATASET.NUM_EPISODES", 4,
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", 6,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", IMG,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", IMG,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", IMG,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", IMG,
        "NUM_ENVIRONMENTS", 2,
        "TENSORBOARD_DIR", "",
        "CHECKPOINT_FOLDER", f"{tmp}/ckpts",
        "RESULTS_DIR", f"{tmp}/evals",
        "MODEL.DEPTH_ENCODER.backbone", "resnet18",
        "MODEL.RGB_ENCODER.cnn_type", "TorchVisionResNet18",
        "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False,
        "MODEL.INSTRUCTION_ENCODER.vocab_size", 64,
        "EVAL.SPLIT", "val_unseen",
        "EVAL.USE_CKPT_CONFIG", False,
        "EVAL.ON_DEVICE_SCAN", True,
        "EVAL.SCAN_BATCH", 3,  # 4 episodes -> one padded chunk exercises padding
        "EVAL.SCAN_SEGMENT", 4,
        "EVAL.EPISODE_COUNT", 4,
    ]
    return opts + (extra or [])


class _NullWriter:
    def add_scalar(self, *a, **k):
        pass


def test_scan_eval_end_to_end(tmp_path):
    """Full on-device scan eval: stats for every episode, file written."""
    tmp = str(tmp_path)
    cfg = get_config(opts=_eval_opts(tmp))
    trainer = registry.get_trainer("dagger")(cfg)
    stats = trainer._eval_checkpoint(f"{tmp}/nonexistent.ckpt", _NullWriter(), 0)
    assert stats is not None
    for key in ("success", "spl", "ndtw", "distance_to_goal", "steps_taken"):
        assert key in stats, f"missing {key} in {sorted(stats)}"
    assert len(trainer._last_eval_episode_stats) == 4
    fname = f"{tmp}/evals/stats_ckpt_0_val_unseen.json"
    assert os.path.exists(fname)
    with open(fname) as f:
        assert json.load(f).keys() == stats.keys()
    # every recorded stat is finite
    for ep_stats in trainer._last_eval_episode_stats.values():
        for v in ep_stats.values():
            assert np.isfinite(v)


def test_metrics_replay_matches_env(tmp_path):
    """Replaying an action sequence through metrics_from_actions equals
    stepping the production Env with the same actions."""
    from vlnce_tpu.envs.env import Env
    from vlnce_tpu.trainers.scan_eval import metrics_from_actions

    tmp = str(tmp_path)
    cfg = get_config(opts=_eval_opts(tmp))
    task_cfg = cfg.TASK_CONFIG.clone()
    task_cfg.defrost()
    task_cfg.DATASET.SPLIT = "val_unseen"
    task_cfg.ENVIRONMENT.ITERATOR_OPTIONS.SHUFFLE = False
    task_cfg.freeze()

    env = Env(task_cfg)
    env.reset()
    episode = env.current_episode
    actions = [1, 2, 1, 1, 0]  # forward, left, forward, forward, STOP
    info = None
    for a in actions:
        env.step(a)
        info = env.get_metrics()
        if env.episode_over:
            break
    env.close()

    eval_cfg = cfg.clone()
    eval_cfg.defrost()
    eval_cfg.TASK_CONFIG = task_cfg.clone()
    eval_cfg.freeze()
    replay = metrics_from_actions(eval_cfg, [episode], [np.asarray(actions)])
    replay_stats = replay[episode.episode_id]
    host_stats = {k: v for k, v in info.items() if np.isscalar(v) or isinstance(v, (int, float))}
    assert set(replay_stats) == set(host_stats)
    for k in host_stats:
        np.testing.assert_allclose(replay_stats[k], host_stats[k], atol=1e-6, err_msg=k)


def test_grid_lookup_matches_gather():
    """The one-hot-contraction lookup equals plain indexing for every grid
    dtype on the hot paths: bool occupancy, uint8 colors, int32 nearest maps,
    and f32 distance fields containing inf (unreachable cells must not
    poison the masked sum with NaN)."""
    rng = np.random.RandomState(7)
    n, m = 64, 64
    ci = jnp.asarray(rng.randint(0, n, (5, 33)).astype(np.int32))
    cj = jnp.asarray(rng.randint(0, m, (5, 33)).astype(np.int32))

    grids = {
        "bool": rng.rand(n, m) > 0.6,
        "uint8": rng.randint(0, 256, (n, m)).astype(np.uint8),
        "int32": rng.randint(0, n, (n, m)).astype(np.int32),
        "f32": rng.rand(n, m).astype(np.float32) * 37.0,
    }
    f32_inf = grids["f32"].copy()
    f32_inf[rng.rand(n, m) > 0.8] = np.inf
    grids["f32_inf"] = f32_inf

    for name, g in grids.items():
        got = np.asarray(ds._grid_lookup(jnp.asarray(g), ci, cj))
        want = g[np.asarray(ci), np.asarray(cj)].astype(np.float32)
        np.testing.assert_array_equal(got, want, err_msg=name)


def test_select_axis1_matches_gather():
    """One-hot slot selection equals arr[b, idx[b]] for every queue dtype,
    keeping the input dtype (uint8 image frames must not widen)."""
    from vlnce_tpu.rl.device_rollout import _select_axis1

    rng = np.random.RandomState(3)
    b, q = 6, 17
    idx = jnp.asarray(rng.randint(0, q, (b,)).astype(np.int32))
    f32_inf = rng.randn(b, q, 5).astype(np.float32)
    f32_inf[rng.rand(b, q, 5) > 0.7] = np.inf  # goal fields hold inf at walls
    arrs = {
        "bool": rng.rand(b, q, 4, 4) > 0.5,
        "uint8": rng.randint(0, 256, (b, q, 3, 2, 3)).astype(np.uint8),
        "int32": rng.randint(-50, 50, (b, q, 8)).astype(np.int32),
        "f32": rng.randn(b, q, 5).astype(np.float32),
        "f32_inf": f32_inf,
    }
    for name, a in arrs.items():
        got = _select_axis1(jnp.asarray(a), idx)
        assert got.dtype == a.dtype, name
        want = a[np.arange(b), np.asarray(idx)]
        np.testing.assert_array_equal(np.asarray(got), want, err_msg=name)


def test_scan_eval_renders_videos(tmp_path):
    """EVAL.ON_DEVICE_SCAN + VIDEO_OPTION: frames are composed during the
    metrics replay (host cameras) and written to disk like the host loop."""
    tmp = str(tmp_path)
    cfg = get_config(opts=_eval_opts(tmp, extra=[
        "VIDEO_OPTION", "[disk]",
        "VIDEO_DIR", f"{tmp}/videos",
        "EVAL.EPISODE_COUNT", 2,
    ]))
    trainer = registry.get_trainer("dagger")(cfg)
    stats = trainer._eval_checkpoint(f"{tmp}/nonexistent.ckpt", _NullWriter(), 0)
    assert stats is not None
    vids = os.listdir(f"{tmp}/videos")
    assert len(vids) >= 2, vids


def test_render_tilt_parity():
    """LOOK_UP/DOWN horizon shift matches the host renderer
    (gridworld.py:400-402)."""
    sim = _host_sim()
    scene = get_scene("synth_scene_0")
    specs = ds.camera_specs_from_config(_sim_config())
    wall = jnp.asarray(scene.wall_colors)
    floor = jnp.asarray(scene.floor_color)
    ceil = jnp.asarray(scene.ceil_color)
    occ = _occ()
    pos = np.array([7.5, 0.0, 7.5])
    sim.set_agent_state(pos, quat_from_heading(1.2))
    # two LOOK_UPs then one LOOK_DOWN -> tilt = +tilt_angle
    from vlnce_tpu.envs.sim import SimulatorActions

    sim.step(SimulatorActions.LOOK_UP)
    sim.step(SimulatorActions.LOOK_UP)
    host_obs = sim.step(SimulatorActions.LOOK_DOWN)
    tilt = sim._tilt
    assert tilt > 0.0
    for spec in specs:
        dev = np.asarray(ds.render_camera(
            occ, wall, floor, ceil,
            jnp.asarray(pos, jnp.float32), jnp.asarray(1.2, jnp.float32), spec,
            tilt=jnp.float32(tilt),
        ))
        host = np.asarray(host_obs[spec.uuid])
        if spec.kind == "depth":
            np.testing.assert_allclose(dev, host, atol=1e-3)
        else:
            diff = np.abs(dev.astype(int) - host.astype(int))
            assert float((diff > 1).mean()) < 0.02


def test_scan_eval_rxr_action_space(tmp_path):
    """On-device scan eval runs the 6-action RxR space (LOOK_UP/DOWN as
    tilt-only steps) end-to-end and writes stats for every episode."""
    tmp = str(tmp_path)
    cfg = get_config(opts=_eval_opts(tmp, extra=[
        "TASK_CONFIG.TASK.POSSIBLE_ACTIONS",
        "[STOP, MOVE_FORWARD, TURN_LEFT, TURN_RIGHT, LOOK_UP, LOOK_DOWN]",
    ]))
    trainer = registry.get_trainer("dagger")(cfg)
    stats = trainer._eval_checkpoint(f"{tmp}/nonexistent.ckpt", _NullWriter(), 0)
    assert stats is not None
    assert len(trainer._last_eval_episode_stats) == 4
    for ep_stats in trainer._last_eval_episode_stats.values():
        for v in ep_stats.values():
            assert np.isfinite(v)


def test_scan_eval_sharded_matches_single(tmp_path):
    """Scan-eval pjit'd over the data mesh (SCAN_BATCH 4 -> 4-way on the
    8-device CPU mesh) produces the same per-episode stats as the forced
    single-device run."""
    stats = {}
    for data_axis, tag in ((1, "single"), (-1, "sharded")):
        tmp = str(tmp_path / tag)
        cfg = get_config(opts=_eval_opts(tmp, extra=[
            "EVAL.SCAN_BATCH", 4,
            "TPU.MESH.DATA", data_axis,
        ]))
        trainer = registry.get_trainer("dagger")(cfg)
        trainer._eval_checkpoint(f"{tmp}/nonexistent.ckpt", _NullWriter(), 0)
        stats[tag] = trainer._last_eval_episode_stats
    assert stats["single"].keys() == stats["sharded"].keys()
    for ep_id in stats["single"]:
        for k, v in stats["single"][ep_id].items():
            np.testing.assert_allclose(
                v, stats["sharded"][ep_id][k], atol=1e-5, err_msg=f"{ep_id}/{k}"
            )


@pytest.mark.slow  # >25s compile-heavy; full tier: pytest -m ""
def test_expert_action_matches_host_sensor():
    """Device expert == host ShortestPathSensor over random navigable states
    (boundary-coincident states aside, which are measure-zero in f64 vs f32)."""
    from vlnce_tpu.tasks.sensors import ShortestPathSensor

    sim = _host_sim()
    scene = get_scene("synth_scene_0")
    occ = _occ()
    cfg = _sim_config()

    class _SensorCfg:
        GOAL_RADIUS = 0.5
        USE_ORIGINAL_FOLLOWER = False

    sensor = ShortestPathSensor(sim=sim, config=_SensorCfg())

    class Goal:
        position = [13.5, 0.0, 13.5]

    class Ep:
        goals = [Goal()]

    gi, gj = scene.world_to_cell(13.5, 13.5)
    field = jnp.asarray(scene.distance_field((gi, gj)))
    goal_xz = jnp.asarray([13.5, 13.5], jnp.float32)
    turn_angle = math.radians(float(cfg.TURN_ANGLE))

    rng = np.random.RandomState(11)
    checked = mismatches = 0
    while checked < 300:
        pos = np.array([rng.uniform(0.5, 15.5), 0.0, rng.uniform(0.5, 15.5)])
        if not sim.is_navigable(pos):
            continue
        heading = rng.uniform(0, 2 * math.pi)
        sim.set_agent_state(pos, quat_from_heading(heading))
        host = int(sensor.get_observation(episode=Ep())[0])
        dev = int(ds.expert_action(
            occ, field, goal_xz,
            jnp.asarray(pos, jnp.float32), jnp.asarray(heading, jnp.float32),
            0.5, turn_angle,
        ))
        mismatches += int(host != dev)
        checked += 1
    assert mismatches <= 3, f"{mismatches}/{checked} expert actions differ"
