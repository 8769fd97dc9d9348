"""Real-scene geometry import (envs/scene_import.py): rasterization,
persistence, registration, and host/device parity on imported scenes with
native-frame (nonzero-origin) coordinates.

The parity chain mirrors tests/test_device_sim.py: once dynamics, rendering,
geodesics, and the expert agree between the host sim and the device twin ON
IMPORTED GEOMETRY, every resident pipeline (scan-eval, device DAgger/PPO)
steps real scenes with the proven primitives.
"""

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
from vlnce_tpu.envs import rl_envs  # noqa: F401
from vlnce_tpu.envs import device_sim as ds
from vlnce_tpu.envs import gridworld as gw
from vlnce_tpu.envs import scene_import as si
from vlnce_tpu.envs.gridworld import GridWorldSim, get_scene
from vlnce_tpu.registry import registry
from vlnce_tpu.tasks.episodes import InstructionData, NavigationGoal, VLNEpisode
from vlnce_tpu.tasks.geometry import quat_from_heading
from vlnce_tpu.utils.nav_graph import synthetic_lattice_graph

ensure_registered()

IMG = 16


@pytest.fixture(autouse=True)
def _clean_scene_registry():
    """Scene registration is process-global; snapshot and restore it so
    imported test scenes never leak into other tests' procedural ids."""
    saved = (
        dict(gw._REGISTERED_SCENES),
        list(gw._SCENE_PROVIDERS),
        dict(si._STEM_SCENES),
        dict(si._GEOMETRY_DIRS),
        dict(si._APPLIED_PICKLES),
        si._STEM_PROVIDER_INSTALLED,
        dict(ds._NEAREST_FREE_CACHE),
    )
    yield
    gw._REGISTERED_SCENES.clear()
    gw._REGISTERED_SCENES.update(saved[0])
    gw._SCENE_PROVIDERS[:] = saved[1]
    si._STEM_SCENES.clear()
    si._STEM_SCENES.update(saved[2])
    si._GEOMETRY_DIRS.clear()
    si._GEOMETRY_DIRS.update(saved[3])
    si._APPLIED_PICKLES.clear()
    si._APPLIED_PICKLES.update(saved[4])
    si._STEM_PROVIDER_INSTALLED = saved[5]
    ds._NEAREST_FREE_CACHE.clear()
    ds._NEAREST_FREE_CACHE.update(saved[6])


def _offset_graph(dx=-20.0, dz=12.0, world=16.0, spacing=2.0):
    """Lattice connectivity graph in a NATIVE world frame away from the
    origin — the shape real MP3D graphs have (reference ships
    data/connectivity_graphs.pkl keyed by scene with raw MP3D positions)."""
    g = synthetic_lattice_graph(world_size=world, spacing=spacing)
    import networkx as nx

    out = nx.Graph()
    for node, data in g.nodes(data=True):
        p = data["position"]
        out.add_node(node, position=[p[0] + dx, p[1], p[2] + dz])
    out.add_edges_from(g.edges)
    return out


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


def test_rasterize_offset_graph_geometry():
    """Node/edge corridors are navigable, far cells blocked, and the
    world<->cell transforms round-trip in the scene's native frame."""
    graph = _offset_graph()
    scene = si.scene_from_graph("offset_scene", graph)
    assert scene.origin[0] < -19.0 and scene.origin[1] > 10.0
    assert scene.n % 8 == 0
    from vlnce_tpu.utils.nav_graph import _node_position

    for node in graph.nodes:
        p = _node_position(graph, node)
        i, j = scene.world_to_cell(p[0], p[-1])
        assert not scene.occupancy[i, j], f"node {p} rasterized blocked"
    # edge midpoints walkable too
    for a, b in list(graph.edges)[:20]:
        pa, pb = _node_position(graph, a), _node_position(graph, b)
        m = (pa + pb) / 2
        i, j = scene.world_to_cell(m[0], m[-1])
        assert not scene.occupancy[i, j]
    # grid corner (outside every corridor) is blocked
    assert scene.occupancy[0, 0] and scene.occupancy[-1, -1]
    # round trip with nonzero origin
    x, z = scene.cell_to_world(5, 9)
    assert scene.world_to_cell(x, z) == (5, 9)


def test_geometry_npz_roundtrip(tmp_path):
    scene = si.scene_from_graph("rt_scene", _offset_graph())
    path = str(tmp_path / "rt_scene.npz")
    si.save_scene_geometry(path, scene)
    back = si.load_scene_geometry(path)
    assert back.scene_id == "rt_scene"
    np.testing.assert_array_equal(back.occupancy, scene.occupancy)
    np.testing.assert_allclose(back.origin, scene.origin)
    np.testing.assert_array_equal(back.wall_colors, scene.wall_colors)
    # identical geometry -> identical distance fields
    free = np.argwhere(~scene.occupancy)
    goal = tuple(int(v) for v in free[len(free) // 2])
    np.testing.assert_allclose(back.distance_field(goal), scene.distance_field(goal))


def test_geometry_dir_provider_serves_episode_scene_ids(tmp_path):
    """set_geometry_dir serves dataset-style scene_ids ('dir/x/x.glb') from
    {dir}/{stem}.npz — the one-registration path real episodes take."""
    scene = si.scene_from_graph("zsNo4HB9uLZ", _offset_graph(dx=4.0, dz=-9.0))
    si.save_scene_geometry(str(tmp_path / "zsNo4HB9uLZ.npz"), scene)
    si.set_geometry_dir(str(tmp_path))
    served = get_scene("mp3d/zsNo4HB9uLZ/zsNo4HB9uLZ.glb")
    assert isinstance(served, si.ImportedScene)
    np.testing.assert_array_equal(served.occupancy, scene.occupancy)
    np.testing.assert_allclose(served.origin, scene.origin)
    # unknown scenes still fall through to procedural generation
    assert not isinstance(get_scene("synthetic/synth_scene_0.glb"), si.ImportedScene)


def test_apply_scene_geometry_via_sim_config(tmp_path):
    """The SIMULATOR.GEOMETRY_DIR config key installs the provider when the
    host sim is constructed (each forked VectorEnv worker runs this)."""
    scene = si.scene_from_graph("cfg_scene", _offset_graph(dx=2.0, dz=2.0))
    si.save_scene_geometry(str(tmp_path / "cfg_scene.npz"), scene)
    cfg = get_config(opts=[
        "TASK_CONFIG.SIMULATOR.GEOMETRY_DIR", str(tmp_path),
    ])
    sim = GridWorldSim(cfg.TASK_CONFIG.SIMULATOR)
    sim.reconfigure("imported/cfg_scene.glb")
    assert isinstance(sim._scene, si.ImportedScene)


def _registered_offset_scene(scene_id="imported/offset_scene.glb"):
    scene = si.scene_from_graph(si._scene_stem(scene_id), _offset_graph())
    si.register_scenes([scene])
    return get_scene(scene_id)  # the per-id alias the pipelines will see


def test_imported_dynamics_parity():
    """Device step_batch == host sim over random action sequences on an
    imported nonzero-origin scene (mirror of
    test_device_sim.test_dynamics_parity_action_sequences)."""
    scene = _registered_offset_scene()
    sim = GridWorldSim(_sim_config())
    sim.reconfigure("imported/offset_scene.glb")
    occ = jnp.asarray(scene.occupancy)
    origin = jnp.asarray(scene.origin, jnp.float32)
    fwd = float(_sim_config().FORWARD_STEP_SIZE)
    turn = math.radians(float(_sim_config().TURN_ANGLE))

    rng = np.random.RandomState(3)
    start = np.array([-19.0, 0.0, 13.0])  # lattice node in native frame
    assert sim.is_navigable(start), "start must be navigable in the import"
    for trial in range(4):
        sim.set_agent_state(start, quat_from_heading(0.3 * trial))
        pos = jnp.asarray(start, jnp.float32)
        heading = jnp.float32(0.3 * trial)
        for a in rng.randint(1, 4, size=12):
            sim.step(int(a))
            pos, heading = ds.step_discrete(
                occ, pos, heading, jnp.int32(a), fwd, turn, True, origin
            )
        host_state = sim.get_agent_state()
        np.testing.assert_allclose(np.asarray(pos), host_state.position, atol=1e-4)


def test_imported_render_parity():
    """Host raycast frames match the device renderer on imported geometry in
    the native frame (same tolerances as the procedural parity test)."""
    scene = _registered_offset_scene()
    sim = GridWorldSim(_sim_config())
    sim.reconfigure("imported/offset_scene.glb")
    specs = ds.camera_specs_from_config(_sim_config())
    wall = jnp.asarray(scene.wall_colors)
    floor = jnp.asarray(scene.floor_color)
    ceil = jnp.asarray(scene.ceil_color)
    occ = jnp.asarray(scene.occupancy)
    origin = jnp.asarray(scene.origin, jnp.float32)
    for pose in ([-19.0, 0.0, 13.0, 0.0], [-13.0, 0.0, 19.0, 2.1]):
        pos = np.array(pose[:3])
        heading = pose[3]
        host_obs = sim.get_observations_at(pos, quat_from_heading(heading), keep_agent_at_new_pose=True)
        for spec in specs:
            dev = np.asarray(ds.render_camera(
                occ, wall, floor, ceil,
                jnp.asarray(pos, jnp.float32), jnp.asarray(heading, jnp.float32),
                spec, origin=origin,
            ))
            host = np.asarray(host_obs[spec.uuid])
            assert dev.shape == host.shape
            if spec.kind == "depth":
                np.testing.assert_allclose(dev, host, atol=1e-3)
            else:
                diff = np.abs(dev.astype(int) - host.astype(int))
                assert float((diff > 1).mean()) < 0.02


def test_imported_geodesic_and_progress():
    """geodesic_at / progress_batch on an imported SceneBatch equal the host
    sim's geodesic_distance in the native frame."""
    scene = _registered_offset_scene()
    sim = GridWorldSim(_sim_config())
    sim.reconfigure("imported/offset_scene.glb")

    start = [-19.0, 0.0, 13.0]
    goal = [-7.0, 0.0, 25.0]

    class Goal:
        position = goal

    class Ep:
        scene_id = "imported/offset_scene.glb"
        goals = [Goal()]
        start_position = start

    scenes = ds.build_scene_batch([Ep()])
    probe = [-15.0, 0.0, 19.0]
    d_dev = float(ds.geodesic_at(scenes.goal_field[0], jnp.asarray(probe, jnp.float32), scenes.origin_xz[0]))
    d_host = sim.geodesic_distance(probe, goal)
    np.testing.assert_allclose(d_dev, d_host, atol=1e-4)

    prog = float(np.asarray(ds.progress_batch(scenes, jnp.asarray([probe], jnp.float32)))[0, 0])
    d0 = sim.geodesic_distance(start, goal)
    np.testing.assert_allclose(prog, (d0 - d_host) / d0, atol=1e-5)


def test_imported_expert_matches_host_sensor():
    """Device expert == host ShortestPathSensor on imported geometry."""
    from vlnce_tpu.tasks.sensors import ShortestPathSensor

    scene = _registered_offset_scene()
    sim = GridWorldSim(_sim_config())
    sim.reconfigure("imported/offset_scene.glb")

    class _SensorCfg:
        GOAL_RADIUS = 0.5
        USE_ORIGINAL_FOLLOWER = False

    sensor = ShortestPathSensor(sim=sim, config=_SensorCfg())
    goal = [-7.0, 0.0, 25.0]

    class Goal:
        position = goal

    class Ep:
        goals = [Goal()]

    gi, gj = scene.world_to_cell(goal[0], goal[2])
    field = jnp.asarray(scene.distance_field((gi, gj)).astype(np.float32))
    occ = jnp.asarray(scene.occupancy)
    origin = jnp.asarray(scene.origin, jnp.float32)
    goal_xz = jnp.asarray([goal[0], goal[2]], jnp.float32)
    turn_angle = math.radians(float(_sim_config().TURN_ANGLE))

    rng = np.random.RandomState(5)
    ox, oz = scene.origin
    world = scene.n * gw._RES
    checked = mismatches = 0
    while checked < 120:
        pos = np.array([rng.uniform(ox, ox + world), 0.0, rng.uniform(oz, oz + world)])
        if not sim.is_navigable(pos):
            continue
        heading = rng.uniform(0, 2 * math.pi)
        sim.set_agent_state(pos, quat_from_heading(heading))
        host = int(sensor.get_observation(episode=Ep())[0])
        dev = int(ds.expert_action(
            occ, field, goal_xz,
            jnp.asarray(pos, jnp.float32), jnp.asarray(heading, jnp.float32),
            0.5, turn_angle, origin=origin,
        ))
        mismatches += int(host != dev)
        checked += 1
    # f32-vs-f64 boundary coincidences only (same budget as the procedural test)
    assert mismatches <= 3, f"{mismatches}/120 expert mismatches"


def _lattice_episodes(scene_id, n_eps=3):
    """Episodes whose start/goal ride the imported lattice in native frame."""
    rng = np.random.RandomState(0)
    graph = _offset_graph()
    from vlnce_tpu.utils.nav_graph import _node_position

    nodes = [_node_position(graph, n) for n in graph.nodes]
    eps = []
    for i in range(n_eps):
        a, b = rng.choice(len(nodes), 2, replace=False)
        start, goal = nodes[a], nodes[b]
        geo = float(np.hypot(*(start - goal)[[0, 2]]))
        eps.append(VLNEpisode(
            episode_id=str(i),
            trajectory_id=str(i),
            scene_id=scene_id,
            start_position=[float(x) for x in start],
            start_rotation=[float(x) for x in quat_from_heading(rng.uniform(0, 2 * np.pi))],
            instruction=InstructionData(
                instruction_text="walk forward", instruction_tokens=[2, 6]
            ),
            goals=[NavigationGoal(position=[float(x) for x in goal], radius=3.0)],
            reference_path=[[float(x) for x in start], [float(x) for x in goal]],
            info={"geodesic_distance": geo},
        ))
    return eps


@pytest.mark.slow  # compile-heavy closed-loop scan
def test_scan_eval_on_imported_scene(tmp_path):
    """The flagship resident pipeline end-to-end on imported real-scene-style
    geometry: device-rolled actions on the nonzero-origin import, metrics
    replayed through the host measure machinery stepping the SAME import.
    This is the pipeline that runs real MP3D episodes once assets land
    (reference README.md:209-218 evaluation)."""
    from vlnce_tpu.trainers.scan_eval import metrics_from_actions, run_scan_rollouts

    scene_id = "imported/offset_scene.glb"
    _registered_offset_scene(scene_id)
    tmp = str(tmp_path)
    cfg = get_config(opts=[
        "BASE_TASK_CONFIG_PATH", "vlnce_tpu/tasks/config/vlnce_task.yaml",
        "TASK_CONFIG.DATASET.TYPE", "Synthetic-VLN-v0",
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", 8,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", IMG,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", IMG,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", IMG,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", IMG,
        "NUM_ENVIRONMENTS", 2,
        "CHECKPOINT_FOLDER", f"{tmp}/ckpts",
        "RESULTS_DIR", f"{tmp}/evals",
        "MODEL.DEPTH_ENCODER.backbone", "resnet18",
        "MODEL.RGB_ENCODER.cnn_type", "TorchVisionResNet18",
        "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False,
        "MODEL.INSTRUCTION_ENCODER.vocab_size", 64,
        "EVAL.ON_DEVICE_SCAN", True,
        "EVAL.SCAN_BATCH", 2,
        "EVAL.SCAN_SEGMENT", 4,
    ])
    episodes = _lattice_episodes(scene_id)
    trainer = registry.get_trainer("dagger")(cfg)
    obs_space, act_space = trainer._get_spaces(cfg)
    trainer._initialize_policy(
        cfg, load_from_ckpt=False,
        observation_space=obs_space, action_space=act_space,
    )
    actions = run_scan_rollouts(
        trainer.policy, trainer.obs_transforms, cfg, episodes, jax.random.PRNGKey(0)
    )
    assert len(actions) == len(episodes)
    stats = metrics_from_actions(cfg, episodes, actions)
    assert set(stats) == {ep.episode_id for ep in episodes}
    for ep_id, ep_stats in stats.items():
        for key in ("success", "spl", "ndtw", "distance_to_goal"):
            assert key in ep_stats, f"{ep_id} missing {key}"
            assert np.isfinite(ep_stats[key]), f"{ep_id}/{key} not finite"
        # the replay actually moved through imported geometry: distance to
        # goal is a real geodesic in the native frame, not inf/zero padding
        assert ep_stats["distance_to_goal"] < 64.0


@pytest.mark.slow  # two full eval passes + bank generation
def test_eval_parity_asset_day_dryrun(tmp_path, monkeypatch):
    """One-command asset-day readiness (VERDICT r3 #9): scripts/eval_parity.py
    --resident drives the WHOLE first-session-with-assets flow on synthetic
    fixtures — geometry export from a connectivity pkl, feature-bank
    generation over the imported scene, host-loop eval, resident scan-eval,
    and the host-vs-resident comparison — exiting 0 with both stats files
    written. On asset day the same command runs with the real
    connectivity_graphs.pkl / MP3D config and tight tolerances."""
    import pickle

    from vlnce_tpu.tasks.datasets import make_dataset

    tmp = str(tmp_path)
    yaml = "vlnce_tpu/config/experiments/synthetic/smoke_seq2seq.yaml"
    opts = [
        "TASK_CONFIG.DATASET.NUM_EPISODES", "2",
        "TASK_CONFIG.DATASET.NUM_SCENES", "1",
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "6",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", str(IMG),
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", str(IMG),
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", str(IMG),
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", str(IMG),
        "NUM_ENVIRONMENTS", "2",
        "EVAL.SCAN_BATCH", "2",
        "EVAL.SCAN_SEGMENT", "4",
        "IL.DAGGER.lmdb_features_dir", f"{tmp}/traj",
        "RESULTS_DIR", f"{tmp}/evals",
        "CHECKPOINT_FOLDER", f"{tmp}/ckpts",
        "EVAL_CKPT_PATH_DIR", f"{tmp}/ckpts",
    ]

    # connectivity pkl covering the synthetic split's scene stems (the shape
    # of the reference's data/connectivity_graphs.pkl, measures.py:336-337)
    cfg = get_config(yaml, opts)
    dataset = make_dataset(cfg.TASK_CONFIG.DATASET.TYPE, cfg.TASK_CONFIG.DATASET)
    eval_split = cfg.TASK_CONFIG.DATASET.clone()
    eval_split.defrost()
    eval_split.SPLIT = "val_unseen"
    eval_split.freeze()
    eval_ds = make_dataset(cfg.TASK_CONFIG.DATASET.TYPE, eval_split)
    stems = {
        os.path.splitext(os.path.basename(ep.scene_id))[0]
        for ep in (list(dataset.episodes) + list(eval_ds.episodes))
    }
    graphs = {stem: synthetic_lattice_graph(world_size=16.0, spacing=2.0) for stem in stems}
    pkl_path = f"{tmp}/connectivity_graphs.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump(graphs, f)

    # an (untrained) checkpoint for both eval passes
    trainer = registry.get_trainer("dagger")(cfg)
    obs_space, act_space = trainer._get_spaces(cfg)
    trainer._initialize_policy(
        cfg, load_from_ckpt=False,
        observation_space=obs_space, action_space=act_space,
    )
    os.makedirs(f"{tmp}/ckpts", exist_ok=True)
    trainer.save_checkpoint("ckpt.0.ckpt")
    from vlnce_tpu.utils.checkpoints import wait_for_pending

    wait_for_pending()
    ckpt = f"{tmp}/ckpts/ckpt.0.ckpt"
    assert os.path.exists(ckpt)

    from scripts.eval_parity import main as parity_main

    monkeypatch.setattr("sys.argv", [
        "eval_parity.py",
        "--exp-config", yaml,
        "--checkpoint", ckpt,
        "--split", "val_unseen",
        "--resident",
        "--geometry-dir", f"{tmp}/geom",
        "--connectivity", pkl_path,
        "--bank-dir", f"{tmp}/bank",
        "--bank-headings", "4",
        # untrained policy: the dryrun proves the PIPELINE, not model quality
        "--resident-tolerance", "2.0",
    ] + opts)
    rc = parity_main()
    assert rc == 0, "eval_parity --resident exited nonzero"

    assert os.path.exists(f"{tmp}/geom") and any(
        f.endswith(".npz") for f in os.listdir(f"{tmp}/geom")
    ), "geometry export did not run"
    assert any(f.endswith(".npz") for f in os.listdir(f"{tmp}/bank")), (
        "feature-bank generation did not run"
    )
    host_stats = [f for f in os.listdir(f"{tmp}/evals") if f.endswith(".json")]
    resident_stats = [
        f for f in os.listdir(f"{tmp}/evals/resident") if f.endswith(".json")
    ]
    assert host_stats and resident_stats, (host_stats, resident_stats)


def _jittered_graph(world=12.0, spacing=2.25, jitter=0.4, seed=3, dx=-20.0, dz=12.0):
    """MP3D-shaped connectivity: irregular ~2.25 m node spacing (the
    reference graphs' typical pitch), oblique edges, native offset frame."""
    import networkx as nx

    base = synthetic_lattice_graph(world_size=world, spacing=spacing)
    rng = np.random.RandomState(seed)
    g = nx.Graph()
    for node, data in base.nodes(data=True):
        p = np.asarray(data["position"], float)
        p = p + np.array([rng.uniform(-jitter, jitter) + dx, 0.0,
                          rng.uniform(-jitter, jitter) + dz])
        g.add_node(node, position=list(p))
    g.add_edges_from(base.edges)
    return g


def _geodesic_error_stats(g, scene_id):
    """All-pairs grid-vs-graph geodesic comparison for a connectivity graph
    and its rasterized ImportedScene. Returns (max overestimate relative to
    the graph shortest path, min slack vs straight-line Euclidean in meters,
    max single-edge relative error)."""
    import networkx as nx

    from vlnce_tpu.utils.nav_graph import _node_position

    for a, b in g.edges:
        pa, pb = _node_position(g, a), _node_position(g, b)
        g[a][b]["w"] = float(np.hypot(pa[0] - pb[0], pa[-1] - pb[-1]))
    scene = si.scene_from_graph(scene_id, g)
    nodes = list(g.nodes)
    pos = {nd: _node_position(g, nd) for nd in nodes}
    cells = {nd: scene.world_to_cell(pos[nd][0], pos[nd][-1]) for nd in nodes}
    sp = dict(nx.all_pairs_dijkstra_path_length(g, weight="w"))
    over, under, edge_rel = [], [], []
    for gi, goal in enumerate(nodes):
        field = scene.distance_field(cells[goal])
        for src in nodes[gi + 1:]:
            d_graph = sp[goal][src]
            if d_graph < 1e-9:
                continue
            d_grid = float(field[cells[src]])
            assert np.isfinite(d_grid), f"{src}->{goal} unreachable on the grid"
            eu = float(np.hypot(pos[goal][0] - pos[src][0], pos[goal][-1] - pos[src][-1]))
            over.append((d_grid - d_graph) / d_graph)
            under.append(d_grid - eu)
            if g.has_edge(goal, src):
                edge_rel.append(abs(d_grid - d_graph) / d_graph)
    return max(over), min(under), max(edge_rel)


def test_imported_geodesic_error_bound():
    """Geodesic-fidelity bound for imported geometry (VERDICT r4 missing #4):
    over all node pairs, the rasterized twin's grid geodesic lies in

        [ d_euclid - 2*snap,  d_graph * (1 + eps) ]

    where snap = _RES/sqrt(2) ~ 0.177 m endpoint cell-snapping and eps covers
    the 8-connected octile overshoot on oblique segments (sqrt(2)-1 at worst
    ~8.2%) plus snapping at the reference's ~2.25 m node pitch. Grid paths
    SHORTER than the graph distance are legitimate, not error: the 0.5 m
    corridor tube permits corner cuts the panorama graph cannot encode (an
    axis-aligned lattice reproduces graph distances exactly, below). This
    bracket is the error bar real-episode SPL / progress / expert-descent
    numbers inherit from the corridor approximation
    (reference habitat_extensions/sensors.py:75-78 geodesic calls,
    measures.py:236-291 nDTW path geometry).

    Measured on these graphs: lattice max_over=0.0, edge error 0.0;
    jittered(seed=3) max_over=0.160, min Euclid slack -0.188 m, max edge
    error 0.160; jittered(seed=11, jitter=0.5) 0.178 / -0.225 m / 0.178.
    Asserted bounds carry ~10% headroom over the measured values."""
    # axis-aligned lattice in a native offset frame: exact reproduction
    over, under, edge = _geodesic_error_stats(
        _offset_graph(world=12.0, spacing=2.0), "geo/lattice.glb"
    )
    assert over <= 1e-9 and edge <= 1e-9 and under >= -1e-9, (over, under, edge)

    # MP3D-shaped irregular graphs: bounded octile + snapping error
    for seed, jitter in ((3, 0.4), (11, 0.5)):
        over, under, edge = _geodesic_error_stats(
            _jittered_graph(seed=seed, jitter=jitter), f"geo/jitter{seed}.glb"
        )
        snap = 2 * gw._RES / np.sqrt(2.0)
        assert over <= 0.20, f"grid overestimates graph geodesic by {over:.3f}"
        assert edge <= 0.20, f"single-edge geodesic error {edge:.3f}"
        assert under >= -(snap + 0.03), (
            f"grid geodesic undercuts straight-line Euclidean by {-under:.3f} m"
        )
