"""Trainer integration tests: mini DAgger train -> eval, waypoint PPO update.

Tiny encoders/images keep CPU compile time bounded; these guard the full
collection -> store -> jitted-update -> checkpoint -> eval pipeline.

Slow tier: every test here builds policies and compiles full train steps —
run with `pytest -m slow tests/test_trainers.py` (default `pytest -q` is the
fast tier, pyproject addopts `-m 'not slow'`).
"""

import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow

import vlnce_tpu.tasks  # noqa: F401
import vlnce_tpu.models  # noqa: F401
import vlnce_tpu.trainers  # noqa: F401
from vlnce_tpu.config import get_config
from vlnce_tpu.envs import ensure_registered
from vlnce_tpu.envs import rl_envs  # noqa: F401
from vlnce_tpu.registry import registry

ensure_registered()

IMG = 16


def base_opts(tmp, extra=None):
    opts = [
        "BASE_TASK_CONFIG_PATH", "vlnce_tpu/tasks/config/vlnce_task.yaml",
        "TASK_CONFIG.DATASET.TYPE", "Synthetic-VLN-v0",
        "TASK_CONFIG.DATASET.NUM_EPISODES", 6,
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", 6,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", IMG,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", IMG,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", IMG,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", IMG,
        "NUM_ENVIRONMENTS", 2,
        "TENSORBOARD_DIR", "",
        "CHECKPOINT_FOLDER", f"{tmp}/ckpts",
        "EVAL_CKPT_PATH_DIR", f"{tmp}/ckpts",
        "RESULTS_DIR", f"{tmp}/evals",
        "MODEL.DEPTH_ENCODER.backbone", "resnet18",
        "MODEL.RGB_ENCODER.cnn_type", "TorchVisionResNet18",
        "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False,
        "MODEL.INSTRUCTION_ENCODER.vocab_size", 64,
        "IL.epochs", 1,
        "IL.batch_size", 2,
        "IL.DAGGER.iterations", 1,
        "IL.DAGGER.update_size", 4,
        "IL.DAGGER.p", 1.0,
        "IL.DAGGER.lmdb_features_dir", f"{tmp}/traj",
        "EVAL.EPISODE_COUNT", 2,
        "EVAL.SPLIT", "val_unseen",
        "EVAL.USE_CKPT_CONFIG", False,
    ]
    return opts + (extra or [])


@pytest.fixture(autouse=True)
def threaded_envs(monkeypatch):
    monkeypatch.setenv("VLNCE_TPU_THREADED_ENVS", "1")


def test_dagger_train_then_eval(tmp_path):
    tmp = str(tmp_path)
    cfg = get_config(opts=base_opts(tmp))
    trainer = registry.get_trainer("dagger")(cfg)
    trainer.train()
    ckpts = sorted(os.listdir(f"{tmp}/ckpts"))
    assert ckpts == ["ckpt.0.ckpt"]

    eval_cfg = get_config(opts=base_opts(tmp, ["EVAL_CKPT_PATH_DIR", f"{tmp}/ckpts/ckpt.0.ckpt"]))
    trainer2 = registry.get_trainer("dagger")(eval_cfg)
    stats = trainer2._eval_checkpoint(f"{tmp}/ckpts/ckpt.0.ckpt", _NullWriter(), 0)
    assert "success" in stats and "ndtw" in stats
    assert os.path.exists(f"{tmp}/evals/stats_ckpt_0_val_unseen.json")


def test_waypoint_trainer_updates(tmp_path):
    tmp = str(tmp_path)
    opts = [
        "BASE_TASK_CONFIG_PATH", "vlnce_tpu/tasks/config/vlnce_waypoint_task.yaml",
        "TRAINER_NAME", "ddppo-waypoint",
        "ENV_NAME", "VLNCEWaypointEnv",
        "TASK_CONFIG.DATASET.TYPE", "Synthetic-VLN-v0",
        "TASK_CONFIG.DATASET.NUM_EPISODES", 6,
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", 4,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", IMG,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", IMG,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", IMG,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", IMG,
        "NUM_ENVIRONMENTS", 2,
        "TENSORBOARD_DIR", "",
        "CHECKPOINT_FOLDER", f"{tmp}/ckpts",
        "RL.NUM_UPDATES", 1,
        "RL.LOG_INTERVAL", 1,
        "RL.CHECKPOINT_INTERVAL", 1,
        "RL.PPO.num_steps", 2,
        "RL.PPO.num_mini_batch", 2,
        "RL.PPO.ppo_epoch", 1,
        "RL.POLICY.OBS_TRANSFORMS.ENABLED_TRANSFORMS", "[ObsStack]",
        "MODEL.policy_name", "WaypointPolicy",
        "MODEL.DEPTH_ENCODER.backbone", "resnet18",
        "MODEL.RGB_ENCODER.cnn_type", "TorchVisionResNet18",
        "MODEL.RGB_ENCODER.output_size", 64,
        "MODEL.STATE_ENCODER.hidden_size", 64,
        "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False,
        "MODEL.INSTRUCTION_ENCODER.vocab_size", 64,
        "MODEL.INSTRUCTION_ENCODER.bidirectional", True,
        "MODEL.INSTRUCTION_ENCODER.final_state_only", False,
        # exercise the two-group pipelined rollout path end-to-end
        "TPU.PIPELINED_COLLECTION", True,
    ]
    cfg = get_config(opts=opts)
    trainer = registry.get_trainer("ddppo-waypoint")(cfg)
    # snapshot freshly initialized params so we can assert the PPO update
    # actually moves them
    captured = {}
    orig_init = trainer._initialize_policy_rl

    def wrapped(*a, **k):
        orig_init(*a, **k)
        captured["before"] = jax.tree_util.tree_map(
            lambda x: np.asarray(x).copy(), trainer.policy.params
        )

    trainer._initialize_policy_rl = wrapped
    trainer.train()
    assert os.path.exists(f"{tmp}/ckpts/ckpt.0.ckpt")
    before = jax.tree_util.tree_leaves(captured["before"])
    after = jax.tree_util.tree_leaves(trainer.policy.params)
    assert len(before) == len(after)
    changed = any(
        not np.allclose(np.asarray(b), np.asarray(a))
        for b, a in zip(before, after)
    )
    assert changed, "PPO update did not change any parameter"


class _NullWriter:
    def add_scalar(self, *a, **k):
        pass

    def add_video_from_np_images(self, *a, **k):
        pass


def test_dagger_collection_serial_matches_pipelined(tmp_path):
    """TPU.PIPELINED_COLLECTION=False must still collect the same number of
    episodes through the same store schema (the serial fallback path)."""
    from vlnce_tpu.data.trajectory_store import TrajectoryStoreReader, store_length

    counts = {}
    for flag in (True, False):
        tmp = str(tmp_path / f"pipe_{flag}")
        cfg = get_config(opts=base_opts(tmp, ["TPU.PIPELINED_COLLECTION", flag]))
        trainer = registry.get_trainer("dagger")(cfg)
        trainer.train()
        counts[flag] = store_length(f"{tmp}/traj")
        reader = TrajectoryStoreReader(f"{tmp}/traj")
        obs, prev, oracle = reader.get(0)
        assert len(prev) == len(oracle) and len(prev) > 0
        reader.close()
    assert counts[True] == counts[False] == 4


def test_eval_episode_set_is_distinct_and_reference_bounded(tmp_path):
    """Eval episode-set parity with the reference loop
    (base_il_trainer.py:318-410): every evaluated episode is DISTINCT (the
    _pause_envs/deactivate dedup), and the count is EVAL.EPISODE_COUNT —
    except that episodes finishing in the same final env step are all
    recorded (the reference records them too), so at most
    EPISODE_COUNT + N - 1."""
    tmp = str(tmp_path)
    N = 2
    cfg = get_config(opts=base_opts(tmp, [
        "TASK_CONFIG.DATASET.NUM_EPISODES", 8,
        "EVAL.EPISODE_COUNT", 5,
    ]))
    trainer = registry.get_trainer("dagger")(cfg)
    trainer.train()
    stats = trainer._eval_checkpoint(f"{tmp}/ckpts/ckpt.0.ckpt", _NullWriter(), 0)
    assert stats is not None
    eps = trainer._last_eval_episode_stats
    assert len(set(eps.keys())) == len(eps)  # all distinct episode ids
    assert 5 <= len(eps) <= 5 + N - 1


def test_inference_writes_r2r_and_rxr_predictions(tmp_path):
    """Leaderboard inference path (reference base_il_trainer.py:433-630):
    r2r JSON {episode_id: [pose infos]} and rxr JSONL
    {instruction_id, path} with consecutive-duplicate dedup."""
    import json

    tmp = str(tmp_path)
    cfg = get_config(opts=base_opts(tmp))
    trainer = registry.get_trainer("dagger")(cfg)
    trainer.train()
    ckpt = f"{tmp}/ckpts/ckpt.0.ckpt"

    # r2r format
    cfg_r2r = get_config(opts=base_opts(tmp, [
        "INFERENCE.CKPT_PATH", ckpt,
        "INFERENCE.SPLIT", "val_unseen",
        "INFERENCE.USE_CKPT_CONFIG", False,
        "INFERENCE.FORMAT", "r2r",
        "INFERENCE.PREDICTIONS_FILE", f"{tmp}/preds.json",
        "TASK_CONFIG.DATASET.NUM_EPISODES", 3,
    ]))
    registry.get_trainer("dagger")(cfg_r2r).inference()
    with open(f"{tmp}/preds.json") as f:
        preds = json.load(f)
    assert len(preds) >= 3
    for ep_id, steps in preds.items():
        assert len(steps) >= 2
        for s in steps:
            assert "position" in s and "heading" in s and "stop" in s

    # rxr jsonl format
    cfg_rxr = get_config(opts=base_opts(tmp, [
        "INFERENCE.CKPT_PATH", ckpt,
        "INFERENCE.SPLIT", "val_unseen",
        "INFERENCE.USE_CKPT_CONFIG", False,
        "INFERENCE.FORMAT", "rxr",
        "INFERENCE.PREDICTIONS_FILE", f"{tmp}/preds.jsonl",
        "TASK_CONFIG.DATASET.NUM_EPISODES", 3,
    ]))
    registry.get_trainer("dagger")(cfg_rxr).inference()
    lines = [json.loads(l) for l in open(f"{tmp}/preds.jsonl")]
    assert len(lines) >= 3
    for entry in lines:
        assert "instruction_id" in entry and "path" in entry
        path = entry["path"]
        assert all(a != b for a, b in zip(path[:-1], path[1:]))  # deduped


def test_inference_on_device_scan_matches_format(tmp_path):
    """INFERENCE.ON_DEVICE_SCAN writes the same r2r prediction structure as
    the host inference loop: pose infos starting at the episode start state,
    ending with stop=True (or the step cap), and every episode present."""
    import json

    tmp = str(tmp_path)
    cfg = get_config(opts=base_opts(tmp))
    trainer = registry.get_trainer("dagger")(cfg)
    trainer.train()
    ckpt = f"{tmp}/ckpts/ckpt.0.ckpt"

    cfg_dev = get_config(opts=base_opts(tmp, [
        "INFERENCE.CKPT_PATH", ckpt,
        "INFERENCE.SPLIT", "val_unseen",
        "INFERENCE.USE_CKPT_CONFIG", False,
        "INFERENCE.FORMAT", "r2r",
        "INFERENCE.PREDICTIONS_FILE", f"{tmp}/preds_dev.json",
        "INFERENCE.ON_DEVICE_SCAN", True,
        "TASK_CONFIG.DATASET.NUM_EPISODES", 3,
        "EVAL.SCAN_BATCH", 2,
        "EVAL.SCAN_SEGMENT", 4,
    ]))
    registry.get_trainer("dagger")(cfg_dev).inference()
    with open(f"{tmp}/preds_dev.json") as f:
        preds = json.load(f)
    assert len(preds) == 3
    max_steps = int(cfg_dev.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS)
    for ep_id, steps in preds.items():
        assert len(steps) >= 2
        for s in steps:
            assert "position" in s and "heading" in s and "stop" in s
        assert not steps[0]["stop"]
        assert steps[-1]["stop"] or len(steps) - 1 >= max_steps


def test_on_device_dagger_matches_host_store(tmp_path):
    """TPU.ON_DEVICE_DAGGER collects the same teacher-forcing trajectories
    as the host env-pool loop: identical store schema (keys/shapes/dtypes)
    and, at beta=1, identical expert action sequences per episode."""
    from vlnce_tpu.data.trajectory_store import TrajectoryStoreReader, store_length

    stores = {}
    for tag, extra in (
        ("host", []),
        ("device", ["TPU.ON_DEVICE_DAGGER", True]),
    ):
        tmp = str(tmp_path / tag)
        cfg = get_config(opts=base_opts(tmp, [
            "TASK_CONFIG.DATASET.NUM_EPISODES", 4,
            "IL.DAGGER.update_size", 4,
            "IL.DAGGER.lmdb_features_dir", f"{tmp}/traj",
        ] + extra))
        trainer = registry.get_trainer("dagger")(cfg)
        trainer.train()
        n = store_length(f"{tmp}/traj")
        reader = TrajectoryStoreReader(f"{tmp}/traj")
        stores[tag] = [reader.get(i) for i in range(n)]
        reader.close()
        assert os.path.exists(f"{tmp}/ckpts/ckpt.0.ckpt")

    assert len(stores["host"]) == len(stores["device"]) == 4
    host_keys = set(stores["host"][0][0].keys())
    dev_keys = set(stores["device"][0][0].keys())
    assert host_keys == dev_keys, (host_keys, dev_keys)

    def sig(entry):
        obs, prev, oracle = entry
        return tuple(oracle.tolist())

    host_sigs = sorted(sig(e) for e in stores["host"])
    dev_sigs = sorted(sig(e) for e in stores["device"])
    assert host_sigs == dev_sigs
    # prev_actions = oracle shifted by one at beta=1
    for obs, prev, oracle in stores["device"]:
        assert prev[0] == 0
        np.testing.assert_array_equal(prev[1:], oracle[:-1])
        for k in host_keys:
            assert obs[k].shape[0] == len(oracle), k
            assert obs[k].dtype == stores["host"][0][0][k].dtype, k


def _recollect_cfg(tmp, extra=None):
    return get_config(opts=base_opts(tmp, [
        "TASK_CONFIG.DATASET.NUM_EPISODES", 4,
        "IL.RECOLLECT_TRAINER.trajectories_file", f"{tmp}/trajectories.json.gz",
        "IL.RECOLLECT_TRAINER.gt_file", f"{tmp}/missing_gt.json.gz",
        "IL.RECOLLECT_TRAINER.preload_size", 2,
        "IL.batch_size", 2,
        "IL.epochs", 1,
    ] + (extra or [])))


def test_recollect_trainer_end_to_end(tmp_path):
    """Recollect trainer (RxR challenge baseline): GT derivation from the
    oracle, live re-simulation, one training epoch, checkpoint written."""
    tmp = str(tmp_path)
    cfg = _recollect_cfg(tmp)
    trainer = registry.get_trainer("recollect_trainer")(cfg)
    trainer.train()
    assert os.path.exists(f"{tmp}/ckpts/ckpt.0.ckpt")


def test_recollect_device_episodes_rank_split(tmp_path):
    """The recollect device-episode shard is rank_slice of the full list:
    strided, disjoint, wrap-padded to equal counts. Stride semantics are
    checked here directly against rank_slice's explicit (rank, nproc) args
    (no monkeypatched jax globals); the REAL 2-process execution of this
    split is tests/test_multiprocess_train.py::
    test_two_process_resident_recollect_rank_sharded."""
    from vlnce_tpu.data.recollection import TeacherRecollectionDataset
    from vlnce_tpu.parallel.distributed import rank_slice

    cfg = _recollect_cfg(str(tmp_path), ["TPU.ON_DEVICE_RECOLLECT", True])
    full = TeacherRecollectionDataset(cfg)
    all_ids = [ep.episode_id for ep in full._device_episodes]
    assert len(all_ids) == 4

    shards = {r: rank_slice(all_ids, rank=r, nproc=2) for r in (0, 1)}
    assert shards[0] == all_ids[0::2]
    assert shards[1] == all_ids[1::2]
    assert not (set(shards[0]) & set(shards[1]))
    # wrap-padding keeps per-rank counts equal on uneven splits
    uneven = rank_slice(all_ids[:3], rank=1, nproc=2)
    assert len(uneven) == len(rank_slice(all_ids[:3], rank=0, nproc=2)) == 2


def test_recollect_on_device_matches_host_episodes(tmp_path):
    """TPU.ON_DEVICE_RECOLLECT re-renders GT trajectories on device; the
    yielded episodes match the env-pool re-simulation: identical GT action
    sequences and weights, near-identical rendered observations."""
    from vlnce_tpu.data.recollection import TeacherRecollectionDataset

    tmp = str(tmp_path)
    eps_by_sig = {}
    for tag, extra in (("host", []), ("device", ["TPU.ON_DEVICE_RECOLLECT", True])):
        cfg = _recollect_cfg(tmp, extra)
        ds = TeacherRecollectionDataset(cfg)
        it = ds.episodes()
        collected = {}
        for _ in range(ds.length):
            obs, prev, oracle, w = next(it)
            key = (tuple(oracle.tolist()), tuple(obs["instruction"][0].tolist()))
            collected[key] = (obs, prev, w)
        ds.close_sims()
        eps_by_sig[tag] = collected

    assert eps_by_sig["host"].keys() == eps_by_sig["device"].keys()
    for sig in eps_by_sig["host"]:
        h_obs, h_prev, h_w = eps_by_sig["host"][sig]
        d_obs, d_prev, d_w = eps_by_sig["device"][sig]
        np.testing.assert_array_equal(h_prev, d_prev)
        np.testing.assert_allclose(h_w, d_w)
        for k in ("rgb", "depth", "progress", "instruction"):
            assert k in d_obs, k
            assert d_obs[k].shape == h_obs[k].shape, k
        # renderer parity: uint8 shading can differ by 1; a hairline of
        # wall-edge pixels may flip
        diff = np.abs(d_obs["rgb"].astype(int) - h_obs["rgb"].astype(int))
        assert float((diff > 1).mean()) < 0.02
        np.testing.assert_allclose(d_obs["depth"], h_obs["depth"], atol=1e-3)
        np.testing.assert_allclose(d_obs["progress"], h_obs["progress"], atol=1e-4)


def test_recollect_trainer_on_device_end_to_end(tmp_path):
    """Recollect trainer trains to a checkpoint with TPU.ON_DEVICE_RECOLLECT
    (device-rendered episodes feeding the same batch/update machinery)."""
    tmp = str(tmp_path)
    cfg = _recollect_cfg(tmp, ["TPU.ON_DEVICE_RECOLLECT", True])
    trainer = registry.get_trainer("recollect_trainer")(cfg)
    trainer.train()
    assert os.path.exists(f"{tmp}/ckpts/ckpt.0.ckpt")


def test_device_dagger_segment_cache_per_policy(tmp_path):
    """The jitted segment cache lives on the policy object: a second collect
    with the same policy reuses the compiled closure; a different policy gets
    its own cache (no id()-reuse aliasing possible), and the per-policy cache
    stays bounded."""
    from gymnasium import spaces as gspaces

    from vlnce_tpu.models.cma_policy import CMAPolicy
    from vlnce_tpu.ops.obs_transforms import get_active_obs_transforms
    from vlnce_tpu.tasks.datasets import make_dataset
    from vlnce_tpu.trainers import device_dagger
    from vlnce_tpu.trainers.device_dagger import collect_episodes_on_device

    cfg = get_config(opts=base_opts(str(tmp_path), [
        "TASK_CONFIG.DATASET.NUM_EPISODES", 2,
        "NUM_ENVIRONMENTS", 2,
    ]))
    episodes = list(
        make_dataset("Synthetic-VLN-v0", cfg.TASK_CONFIG.DATASET).episodes
    )[:2]
    space = gspaces.Dict({
        "rgb": gspaces.Box(0, 255, (IMG, IMG, 3), np.uint8),
        "depth": gspaces.Box(0, 1, (IMG, IMG, 1), np.float32),
        "instruction": gspaces.Box(0, 10000, (200,), np.int32),
        "progress": gspaces.Box(0, 1, (1,), np.float32),
    })
    transforms = get_active_obs_transforms(cfg)

    def collect(policy):
        return collect_episodes_on_device(
            policy, transforms, cfg, episodes, 1.0, jax.random.PRNGKey(0)
        )

    pol_a = CMAPolicy.from_config(cfg, space, gspaces.Discrete(4))
    pol_a.init_params(jax.random.PRNGKey(0), batch_size=2)
    res_a = collect(pol_a)
    cache_a = getattr(pol_a, device_dagger._CACHE_ATTR)
    assert len(cache_a) == 1
    jit_fn = next(iter(cache_a.values()))[0]
    collect(pol_a)  # same shapes: must be a cache hit, not a new closure
    assert next(iter(cache_a.values()))[0] is jit_fn

    pol_b = CMAPolicy.from_config(cfg, space, gspaces.Discrete(4))
    pol_b.init_params(jax.random.PRNGKey(1), batch_size=2)
    res_b = collect(pol_b)
    cache_b = getattr(pol_b, device_dagger._CACHE_ATTR)
    assert cache_b is not cache_a  # per-policy, never shared
    assert len(res_a) == len(res_b) == 2

    # bound: the eviction runs on insert — drop the real entry, pre-fill with
    # dummies, and force a re-insert; the cache must never grow past max
    cache_b.clear()
    for i in range(device_dagger._CACHE_MAX + 2):
        cache_b[("dummy", i)] = (None, {})
    collect(pol_b)
    assert len(cache_b) <= device_dagger._CACHE_MAX


def test_dagger_resident_training_matches_store_losses(tmp_path):
    """TPU.DAGGER_RESIDENT (fused collect->train, features HBM-resident)
    produces the same per-batch training losses as the store round-trip
    path: same collected trajectories, same iterate_episode_keys batching,
    bit-equal batch tensors at every weighted step."""
    losses = {}
    for tag, extra in (
        ("store", ["TPU.ON_DEVICE_DAGGER", True]),
        ("resident", ["TPU.ON_DEVICE_DAGGER", True, "TPU.DAGGER_RESIDENT", True]),
    ):
        tmp = str(tmp_path / tag)
        cfg = get_config(opts=base_opts(tmp, [
            "TASK_CONFIG.DATASET.NUM_EPISODES", 4,
            "IL.DAGGER.update_size", 4,
            "IL.epochs", 2,
            "IL.DAGGER.lmdb_features_dir", f"{tmp}/traj",
        ] + extra))
        trainer = registry.get_trainer("dagger")(cfg)
        rec = []
        orig = trainer._update_agent

        def wrapped(*a, _orig=orig, _rec=rec, **kw):
            out = _orig(*a, **kw)
            _rec.append(out)
            return out

        trainer._update_agent = wrapped
        trainer.train()
        losses[tag] = np.asarray(rec)
        assert len(rec) == 4  # 2 epochs x 2 batches

    np.testing.assert_allclose(
        losses["resident"], losses["store"], rtol=2e-6, atol=1e-7
    )


def test_dagger_fused_epoch_scan_matches_per_batch(tmp_path):
    """TPU.RESIDENT_EPOCH_SCAN (whole epoch as lax.scan programs, gather +
    update fused per step) trains with the same per-batch losses as the
    per-batch resident path: same batch composition/order (shared
    _epoch_batches stream), same update math (production loss_and_grads)."""
    losses = {}
    for tag, extra in (
        ("per_batch", []),
        ("fused", ["TPU.RESIDENT_EPOCH_SCAN", True]),
        # sharded fused: the scan body's shard_map psums over a 4-way mesh
        ("fused_sharded", ["TPU.RESIDENT_EPOCH_SCAN", True,
                           "TPU.MESH.DATA", 4, "IL.batch_size", 4,
                           "NUM_ENVIRONMENTS", 4]),
    ):
        tmp = str(tmp_path / tag)
        cfg = get_config(opts=base_opts(tmp, [
            "TASK_CONFIG.DATASET.NUM_EPISODES", 4,
            "IL.DAGGER.update_size", 4,
            "IL.epochs", 2,
            "IL.DAGGER.lmdb_features_dir", f"{tmp}/traj",
            "TPU.ON_DEVICE_DAGGER", True,
            "TPU.DAGGER_RESIDENT", True,
        ] + extra))
        trainer = registry.get_trainer("dagger")(cfg)
        rec = []
        orig_update = trainer._update_agent
        orig_fused = trainer._run_fused_epoch

        def wrapped_update(*a, _orig=orig_update, _rec=rec, **kw):
            out = _orig(*a, **kw)
            _rec.append(out[0])
            return out

        def wrapped_fused(riter, _orig=orig_fused, _rec=rec):
            triples = _orig(riter)
            _rec.extend(t[0] for t in triples)
            return triples

        trainer._update_agent = wrapped_update
        trainer._run_fused_epoch = wrapped_fused
        trainer.train()
        losses[tag] = np.asarray(rec)

    assert len(losses["per_batch"]) == 4  # 2 epochs x 2 batches
    np.testing.assert_allclose(
        losses["fused"], losses["per_batch"], rtol=2e-6, atol=1e-7
    )
    # sharded fused uses batch_size 4 -> 1 batch/epoch; its first-epoch
    # first-batch loss (fresh params, full dataset batch) must be finite
    # and its training must have run fused (2 batches over 2 epochs)
    assert len(losses["fused_sharded"]) == 2
    assert np.isfinite(losses["fused_sharded"]).all()


def test_dagger_resident_sharded_collection_matches_single_device(tmp_path):
    """Resident collect->train with the env axis sharded over the data mesh
    (TPU.MESH.DATA=4): the collection scan runs pjit over 4 virtual devices,
    the bank is built mesh-replicated, and the bank contents + per-batch
    training losses match the single-device run (sharding never changes JAX
    values; only placement)."""
    losses, banks = {}, {}
    for tag, extra in (("single", []), ("sharded", ["TPU.MESH.DATA", 4])):
        tmp = str(tmp_path / tag)
        cfg = get_config(opts=base_opts(tmp, [
            "TASK_CONFIG.DATASET.NUM_EPISODES", 4,
            "NUM_ENVIRONMENTS", 4,
            "IL.DAGGER.update_size", 4,
            "IL.epochs", 2,
            "IL.DAGGER.lmdb_features_dir", f"{tmp}/traj",
            "TPU.ON_DEVICE_DAGGER", True,
            "TPU.DAGGER_RESIDENT", True,
        ] + extra))
        trainer = registry.get_trainer("dagger")(cfg)
        rec = []
        orig = trainer._update_agent

        def wrapped(*a, _orig=orig, _rec=rec, **kw):
            out = _orig(*a, **kw)
            _rec.append(out)
            return out

        trainer._update_agent = wrapped
        trainer.train()
        losses[tag] = np.asarray(rec)
        banks[tag] = trainer._bank

    single, sharded = banks["single"], banks["sharded"]
    # the sharded bank must actually live on the mesh (replicated over 4
    # devices), not have silently fallen back to device 0
    assert len(sharded.prev.sharding.device_set) == 4
    np.testing.assert_array_equal(single.lengths, sharded.lengths)
    oracle_s = np.asarray(single.oracle)
    oracle_m = np.asarray(sharded.oracle)
    for e in range(len(single)):
        ls, lm = int(single.offsets[e]), int(sharded.offsets[e])
        T = int(single.lengths[e])
        np.testing.assert_array_equal(
            oracle_s[ls : ls + T], oracle_m[lm : lm + T]
        )
        for k in single.data:
            np.testing.assert_allclose(
                np.asarray(single.data[k][ls : ls + T], np.float32),
                np.asarray(sharded.data[k][lm : lm + T], np.float32),
                atol=1e-4, err_msg=k,
            )
    np.testing.assert_allclose(
        losses["sharded"], losses["single"], rtol=1e-4, atol=1e-6
    )


def test_dagger_resident_archive_store_roundtrip(tmp_path):
    """DAGGER_ARCHIVE_STORE writes the bank to the trajectory store in the
    host schema; a bank rebuilt from that store matches the original."""
    from vlnce_tpu.data.device_bank import DeviceTrajectoryBank
    from vlnce_tpu.data.trajectory_store import TrajectoryStoreReader, store_length

    tmp = str(tmp_path)
    cfg = get_config(opts=base_opts(tmp, [
        "TASK_CONFIG.DATASET.NUM_EPISODES", 4,
        "IL.DAGGER.update_size", 4,
        "IL.DAGGER.lmdb_features_dir", f"{tmp}/traj",
        "TPU.ON_DEVICE_DAGGER", True,
        "TPU.DAGGER_RESIDENT", True,
        "TPU.DAGGER_ARCHIVE_STORE", True,
    ]))
    trainer = registry.get_trainer("dagger")(cfg)
    trainer.train()
    assert store_length(f"{tmp}/traj") == 4

    bank = trainer._bank
    reader = TrajectoryStoreReader(f"{tmp}/traj")
    rebuilt = DeviceTrajectoryBank.from_store(reader)
    reader.close()
    assert len(rebuilt) == len(bank)
    np.testing.assert_array_equal(rebuilt.lengths, bank.lengths)
    # a store-rebuilt bank packs rows densely while the collected bank keeps
    # chunk-tail padding — offsets differ by design; the EPISODE rows must
    # match exactly (the store wrote f32 from f16 storage, so exact)
    oracle_a = np.asarray(rebuilt.oracle)
    oracle_b = np.asarray(bank.oracle)
    for e in range(len(bank)):
        ra, rb = int(rebuilt.offsets[e]), int(bank.offsets[e])
        T = int(bank.lengths[e])
        np.testing.assert_array_equal(oracle_a[ra : ra + T], oracle_b[rb : rb + T])
        for k in bank.data:
            a = np.asarray(rebuilt.data[k][ra : ra + T]).astype(np.float32)
            b = np.asarray(bank.data[k][rb : rb + T]).astype(np.float32)
            np.testing.assert_allclose(a, b, atol=1e-3)


def test_recollect_resident_matches_host_losses(tmp_path):
    """TPU.RECOLLECT_RESIDENT (fused render->train) matches the wire path's
    per-batch losses: same GT trajectories, same batch composition. Not
    bit-equal — the wire path quantizes depth through f16 while the resident
    path keeps the render exact — so compare at f16-quantization tolerance."""
    losses = {}
    for tag, extra in (
        ("wire", ["TPU.ON_DEVICE_RECOLLECT", True]),
        ("resident", ["TPU.ON_DEVICE_RECOLLECT", True, "TPU.RECOLLECT_RESIDENT", True]),
    ):
        tmp = str(tmp_path / tag)
        cfg = _recollect_cfg(tmp, ["IL.epochs", 1] + extra)
        trainer = registry.get_trainer("recollect_trainer")(cfg)
        rec = []
        orig = trainer._build_accum_step

        def wrapped_build(apply, _orig=orig, _rec=rec, **kw):
            step = _orig(apply, **kw)

            def step_recording(*a):
                out = step(*a)
                _rec.append(float(out[3]))
                return out

            return step_recording

        trainer._build_accum_step = wrapped_build
        trainer.train()
        losses[tag] = np.asarray(rec)
        assert len(rec) == 2  # 4 episodes / batch 2

    np.testing.assert_allclose(
        losses["resident"], losses["wire"], rtol=2e-3, atol=1e-4
    )


def test_recollect_resident_sharded_matches_single_device(tmp_path):
    """Sharded resident recollection (render scan's env axis over a 4-way
    data mesh, emitted batch leaves arriving env-sharded into the sharded
    accum step) produces the same per-batch losses as the single-device
    resident run."""
    losses = {}
    for tag, extra in (("single", []), ("sharded", ["TPU.MESH.DATA", 4])):
        tmp = str(tmp_path / tag)
        cfg = _recollect_cfg(tmp, [
            "IL.epochs", 1,
            "IL.batch_size", 4,
            "IL.RECOLLECT_TRAINER.preload_size", 4,
            "TPU.ON_DEVICE_RECOLLECT", True,
            "TPU.RECOLLECT_RESIDENT", True,
        ] + extra)
        trainer = registry.get_trainer("recollect_trainer")(cfg)
        rec = []
        orig = trainer._build_accum_step

        def wrapped_build(apply, _orig=orig, _rec=rec, **kw):
            step = _orig(apply, **kw)

            def step_recording(*a):
                out = step(*a)
                _rec.append(float(out[3]))
                return out

            return step_recording

        trainer._build_accum_step = wrapped_build
        trainer.train()
        losses[tag] = np.asarray(rec)
        assert len(rec) == 1  # 4 episodes / batch 4

    np.testing.assert_allclose(
        losses["sharded"], losses["single"], rtol=1e-4, atol=1e-6
    )


def test_device_dagger_beta_mixing_statistics(tmp_path):
    """At beta=0.5 the device collection's executed-vs-expert agreement rate
    must satisfy agree(0.5) ~= 0.5 + 0.5 * agree(0) — the expert fraction of
    the beta mix is beta, with the policy-agrees-by-chance confound measured
    by the beta=0 run (same policy, same seeds, same episodes). VERDICT r2
    next #6; reference mix semantics dagger_trainer.py:414-418.

    Episode SELECTION also differs from the host pool by design: the device
    path takes the first update_size episodes in dataset order while the
    host pool round-robins scene-split iterators — documented in
    trainers/device_dagger.py (collection is per-episode independent, so the
    trajectory DISTRIBUTION per episode is unchanged; only which episodes
    are visited differs, and at update_size >= dataset size they coincide).
    """
    from gymnasium import spaces as gspaces

    from vlnce_tpu.models.cma_policy import CMAPolicy
    from vlnce_tpu.ops.obs_transforms import get_active_obs_transforms
    from vlnce_tpu.tasks.datasets import make_dataset
    from vlnce_tpu.trainers.device_dagger import collect_episodes_on_device

    n_eps = 64  # beta=0 episodes are short (untrained policy stops early);
    # this many gives >150 executed steps on both runs
    cfg = get_config(opts=base_opts(str(tmp_path), [
        "TASK_CONFIG.DATASET.NUM_EPISODES", n_eps,
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", 20,
        "NUM_ENVIRONMENTS", 16,
    ]))
    episodes = list(
        make_dataset("Synthetic-VLN-v0", cfg.TASK_CONFIG.DATASET).episodes
    )[:n_eps]
    space = gspaces.Dict({
        "rgb": gspaces.Box(0, 255, (IMG, IMG, 3), np.uint8),
        "depth": gspaces.Box(0, 1, (IMG, IMG, 1), np.float32),
        "instruction": gspaces.Box(0, 10000, (200,), np.int32),
        "progress": gspaces.Box(0, 1, (1,), np.float32),
    })
    transforms = get_active_obs_transforms(cfg)
    policy = CMAPolicy.from_config(cfg, space, gspaces.Discrete(4))
    policy.init_params(jax.random.PRNGKey(0), batch_size=16)

    def agreement(beta: float) -> tuple:
        res = collect_episodes_on_device(
            policy, transforms, cfg, episodes, beta, jax.random.PRNGKey(42)
        )
        agree = total = 0
        for _, prev, oracle in res:
            executed = prev[1:]  # prev_action at t+1 = action executed at t
            agree += int((executed == oracle[:-1]).sum())
            total += len(executed)
        return agree / max(total, 1), total

    a0, n0 = agreement(0.0)
    a5, n5 = agreement(0.5)
    assert n0 > 150 and n5 > 100, (n0, n5)  # enough steps for statistics
    expected = 0.5 + 0.5 * a0
    # binomial std at n>=100 is <0.05; 0.09 gives ~2 sigma against the
    # trajectory-divergence noise between the two runs
    assert abs(a5 - expected) < 0.09, (a5, expected, a0)
    # sanity: mixing in the expert must RAISE agreement over pure policy
    assert a5 > a0 + 0.15, (a5, a0)


def test_device_dagger_stop_on_segment_boundary(tmp_path):
    """An episode whose STOP lands on the LAST step of the final scan segment
    never gets a done flag into done_before (flags record the before-step
    state and the loop exits on the after-state). The length fallback must be
    the recorded row count, not MAX_EPISODE_STEPS — with the T_max fallback
    the store path wrote instruction rows for unrecorded steps and the
    resident bank trained on duplicated garbage rows."""
    from gymnasium import spaces as gspaces

    from vlnce_tpu.models.cma_policy import CMAPolicy
    from vlnce_tpu.ops.obs_transforms import get_active_obs_transforms
    from vlnce_tpu.tasks.datasets import make_dataset
    from vlnce_tpu.trainers.device_dagger import collect_episodes_on_device

    def collect(seg_len, episodes, cfg, policy, transforms):
        cfg = cfg.clone()
        cfg.defrost()
        cfg.TPU.DAGGER_SEGMENT = seg_len
        cfg.freeze()
        return collect_episodes_on_device(
            policy, transforms, cfg, episodes, 1.0, jax.random.PRNGKey(0)
        )

    cfg = get_config(opts=base_opts(str(tmp_path), [
        "TASK_CONFIG.DATASET.NUM_EPISODES", 1,
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", 64,
        "NUM_ENVIRONMENTS", 1,
    ]))
    episodes = list(
        make_dataset("Synthetic-VLN-v0", cfg.TASK_CONFIG.DATASET).episodes
    )[:1]
    space = gspaces.Dict({
        "rgb": gspaces.Box(0, 255, (IMG, IMG, 3), np.uint8),
        "depth": gspaces.Box(0, 1, (IMG, IMG, 1), np.float32),
        "instruction": gspaces.Box(0, 10000, (200,), np.int32),
        "progress": gspaces.Box(0, 1, (1,), np.float32),
    })
    policy = CMAPolicy.from_config(cfg, space, gspaces.Discrete(4))
    policy.init_params(jax.random.PRNGKey(0), batch_size=1)
    transforms = get_active_obs_transforms(cfg)

    # reference collection: segment longer than any episode
    ref_obs, ref_prev, ref_oracle = collect(64, episodes, cfg, policy, transforms)[0]
    L = len(ref_prev)
    assert 2 <= L < 64, L

    # STOP on the exact last step of the final segment: seg_len == L
    obs, prev, oracle = collect(L, episodes, cfg, policy, transforms)[0]
    np.testing.assert_array_equal(prev, ref_prev)
    np.testing.assert_array_equal(oracle, ref_oracle)
    for k in ref_obs:
        assert obs[k].shape == ref_obs[k].shape, (k, obs[k].shape, ref_obs[k].shape)


def test_waypoint_eval_video_with_overlays(tmp_path):
    """Waypoint eval with VIDEO_OPTION writes frames through the full
    overlay compositor (pano probs, stop gauge, step stats, instruction
    panel — utils/video.py:waypoint_observations_to_image)."""
    tmp = str(tmp_path)
    opts = [
        "BASE_TASK_CONFIG_PATH", "vlnce_tpu/tasks/config/vlnce_waypoint_task.yaml",
        "TRAINER_NAME", "ddppo-waypoint",
        "ENV_NAME", "VLNCEWaypointEnv",
        "TASK_CONFIG.DATASET.TYPE", "Synthetic-VLN-v0",
        "TASK_CONFIG.DATASET.NUM_EPISODES", 2,
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", 3,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", IMG,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", IMG,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", IMG,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", IMG,
        "TASK_CONFIG.TASK.MEASUREMENTS", "['DISTANCE_TO_GOAL','SUCCESS','SPL','NDTW','PATH_LENGTH','ORACLE_SUCCESS','STEPS_TAKEN','WAYPOINT_REWARD_MEASURE','TOP_DOWN_MAP_VLNCE']",
        "NUM_ENVIRONMENTS", 2,
        "TENSORBOARD_DIR", "",
        "CHECKPOINT_FOLDER", f"{tmp}/ckpts",
        "RESULTS_DIR", f"{tmp}/evals",
        "VIDEO_OPTION", "['disk']",
        "VIDEO_DIR", f"{tmp}/videos",
        "EVAL.EPISODE_COUNT", 2,
        "EVAL.SPLIT", "val_unseen",
        "EVAL.USE_CKPT_CONFIG", False,
        "RL.POLICY.OBS_TRANSFORMS.ENABLED_TRANSFORMS", "[ObsStack]",
        "MODEL.policy_name", "WaypointPolicy",
        "MODEL.DEPTH_ENCODER.backbone", "resnet18",
        "MODEL.RGB_ENCODER.cnn_type", "TorchVisionResNet18",
        "MODEL.RGB_ENCODER.output_size", 64,
        "MODEL.STATE_ENCODER.hidden_size", 64,
        "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False,
        "MODEL.INSTRUCTION_ENCODER.vocab_size", 64,
        "MODEL.INSTRUCTION_ENCODER.bidirectional", True,
        "MODEL.INSTRUCTION_ENCODER.final_state_only", False,
    ]
    cfg = get_config(opts=opts)
    trainer = registry.get_trainer("ddppo-waypoint")(cfg)
    trainer._eval_checkpoint(f"{tmp}/no_ckpt.ckpt", _NullWriter(), 0)
    vids = os.listdir(f"{tmp}/videos")
    assert vids, "no eval videos written"
