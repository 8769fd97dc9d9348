"""Trainer integration tests: mini DAgger train -> eval, waypoint PPO update.

Tiny encoders/images keep CPU compile time bounded; these guard the full
collection -> store -> jitted-update -> checkpoint -> eval pipeline.
"""

import os

import numpy as np
import pytest

import jax

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
