"""Precomputed visual feature bank (data/feature_bank.py): the route by
which real scenes ride the device-resident scan paths (VERDICT r2 next #3).

Fast tier: schema round trip + exact lookup semantics. Slow tier: the
generator script produces banks for synthetic scenes and scan-eval runs
end-to-end consuming them instead of raycasts.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlnce_tpu.data.feature_bank import (
    FeatureBankBatch,
    load_bank_batch,
    lookup_features,
    save_scene_bank,
)

IMG = 16


def _toy_bank(tmp_path, scene="sceneA", M=3, H=4, Fr=6, Fd=4):
    rng = np.random.RandomState(0)
    node_pos = np.asarray([[1.0, 1.0], [3.0, 1.0], [1.0, 5.0]], np.float32)[:M]
    rgb = rng.rand(M, H, Fr).astype(np.float16)
    depth = rng.rand(M, H, Fd).astype(np.float16)
    save_scene_bank(
        os.path.join(str(tmp_path), f"{scene}.npz"),
        node_pos, rgb, depth, (Fr,), (Fd,),
    )
    return node_pos, rgb, depth


def test_bank_roundtrip_and_exact_lookup(tmp_path):
    node_pos, rgb, depth = _toy_bank(tmp_path)

    class Ep:
        scene_id = "sceneA"

    # exact-M load (no bucket padding) for the roundtrip check
    bank = load_bank_batch(str(tmp_path), [Ep(), Ep()], m_quantum=1)
    assert bank.node_pos.shape == (2, 3, 2)
    assert bank.rgb_shape == (6,) and bank.depth_shape == (4,)

    # production default buckets M so chunks over different scenes share a
    # compiled shape (exact-M padding retraced the eval segment per chunk)
    bucketed = load_bank_batch(str(tmp_path), [Ep()])
    assert bucketed.node_pos.shape[1] == 64
    assert bool(np.all(np.asarray(bucketed.node_pos)[:, 3:] >= 1e8))  # padding far away

    # poses exactly at node 1 / heading bin 3 (H=4 -> bin width pi/2)
    pos = jnp.asarray([[3.0, 0.0, 1.0], [1.0, 0.0, 5.0]], jnp.float32)
    heading = jnp.asarray([3 * np.pi / 2, 0.0], jnp.float32)
    out = lookup_features(bank, pos, heading)
    np.testing.assert_allclose(
        np.asarray(out["rgb_features"][0]), rgb[1, 3].astype(np.float32), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["depth_features"][1]), depth[2, 0].astype(np.float32), rtol=1e-6
    )

    # off-center pose snaps to the nearest node; heading wraps modulo 2pi
    pos2 = jnp.asarray([[2.9, 0.0, 1.3]], jnp.float32)
    heading2 = jnp.asarray([2 * np.pi + np.pi / 2 + 0.1], jnp.float32)
    out2 = lookup_features(
        FeatureBankBatch(bank.node_pos[:1], bank.rgb[:1], bank.depth[:1],
                         bank.rgb_shape, bank.depth_shape),
        pos2, heading2,
    )
    np.testing.assert_allclose(
        np.asarray(out2["rgb_features"][0]), rgb[1, 1].astype(np.float32), rtol=1e-6
    )


def test_lookup_never_selects_padding_nodes(tmp_path):
    """Mixed-M batches pad node axes at +1e9: a pose anywhere in-world must
    select a real node."""
    _toy_bank(tmp_path, scene="big", M=3)
    _toy_bank(tmp_path, scene="small", M=1)

    class EpBig:
        scene_id = "big"

    class EpSmall:
        scene_id = "small"

    bank = load_bank_batch(str(tmp_path), [EpBig(), EpSmall()], m_quantum=1)
    assert bank.node_pos.shape[1] == 3  # padded to max M
    pos = jnp.asarray([[100.0, 0.0, 100.0]] * 2, jnp.float32)
    out = lookup_features(bank, pos, jnp.zeros((2,), jnp.float32))
    # the small scene has one real node: features must be that node's row
    with np.load(os.path.join(str(tmp_path), "small.npz")) as z:
        expected = z["rgb_features"][0, 0].astype(np.float32)
    np.testing.assert_allclose(np.asarray(out["rgb_features"][1]), expected, rtol=1e-6)


@pytest.mark.slow
def test_generate_and_scan_eval_with_bank(tmp_path, monkeypatch):
    """scripts/generate_feature_bank.py writes banks for the synthetic
    scenes, then scan-eval consumes them (TPU.FEATURE_BANK_DIR) instead of
    raycasting — the full precompute->closed-loop pipeline."""
    import sys

    import vlnce_tpu.models  # noqa: F401
    import vlnce_tpu.tasks  # noqa: F401
    import vlnce_tpu.trainers  # noqa: F401
    from vlnce_tpu.config import get_config
    from vlnce_tpu.envs import ensure_registered
    from vlnce_tpu.registry import registry

    ensure_registered()
    tmp = str(tmp_path)
    bank_dir = f"{tmp}/banks"
    common_opts = [
        "TASK_CONFIG.DATASET.NUM_EPISODES", "4",
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "6",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", str(IMG),
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", str(IMG),
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", str(IMG),
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", str(IMG),
        "IL.DAGGER.lmdb_features_dir", f"{tmp}/traj",
        "RESULTS_DIR", f"{tmp}/evals",
        "CHECKPOINT_FOLDER", f"{tmp}/ckpts",
        "EVAL_CKPT_PATH_DIR", f"{tmp}/ckpts",
    ]

    from scripts.generate_feature_bank import main as gen_main

    monkeypatch.setattr(sys, "argv", [
        "generate_feature_bank.py",
        "--exp-config", "vlnce_tpu/config/experiments/synthetic/smoke_seq2seq.yaml",
        "--bank-dir", bank_dir,
        "--headings", "8",
        "--spacing", "4.0",
        "--chunk", "64",
    ] + common_opts + ["TASK_CONFIG.DATASET.SPLIT", "val_unseen"])
    gen_main()
    banks = [f for f in os.listdir(bank_dir) if f.endswith(".npz")]
    assert banks, "no banks written"

    cfg = get_config(
        "vlnce_tpu/config/experiments/synthetic/smoke_seq2seq.yaml",
        opts=common_opts + [
            "EVAL.ON_DEVICE_SCAN", True,
            "EVAL.SCAN_BATCH", 3,
            "EVAL.SCAN_SEGMENT", 4,
            "EVAL.EPISODE_COUNT", 4,
            "EVAL.USE_CKPT_CONFIG", False,
            "TPU.FEATURE_BANK_DIR", bank_dir,
        ],
    )

    class _NullWriter:
        def add_scalar(self, *a, **k):
            pass

    trainer = registry.get_trainer("dagger")(cfg)
    stats = trainer._eval_checkpoint(f"{tmp}/nonexistent.ckpt", _NullWriter(), 0)
    assert stats is not None
    for key in ("success", "spl", "ndtw", "steps_taken"):
        assert key in stats and np.isfinite(stats[key]), (key, stats)
    fname = f"{tmp}/evals/stats_ckpt_0_val_unseen.json"
    assert os.path.exists(fname)
    with open(fname) as f:
        json.load(f)

    # sharded bank eval: the bank arrays shard over the data mesh with the
    # rest of the segment inputs (scan_eval in_shardings) and the metrics
    # must match the single-device run exactly (deterministic eval)
    cfg_sharded = get_config(
        "vlnce_tpu/config/experiments/synthetic/smoke_seq2seq.yaml",
        opts=common_opts + [
            "RESULTS_DIR", f"{tmp}/evals_sharded",  # a pre-existing stats
            # JSON makes eval skip the checkpoint and return None
            "EVAL.ON_DEVICE_SCAN", True,
            "EVAL.SCAN_BATCH", 4,
            "EVAL.SCAN_SEGMENT", 4,
            "EVAL.EPISODE_COUNT", 4,
            "EVAL.USE_CKPT_CONFIG", False,
            "TPU.FEATURE_BANK_DIR", bank_dir,
            "TPU.MESH.DATA", 4,
        ],
    )
    trainer_s = registry.get_trainer("dagger")(cfg_sharded)
    stats_s = trainer_s._eval_checkpoint(f"{tmp}/nonexistent.ckpt", _NullWriter(), 0)
    for key in ("success", "spl", "ndtw"):
        np.testing.assert_allclose(stats_s[key], stats[key], atol=1e-5, err_msg=key)


@pytest.mark.slow
def test_resident_dagger_with_bank_matches_expert_trajectories(tmp_path, monkeypatch):
    """Resident DAgger collection with TPU.FEATURE_BANK_DIR consumes bank
    lookups instead of raycasts (real scenes on the fused collect->train
    loop). The device expert steers off the scene geometry, not the
    observations, so at beta=1 the collected trajectories (lengths, oracle
    and prev-action rows) are IDENTICAL to the render-driven collection;
    only the recorded features change — to the bank's own shapes/values."""
    import sys

    from gymnasium import spaces as gspaces

    import vlnce_tpu.models  # noqa: F401
    import vlnce_tpu.tasks  # noqa: F401
    import vlnce_tpu.trainers  # noqa: F401
    from vlnce_tpu.config import get_config
    from vlnce_tpu.envs import ensure_registered
    from vlnce_tpu.models.seq2seq_policy import Seq2SeqPolicy
    from vlnce_tpu.ops.obs_transforms import get_active_obs_transforms
    from vlnce_tpu.tasks.datasets import make_dataset
    from vlnce_tpu.trainers.device_dagger import collect_episodes_resident

    ensure_registered()
    tmp = str(tmp_path)
    bank_dir = f"{tmp}/banks"
    common_opts = [
        "TASK_CONFIG.DATASET.NUM_EPISODES", "4",
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "6",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", str(IMG),
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", str(IMG),
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", str(IMG),
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", str(IMG),
        "IL.DAGGER.lmdb_features_dir", f"{tmp}/traj",
        "CHECKPOINT_FOLDER", f"{tmp}/ckpts",
    ]

    from scripts.generate_feature_bank import main as gen_main

    monkeypatch.setattr(sys, "argv", [
        "generate_feature_bank.py",
        "--exp-config", "vlnce_tpu/config/experiments/synthetic/smoke_seq2seq.yaml",
        "--bank-dir", bank_dir,
        "--headings", "8",
        "--spacing", "4.0",
        "--chunk", "64",
    ] + common_opts)
    gen_main()

    banks = {}
    for tag, extra in (("render", []), ("bank", ["TPU.FEATURE_BANK_DIR", bank_dir])):
        cfg = get_config(
            "vlnce_tpu/config/experiments/synthetic/smoke_seq2seq.yaml",
            opts=common_opts + [
                "NUM_ENVIRONMENTS", 2,
                "TPU.ON_DEVICE_DAGGER", True,
                "TPU.DAGGER_RESIDENT", True,
            ] + extra,
        )
        episodes = list(
            make_dataset("Synthetic-VLN-v0", cfg.TASK_CONFIG.DATASET).episodes
        )[:4]
        space = gspaces.Dict({
            "rgb": gspaces.Box(0, 255, (IMG, IMG, 3), np.uint8),
            "depth": gspaces.Box(0, 1, (IMG, IMG, 1), np.float32),
            "instruction": gspaces.Box(0, 10000, (200,), np.int32),
            "progress": gspaces.Box(0, 1, (1,), np.float32),
        })
        policy = Seq2SeqPolicy.from_config(cfg, space, gspaces.Discrete(4))
        policy.init_params(jax.random.PRNGKey(0), batch_size=2)
        banks[tag] = collect_episodes_resident(
            policy, get_active_obs_transforms(cfg), cfg, episodes, 1.0,
            jax.random.PRNGKey(7),
        )

    render_b, bank_b = banks["render"], banks["bank"]
    np.testing.assert_array_equal(render_b.lengths, bank_b.lengths)
    oracle_r, oracle_k = np.asarray(render_b.oracle), np.asarray(bank_b.oracle)
    prev_r, prev_k = np.asarray(render_b.prev), np.asarray(bank_b.prev)
    for e in range(len(render_b)):
        lr, lk = int(render_b.offsets[e]), int(bank_b.offsets[e])
        T = int(render_b.lengths[e])
        np.testing.assert_array_equal(oracle_r[lr:lr + T], oracle_k[lk:lk + T])
        np.testing.assert_array_equal(prev_r[lr:lr + T], prev_k[lk:lk + T])

    # the recorded features are the bank's own (shape from the npz metadata)
    from vlnce_tpu.data.feature_bank import load_bank_shapes

    rgb_shape, depth_shape = load_bank_shapes(bank_dir, episodes[0])
    assert tuple(bank_b.feat_shapes["rgb_features"]) == tuple(rgb_shape)
    assert tuple(bank_b.feat_shapes["depth_features"]) == tuple(depth_shape)
