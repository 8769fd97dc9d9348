"""Trajectory store + collate tests."""

import numpy as np
import pytest

from vlnce_tpu.data.collate import (
    TrajectoryBatchIterator,
    collate_episodes,
    inflection_weights,
)
from vlnce_tpu.data.trajectory_store import (
    TrajectoryStoreReader,
    TrajectoryStoreWriter,
    store_length,
)


def make_episode(T, seed=0):
    rng = np.random.RandomState(seed)
    obs = {
        "rgb_features": rng.randn(T, 8, 2, 2).astype(np.float32),
        "instruction": np.tile(rng.randint(1, 50, (12,)), (T, 1)).astype(np.int32),
    }
    prev = rng.randint(0, 4, (T,)).astype(np.int64)
    oracle = rng.randint(0, 4, (T,)).astype(np.int64)
    return [obs, prev, oracle]


def test_store_roundtrip(tmp_path):
    d = str(tmp_path / "traj")
    w = TrajectoryStoreWriter(d, drop_existing=True)
    eps = [make_episode(T, seed=T) for T in (5, 9, 3)]
    for ep in eps:
        w.put(ep)
    w.close()
    assert store_length(d) == 3
    r = TrajectoryStoreReader(d)
    assert len(r) == 3
    got = r.get(1)
    np.testing.assert_array_equal(got[1], eps[1][1])
    np.testing.assert_allclose(got[0]["rgb_features"], eps[1][0]["rgb_features"])
    r.close()


def test_store_append_reopen(tmp_path):
    d = str(tmp_path / "traj")
    w = TrajectoryStoreWriter(d, drop_existing=True)
    w.put(make_episode(4))
    w.close()
    w2 = TrajectoryStoreWriter(d, drop_existing=False)
    assert len(w2) == 1
    w2.put(make_episode(6))
    w2.close()
    r = TrajectoryStoreReader(d)
    assert len(r) == 2
    assert len(r.get(1)[1]) == 6


def test_inflection_weights():
    oracle = np.array([1, 1, 2, 2, 0])
    w = inflection_weights(oracle, 3.2)
    np.testing.assert_allclose(w, [3.2, 1.0, 3.2, 1.0, 3.2])
    w1 = inflection_weights(oracle, 1.0)
    np.testing.assert_allclose(w1, np.ones(5))


def test_collate_shapes_and_padding():
    eps = []
    for T in (5, 9):
        obs, prev, oracle = make_episode(T, seed=T)
        weights = inflection_weights(oracle, 3.2)
        eps.append((obs, prev, oracle, weights))
    obs, prev, masks, corrected, weights = collate_episodes(eps, length_quantum=16)
    T, N = corrected.shape
    assert (T, N) == (16, 2)  # rounded to quantum
    assert obs["rgb_features"].shape == (32, 8, 2, 2)
    assert prev.shape == (32, 1)
    # t=0 mask is 0 (episode start)
    assert masks.reshape(16, 2)[0].sum() == 0
    assert masks.reshape(16, 2)[1:].sum() == 30
    # padding: weights zero past episode length
    assert weights[9:, 1].sum() == 0
    assert weights[5:, 0].sum() == 0
    # obs padded with 1.0 for float sensors
    np.testing.assert_allclose(obs["rgb_features"].reshape(16, 2, 8, 2, 2)[9:, 1], 1.0)


def test_batch_iterator(tmp_path):
    d = str(tmp_path / "traj")
    w = TrajectoryStoreWriter(d, drop_existing=True)
    for i in range(7):
        w.put(make_episode(3 + i, seed=i))
    w.close()
    r = TrajectoryStoreReader(d)
    it = TrajectoryBatchIterator(r, batch_size=2, inflection_weight_coef=3.2, seed=1)
    batches = list(it)
    assert len(batches) == 3  # 7 episodes, drop_last
    for obs, prev, masks, corrected, weights in batches:
        T, N = corrected.shape
        assert N == 2 and prev.shape == (T * N, 1)
    r.close()
