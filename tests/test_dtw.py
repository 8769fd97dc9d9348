import numpy as np

from vlnce_tpu.tasks.dtw import dtw, fastdtw


def test_identical_sequences_zero():
    x = np.random.RandomState(0).randn(20, 3)
    assert dtw(x, x) < 1e-9
    assert fastdtw(x, x) < 1e-9


def test_known_small_case():
    # classic example: dtw([1,2,3],[1,2,2,3]) = 0 under point metric
    assert dtw([[1.0], [2.0], [3.0]], [[1.0], [2.0], [2.0], [3.0]]) < 1e-12


def test_shift_penalty():
    x = [[0.0], [1.0], [2.0]]
    y = [[0.0], [1.0], [2.0], [10.0]]
    # must pay |2-10| = 8 to align the trailing outlier
    assert abs(dtw(x, y) - 8.0) < 1e-9


def test_fastdtw_matches_exact_on_smooth_paths():
    rng = np.random.RandomState(1)
    for _ in range(5):
        t = np.linspace(0, 1, 60)
        x = np.stack([np.sin(2 * np.pi * t), np.cos(2 * np.pi * t)], axis=1)
        y = x[::2] + 0.01 * rng.randn(30, 2)
        exact = dtw(x, y)
        approx = fastdtw(x, y, radius=1)
        assert approx >= exact - 1e-9
        assert approx <= exact * 1.15 + 1e-6  # small approximation gap


def test_fastdtw_handles_short_sequences():
    assert fastdtw([[0.0]], [[1.0], [2.0]]) == 3.0
