"""PrefetchIterator: background producer correctness."""

import time

import pytest

from vlnce_tpu.data.prefetch import PrefetchIterator


def test_order_preserved():
    items = list(range(100))
    assert list(PrefetchIterator(items, depth=4)) == items


def test_depth_zero_inline():
    items = list(range(10))
    assert list(PrefetchIterator(items, depth=0)) == items


def test_exception_propagates():
    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    it = iter(PrefetchIterator(gen(), depth=2))
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_early_break_shuts_down_producer():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    for i, x in enumerate(PrefetchIterator(gen(), depth=2)):
        if i == 3:
            break
    # the producer must stop quickly, not run the full 10k
    time.sleep(0.3)
    assert len(produced) < 100


def test_overlap_actually_happens():
    """Producer and consumer work runs concurrently. Checked structurally —
    both sides observed inside their sleep at the same instant — because a
    wall-clock threshold (serial ~0.40s vs overlapped ~0.22s) flakes on a
    loaded 1-core host where scheduler latency dwarfs the 20ms sleeps."""
    import threading

    active = 0
    lock = threading.Lock()
    overlapped = threading.Event()

    def _sleep_tracked(dt):
        nonlocal active
        with lock:
            active += 1
            if active >= 2:
                overlapped.set()
        time.sleep(dt)
        with lock:
            active -= 1

    def slow_gen():
        for _ in range(10):
            _sleep_tracked(0.02)
            yield 1

    for _ in PrefetchIterator(slow_gen(), depth=4):
        _sleep_tracked(0.02)
    assert overlapped.is_set(), "producer never ran concurrently with consumer"
