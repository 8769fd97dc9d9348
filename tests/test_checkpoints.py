"""Checkpoint write path: batched snapshot, atomic rename, async writer.

Fast tier — plain pytrees, no policy compiles. The trainer-integrated
behavior (TPU.ASYNC_CHECKPOINT on by default, wait at train-loop end) is
exercised by every trainer E2E test in the slow tier.
"""

import os
import stat

import numpy as np
import pytest

from vlnce_tpu.utils.checkpoints import (
    load_checkpoint,
    save_checkpoint,
    wait_for_pending,
)


def _tmp_leftovers(path):
    import glob

    return glob.glob(path + ".tmp*")


def _tree():
    return {
        "layer": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4)},
        "bias": np.ones((4,), np.float32),
    }


def _assert_tree_equal(a, b):
    np.testing.assert_array_equal(a["state_dict"]["layer"]["kernel"], b["layer"]["kernel"])
    np.testing.assert_array_equal(a["state_dict"]["bias"], b["bias"])


def test_sync_roundtrip_atomic(tmp_path):
    path = str(tmp_path / "ckpt.0.ckpt")
    save_checkpoint(path, _tree(), extra_state={"epoch": 3})
    assert os.path.exists(path)
    assert not _tmp_leftovers(path)  # temp renamed away, never left
    ckpt = load_checkpoint(path)
    _assert_tree_equal(ckpt, _tree())
    assert ckpt["extra_state"]["epoch"] == 3


def test_async_roundtrip_and_ordering(tmp_path):
    """Async writes land atomically; back-to-back saves to the same path
    serialize (one write in flight at a time) and the last one wins."""
    path = str(tmp_path / "ckpt.0.ckpt")
    first = _tree()
    second = _tree()
    second["bias"] = np.full((4,), 7.0, np.float32)
    save_checkpoint(path, first, async_write=True)
    save_checkpoint(path, second, async_write=True)  # joins the first
    wait_for_pending()
    ckpt = load_checkpoint(path)
    np.testing.assert_array_equal(ckpt["state_dict"]["bias"], second["bias"])
    assert not _tmp_leftovers(path)


def test_async_snapshot_isolated_from_mutation(tmp_path):
    """The device snapshot happens at save time: mutating the params after
    an async save must not leak into the written file."""
    path = str(tmp_path / "ckpt.0.ckpt")
    tree = _tree()
    save_checkpoint(path, tree, async_write=True)
    tree["bias"][:] = -1.0  # post-save mutation
    wait_for_pending()
    ckpt = load_checkpoint(path)
    np.testing.assert_array_equal(ckpt["state_dict"]["bias"], np.ones((4,)))


def test_async_write_failure_surfaces(tmp_path):
    """A failed background write raises on the next wait — a failing disk
    cannot silently drop checkpoints."""
    ro_dir = tmp_path / "ro"
    ro_dir.mkdir()
    os.chmod(ro_dir, stat.S_IRUSR | stat.S_IXUSR)  # no write permission
    if os.access(str(ro_dir), os.W_OK):  # running as root: chmod is a no-op
        pytest.skip("cannot create an unwritable directory as this user")
    try:
        save_checkpoint(str(ro_dir / "ckpt.ckpt"), _tree(), async_write=True)
        with pytest.raises(RuntimeError, match="async checkpoint write failed"):
            wait_for_pending()
        wait_for_pending()  # error is consumed once; writer is reusable
    finally:
        os.chmod(ro_dir, stat.S_IRWXU)
