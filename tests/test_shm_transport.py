"""Native shared-memory obs ring tests (skipped if the C++ lib isn't built)."""

import numpy as np
import pytest

from vlnce_tpu.envs import shm_transport


pytestmark = pytest.mark.skipif(
    not shm_transport.native_available(), reason="libobsring.so not built"
)


def test_schema_layout():
    template = {
        "rgb": np.zeros((32, 32, 3), np.uint8),
        "depth": np.zeros((32, 32, 1), np.float32),
        "tiny": np.zeros((2,), np.float32),  # below threshold -> pipe
    }
    schema = shm_transport.ObsSchema(template, min_bytes=1024)
    assert set(schema.fields) == {"rgb", "depth"}
    offsets = [v[0] for v in schema.fields.values()]
    assert all(o % 64 == 0 for o in offsets)
    assert schema.slot_bytes >= 32 * 32 * 3 + 32 * 32 * 4


def test_write_gather_roundtrip():
    rng = np.random.RandomState(0)
    template = {"rgb": np.zeros((16, 16, 3), np.uint8), "depth": np.zeros((16, 16, 1), np.float32)}
    schema = shm_transport.ObsSchema(template, min_bytes=16)
    ring = shm_transport.ObsRing("/vlnce_test_ring", 3, schema, create=True)
    try:
        frames = []
        for slot in range(3):
            obs = {
                "rgb": rng.randint(0, 255, (16, 16, 3), dtype=np.uint8),
                "depth": rng.rand(16, 16, 1).astype(np.float32),
                "small": np.array([slot], np.int32),
            }
            rest = ring.write_obs(slot, obs, sequence=1)
            assert "small" in rest and "rgb" not in rest
            frames.append(obs)
        ring.wait([0, 1, 2], 1)
        batch = ring.gather([0, 1, 2])
        for slot in range(3):
            np.testing.assert_array_equal(batch["rgb"][slot], frames[slot]["rgb"])
            np.testing.assert_allclose(batch["depth"][slot], frames[slot]["depth"])
        # subset gather in arbitrary order
        batch2 = ring.gather([2, 0])
        np.testing.assert_array_equal(batch2["rgb"][0], frames[2]["rgb"])
        np.testing.assert_array_equal(batch2["rgb"][1], frames[0]["rgb"])
    finally:
        ring.close()


def test_sequence_publish_visibility():
    template = {"x": np.zeros((64,), np.float32)}
    schema = shm_transport.ObsSchema(template, min_bytes=16)
    ring = shm_transport.ObsRing("/vlnce_test_ring2", 1, schema, create=True)
    try:
        assert ring.lib.obs_ring_seq(ring.handle, 0) == 0
        ring.write_obs(0, {"x": np.arange(64, dtype=np.float32)}, sequence=7)
        assert ring.lib.obs_ring_seq(ring.handle, 0) == 7
        with pytest.raises(TimeoutError):
            ring.wait([0], 8, max_spins=1000)
    finally:
        ring.close()
