"""VectorEnv / ThreadedVectorEnv API tests."""

import numpy as np
import pytest

import vlnce_tpu.tasks  # noqa: F401
from vlnce_tpu.config import get_config
from vlnce_tpu.envs import ensure_registered
from vlnce_tpu.envs.env_utils import construct_envs, get_env_class
from vlnce_tpu.envs import rl_envs  # noqa: F401
from vlnce_tpu.envs.vector_env import ThreadedVectorEnv, VectorEnv

ensure_registered()

OPTS = [
    "BASE_TASK_CONFIG_PATH", "vlnce_tpu/tasks/config/vlnce_task.yaml",
    "TASK_CONFIG.DATASET.TYPE", "Synthetic-VLN-v0",
    "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", 16,
    "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", 16,
    "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", 16,
    "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", 16,
    "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", 8,
    "NUM_ENVIRONMENTS", 2,
]


@pytest.fixture(params=["threaded", "process"])
def envs(request, monkeypatch):
    if request.param == "threaded":
        monkeypatch.setenv("VLNCE_TPU_THREADED_ENVS", "1")
    else:
        monkeypatch.delenv("VLNCE_TPU_THREADED_ENVS", raising=False)
    cfg = get_config(opts=OPTS)
    e = construct_envs(cfg, get_env_class("VLNCEDaggerEnv"))
    yield e
    e.close()


def test_reset_step_shapes(envs):
    obs = envs.reset()
    assert len(obs) == 2
    assert obs[0]["rgb"].shape == (16, 16, 3)
    out = envs.step([1, 2])
    assert len(out) == 2
    obs, reward, done, info = out[0]
    assert reward == 0.0
    assert "distance_to_goal" in info


def test_current_episodes_and_counts(envs):
    envs.reset()
    eps = envs.current_episodes()
    assert len(eps) == 2
    assert all(hasattr(e, "episode_id") for e in eps)
    assert sum(envs.number_of_episodes) > 0


def test_auto_reset_on_done(envs):
    envs.reset()
    first_eps = [e.episode_id for e in envs.current_episodes()]
    for _ in range(9):  # exceed MAX_EPISODE_STEPS=8
        out = envs.step([2, 2])
    # envs auto-reset: current episodes advanced
    second_eps = [e.episode_id for e in envs.current_episodes()]
    assert any(d for (_, _, d, _) in out) or first_eps != second_eps


def test_step_at_subset(envs):
    envs.reset()
    out = envs.step_at([1], [1])
    assert len(out) == 1


def test_pause_and_resume(envs):
    envs.reset()
    envs.pause_at(0)
    assert envs.num_envs == 1
    out = envs.step([1])
    assert len(out) == 1
    envs.resume_all()
    assert envs.num_envs == 2


def test_call_at(envs):
    envs.reset()
    ep = envs.call_at(0, "current_episode")
    assert hasattr(ep, "episode_id")


def test_step_at_async_overlap(envs):
    """Split-phase stepping: dispatch, do other work, then receive."""
    envs.reset()
    envs.step_at_async([0], [1])
    # while env 0 steps, we can interact with env 1
    out1 = envs.step_at([1], [2])
    assert len(out1) == 1
    out0 = envs.recv_at([0])
    assert len(out0) == 1
    obs, reward, done, info = out0[0]
    assert "rgb" in obs


def test_two_groups_in_flight(envs):
    """The two-group pipelined collection cycle: both groups dispatched
    before either is received, repeatedly (in-flight results must not
    clobber each other)."""
    envs.reset()
    for _ in range(3):
        envs.step_at_async([0], [1])
        envs.step_at_async([1], [2])
        out0 = envs.recv_at([0])
        out1 = envs.recv_at([1])
        assert len(out0) == 1 and len(out1) == 1
        assert "rgb" in out0[0][0] and "rgb" in out1[0][0]
