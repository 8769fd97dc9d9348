import pytest

from vlnce_tpu.config import get_config
from vlnce_tpu.config.node import Config
from vlnce_tpu.config.default import add_pano_sensors_to_config


def test_attribute_access_and_freeze():
    c = Config({"A": 1, "B": {"C": "x"}})
    assert c.A == 1 and c.B.C == "x"
    c.freeze()
    with pytest.raises(AttributeError):
        c.A = 2
    with pytest.raises(AttributeError):
        c.B.C = "y"
    c.defrost()
    c.A = 2
    assert c.A == 2


def test_clone_is_independent():
    c = Config({"A": {"B": 1}})
    c2 = c.clone()
    c2.A.B = 5
    assert c.A.B == 1


def test_merge_unknown_key_raises():
    c = Config({"A": 1})
    with pytest.raises(KeyError):
        c.merge_from_list(["NOPE", 3])


def test_merge_from_list_parses_and_coerces():
    c = Config({"A": 1, "B": {"C": 2.0}, "D": [1, 2]})
    c.merge_from_list(["A", "7", "B.C", "3", "D", "[4, 5]"])
    assert c.A == 7 and c.B.C == 3.0 and c.D == [4, 5]


def test_get_config_defaults_and_opts():
    cfg = get_config(opts=["NUM_ENVIRONMENTS", 2, "IL.lr", 1e-3])
    assert cfg.NUM_ENVIRONMENTS == 2
    assert cfg.IL.lr == 1e-3
    assert cfg.TASK_CONFIG.TASK.PANO_ROTATIONS == 12
    assert cfg.is_frozen()


def test_task_config_ndtw_split_sync():
    cfg = get_config(opts=["BASE_TASK_CONFIG_PATH", "vlnce_tpu/tasks/config/vlnce_task.yaml"])
    assert cfg.TASK_CONFIG.TASK.NDTW.SPLIT == cfg.TASK_CONFIG.DATASET.SPLIT == "train"
    assert cfg.TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT == 224


def test_add_pano_sensors():
    cfg = add_pano_sensors_to_config(get_config())
    sensors = cfg.TASK_CONFIG.SIMULATOR.AGENT_0.SENSORS
    assert len(sensors) == 24  # 12 rgb + 12 depth
    assert cfg.TASK_CONFIG.SIMULATOR.RGB_6.UUID == "rgb_6"
    import math

    assert abs(cfg.TASK_CONFIG.SIMULATOR.RGB_6.ORIENTATION[1] - math.pi) < 1e-9
