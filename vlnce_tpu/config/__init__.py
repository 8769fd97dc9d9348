from vlnce_tpu.config.node import CN, Config

__all__ = ["CN", "Config", "get_config", "get_default_config", "add_pano_sensors_to_config"]


def __getattr__(name):
    # lazy to avoid a circular import with vlnce_tpu.tasks.config.default
    if name in ("get_config", "get_default_config", "add_pano_sensors_to_config"):
        from vlnce_tpu.config import default

        return getattr(default, name)
    raise AttributeError(name)
