from vlnce_tpu.trainers import dagger_trainer, nonlearning_agents  # noqa: F401  (registry population)

try:  # trainers that land later in the build keep imports optional
    from vlnce_tpu.trainers import recollect_trainer  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from vlnce_tpu.trainers import ddppo_waypoint_trainer  # noqa: F401
except ImportError:  # pragma: no cover
    pass
