from vlnce_tpu.tasks import actions, datasets, measures, sensors  # noqa: F401  (registry population)
