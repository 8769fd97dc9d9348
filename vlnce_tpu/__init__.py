"""VLN-CE-TPU: a TPU-native framework for Vision-and-Language Navigation in
Continuous Environments.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the reference
PyTorch/Habitat implementation (jacobkrantz/VLN-CE). The compute path (models,
losses, PPO updates, obs preprocessing) runs as jitted XLA programs on TPU;
simulation stays host-side behind a vectorized environment pool; scaling is
expressed as shardings over a `jax.sharding.Mesh` rather than NCCL process
groups.

Layer map (mirrors reference SURVEY.md §1):
    L0 simulator   -> vlnce_tpu.envs.sim          (host-side, pluggable)
    L1 task        -> vlnce_tpu.tasks             (datasets/sensors/measures/actions)
    L2 environment -> vlnce_tpu.envs              (Env, RLEnv, VectorEnv pool)
    L3 data        -> vlnce_tpu.data              (trajectory store, collate, recollection)
    L4 models      -> vlnce_tpu.models            (flax policies, encoders, distributions)
    L5 trainers    -> vlnce_tpu.trainers          (dagger, recollect, ddppo-waypoint)
    L6 config/CLI  -> vlnce_tpu.config, run.py
"""

__version__ = "0.1.0"

from vlnce_tpu.registry import registry  # noqa: F401
