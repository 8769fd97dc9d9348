"""Device-rendered recollection: re-simulate GT trajectories on the chip.

The recollect trainer re-simulates ground-truth action sequences through an
env pool EVERY epoch to regenerate observations (reference
common/recollection_dataset.py:167-228). With the device-resident grid
world the GT actions are known up front, so the whole re-simulation is one
render-and-step `lax.scan` per episode chunk — no env pool, no per-step
host round trips. STOP-padded action tails are harmless (STOP never moves
the agent) and each episode is sliced back to its true GT length.

Enabled by `TPU.ON_DEVICE_RECOLLECT = True`; requires GridWorldSim-v0.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vlnce_tpu.parallel.mesh import DATA_AXIS
from vlnce_tpu.envs.scene_import import (
    apply_scene_geometry as _apply_scene_geometry,
)
from vlnce_tpu.envs.device_sim import (
    SceneBatch,
    build_scene_batch,
    progress_batch,
    render_batch,
    step_batch,
    step_tilt,
    camera_specs_from_config,
)
from vlnce_tpu.trainers.scan_eval import _episode_batch_arrays

# jitted render-rollout cache across calls (a rebuilt jit closure retraces
# at ~13s on remote chips even with a warm XLA cache — PERFORMANCE.md).
# Bounded FIFO: length buckets keep the key count small, but distinct
# configs in one process must not grow it without bound.
_RENDER_CACHE: Dict[tuple, object] = {}
_RENDER_CACHE_MAX = 32


def render_gt_batch_resident(
    config, episodes: List, trajectories: Dict, coef: float,
    instr_uuid: str = "instruction",
    length_quantum: int = 16,
    transforms=(), mesh=None,
):
    """One TRAINING batch rendered on device and kept there
    (TPU.RECOLLECT_RESIDENT): the render scan's output feeds the jitted IL
    accumulation step directly — no device->host->device round trip per
    epoch (the host path wires every rendered frame back,
    recollect_trainer.py + this module's render_gt_episodes_on_device).

    The emit is TIME-MAJOR and WIRE-FLATTENED: obs leaves come out
    [T_pad, B, F] with obs transforms already applied inside the scan body
    (a full-shape [T*B, H, W, C] output buffer would tile-pad its trailing
    dims on TPU, and per-leaf eager reshapes cost a dispatch round trip
    each — PERFORMANCE.md); the train step unflattens inside its own jit
    via the returned shapes map (il_step obs_shapes, the WDDPPO pattern).
    Returns (obs [T,N,F], prev [T,N], masks [T,N], corrected [T,N],
    weights [T,N], shapes). Padded steps re-render the final pose instead
    of the host's 1.0 fill — loss-identical because padded steps carry zero
    inflection weight and the RNN is causal.

    With `mesh`, the render scan shards its env axis over the data mesh
    (scenes/instructions/poses split, actions [T, B] sharded on B) and the
    emitted batch leaves arrive already env-sharded on axis 1 — exactly the
    layout the sharded accum step consumes, so render + encoder training
    scale over chips with no resharding between them."""
    from vlnce_tpu.data.collate import inflection_weights, _pad_to
    from vlnce_tpu.ops.obs_transforms import apply_obs_transforms_batch

    task_cfg = config.TASK_CONFIG
    _apply_scene_geometry(task_cfg.SIMULATOR)  # real-scene grids, if configured
    specs = camera_specs_from_config(task_cfg.SIMULATOR)
    forward_step = float(task_cfg.SIMULATOR.FORWARD_STEP_SIZE)
    turn_angle = math.radians(float(task_cfg.SIMULATOR.TURN_ANGLE))
    tilt_angle = math.radians(
        float(getattr(task_cfg.SIMULATOR, "TILT_ANGLE", task_cfg.SIMULATOR.TURN_ANGLE))
    )
    allow_sliding = bool(task_cfg.SIMULATOR.HABITAT_SIM_V0.ALLOW_SLIDING)
    B = len(episodes)

    trajs = [trajectories[ep.episode_id] for ep in episodes]
    lens = [len(t) for t in trajs]
    # pad straight to the collate bucket: the render is the collate
    T_pad = max(lens)
    if length_quantum > 1:
        T_pad = -(-T_pad // length_quantum) * length_quantum
    actions = np.zeros((T_pad, B), np.int32)  # STOP-padded tails
    for b, traj in enumerate(trajs):
        actions[: len(traj), b] = [step[1] for step in traj]

    key = ("resident-tm", tuple(specs), B, T_pad, forward_step, turn_angle,
           tilt_angle, allow_sliding, instr_uuid,
           tuple(type(t).__name__ for t in transforms),
           None if mesh is None else mesh.shape[DATA_AXIS])
    if key in _RENDER_CACHE:
        rollout_jit, shapes = _RENDER_CACHE[key]
    else:
        shapes: Dict[str, tuple] = {}  # filled at trace time (post-transform)

        def rollout(scenes, pos0, heading0, acts, instr):
            def body(c, a):
                pos, heading, tilt = c
                obs = render_batch(scenes, pos, heading, specs, tilt=tilt)
                obs["progress"] = progress_batch(scenes, pos)
                obs = apply_obs_transforms_batch(obs, transforms)
                emit = {}
                for k, v in obs.items():
                    shapes[k] = tuple(v.shape[1:])
                    emit[k] = v.reshape((B, -1))
                pos2, heading2 = step_batch(
                    scenes, pos, heading, a, forward_step, turn_angle, allow_sliding
                )
                tilt2 = step_tilt(tilt, a, tilt_angle)
                return (pos2, heading2, tilt2), emit

            init = (pos0, heading0, jnp.zeros((B,), jnp.float32))
            _, seq = jax.lax.scan(body, init, acts)  # leaves [T_pad, B, F]
            seq[instr_uuid] = jnp.broadcast_to(instr[None], (T_pad,) + instr.shape)
            return seq

        if mesh is None:
            rollout_jit = jax.jit(rollout)
        else:
            repl = NamedSharding(mesh, P())
            env0 = NamedSharding(mesh, P(DATA_AXIS))
            scenes_s = SceneBatch(*(env0 for _ in SceneBatch._fields))
            acts_s = NamedSharding(mesh, P(None, DATA_AXIS))
            rollout_jit = jax.jit(
                rollout, in_shardings=(scenes_s, env0, env0, acts_s, env0)
            )
        while len(_RENDER_CACHE) >= _RENDER_CACHE_MAX:
            _RENDER_CACHE.pop(next(iter(_RENDER_CACHE)))
        _RENDER_CACHE[key] = (rollout_jit, shapes)

    arrays = _episode_batch_arrays(episodes, instr_uuid=instr_uuid, task_cfg=task_cfg)
    pos_d, heading_d, acts_d, instr_d = jax.device_put(
        (arrays["pos"], arrays["heading"], actions, arrays["instruction"])
    )
    scenes = build_scene_batch(episodes)
    obs = rollout_jit(scenes, pos_d, heading_d, acts_d, instr_d)

    # prev/oracle/weights/masks are host-tiny; built exactly like collate
    prev = np.stack(
        [_pad_to(np.asarray([s[0] for s in t], np.int64), T_pad, 0) for t in trajs],
        axis=1,
    )
    corrected = np.stack(
        [_pad_to(np.asarray([s[2] for s in t], np.int64), T_pad, 0) for t in trajs],
        axis=1,
    )
    weights = np.stack(
        [
            _pad_to(
                inflection_weights(np.asarray([s[2] for s in t], np.int64), coef),
                T_pad, 0.0,
            )
            for t in trajs
        ],
        axis=1,
    )
    masks = np.ones((T_pad, B), np.float32)
    masks[0] = 0.0
    return obs, prev, masks, corrected, weights, dict(shapes)


def render_gt_episodes_on_device(
    config, episodes: List, trajectories: Dict, coef: float,
    instr_uuid: str = "instruction",
) -> List[Tuple[Dict[str, np.ndarray], np.ndarray, np.ndarray, np.ndarray]]:
    """One chunk of episodes -> the (obs[T], prev[T], oracle[T], weights[T])
    tuples TeacherRecollectionDataset.episodes() yields, with observations
    rendered on device along the GT action sequences."""
    from vlnce_tpu.data.collate import inflection_weights

    task_cfg = config.TASK_CONFIG
    _apply_scene_geometry(task_cfg.SIMULATOR)  # real-scene grids, if configured
    specs = camera_specs_from_config(task_cfg.SIMULATOR)
    forward_step = float(task_cfg.SIMULATOR.FORWARD_STEP_SIZE)
    turn_angle = math.radians(float(task_cfg.SIMULATOR.TURN_ANGLE))
    tilt_angle = math.radians(
        float(getattr(task_cfg.SIMULATOR, "TILT_ANGLE", task_cfg.SIMULATOR.TURN_ANGLE))
    )
    allow_sliding = bool(task_cfg.SIMULATOR.HABITAT_SIM_V0.ALLOW_SLIDING)
    B = len(episodes)

    trajs = [trajectories[ep.episode_id] for ep in episodes]
    lens = [len(t) for t in trajs]
    # bucket the padded length so the jitted rollout compiles once per
    # bucket, not once per distinct max-length; fine buckets keep the
    # padded-row readback waste small (each row is ~MBs of obs on the wire)
    T_pad = -(-max(lens) // 8) * 8
    actions = np.zeros((T_pad, B), np.int32)  # STOP-padded tails
    for b, traj in enumerate(trajs):
        actions[: len(traj), b] = [step[1] for step in traj]

    key = (tuple(specs), B, T_pad, forward_step, turn_angle, tilt_angle,
           allow_sliding, instr_uuid)
    if key not in _RENDER_CACHE:

        def rollout(scenes, pos0, heading0, acts):
            def body(c, a):
                pos, heading, tilt = c
                obs = render_batch(scenes, pos, heading, specs, tilt=tilt)
                obs["progress"] = progress_batch(scenes, pos)
                emit = {}
                for k, v in obs.items():
                    v = v.reshape((B, -1))
                    if v.dtype == jnp.float32 and k != "progress":
                        # f32 depth frames cross the wire as f16 — strictly
                        # more precise than the bf16 the encoders consume,
                        # and half the bytes; upcast host-side
                        v = v.astype(jnp.float16)
                    emit[k] = v
                pos2, heading2 = step_batch(
                    scenes, pos, heading, a, forward_step, turn_angle, allow_sliding
                )
                tilt2 = step_tilt(tilt, a, tilt_angle)
                return (pos2, heading2, tilt2), emit

            init = (pos0, heading0, jnp.zeros((B,), jnp.float32))
            _, seq = jax.lax.scan(body, init, acts)
            return seq

        while len(_RENDER_CACHE) >= _RENDER_CACHE_MAX:
            _RENDER_CACHE.pop(next(iter(_RENDER_CACHE)))
        _RENDER_CACHE[key] = jax.jit(rollout)
    rollout_jit = _RENDER_CACHE[key]

    arrays = _episode_batch_arrays(episodes, instr_uuid=instr_uuid, task_cfg=task_cfg)
    pos_d, heading_d, acts_d = jax.device_put(
        (arrays["pos"], arrays["heading"], actions)
    )
    scenes = build_scene_batch(episodes)
    seq = jax.device_get(rollout_jit(scenes, pos_d, heading_d, acts_d))

    # recover per-sensor shapes from the camera specs / sensor dims
    shapes: Dict[str, tuple] = {s.uuid: (s.height, s.width, 3 if s.kind == "rgb" else 1) for s in specs}
    shapes["progress"] = (1,)

    out = []
    for b, (ep, traj) in enumerate(zip(episodes, trajs)):
        T_ep = lens[b]
        obs = {}
        for k, v in seq.items():
            arr = np.asarray(v[:T_ep, b])
            if arr.dtype == np.float16:
                arr = arr.astype(np.float32)
            obs[k] = arr.reshape((T_ep,) + shapes[k])
        obs[instr_uuid] = np.repeat(arrays["instruction"][b][None], T_ep, axis=0)
        prev = np.asarray([s[0] for s in traj], np.int64)
        oracle = np.asarray([s[2] for s in traj], np.int64)
        out.append((obs, prev, oracle, inflection_weights(oracle, coef)))
    return out
