"""On-device RL rollout collection: env + policy + reward as one scan.

The reference collects DD-PPO rollouts by crossing the host<->device boundary
every step on every rank (reference ddppo_waypoint_trainer.py:146-281), which
is why it needs 64 GPUs each co-located with 4 sims. With the device-resident
grid world the WHOLE collection loop — pano render, obs transforms, waypoint
policy act, GO_TOWARD_POINT dynamics, shaped reward, episode auto-reset from
a preloaded queue — runs as ONE jitted `lax.scan` of PPO.num_steps steps.
Together with the jitted PPO update this makes the entire training update a
handful of device programs: rollout tensors leave the chip once per update
(into the numpy rollout storage the PPO minibatcher consumes).

Parity: dynamics via device_sim.waypoint_step (tested against the host
GoTowardPoint action), reward via device_sim.waypoint_reward (tested against
the host VLNCEWaypointEnv), auto-reset mirrors VectorEnv auto-reset with the
episode iterator's round-robin slot assignment.

Enabled by TPU.ON_DEVICE_ROLLOUT; requires GridWorldSim-v0 +
VLNCEWaypointEnv semantics (host-bound simulators cannot run inside jit).
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vlnce_tpu.envs.scene_import import (
    apply_scene_geometry as _apply_scene_geometry,
)
from vlnce_tpu.envs.device_sim import (
    CameraSpec,
    camera_specs_from_config,
    geodesic_at,
    nearest_free_cell_map,
    render_arrays,
    waypoint_reward,
    waypoint_step,
)
from vlnce_tpu.envs.device_sim import _pad_grid
from vlnce_tpu.envs.gridworld import _RES, get_scene
from vlnce_tpu.parallel.mesh import DATA_AXIS
from vlnce_tpu.ops.obs_transforms import apply_obs_transforms_batch
from vlnce_tpu.tasks.datasets import make_dataset
from vlnce_tpu.tasks.geometry import heading_from_quaternion
from vlnce_tpu.tasks.sensors import MAX_INSTRUCTION_LEN
from vlnce_tpu.utils.logging import logger


class EpisodeQueue(NamedTuple):
    """Per-slot queues of upcoming episodes, stacked [B, Q, ...]. Slot b's
    active episode is entry ep_idx[b]; auto-reset advances the index."""

    occupancy: jnp.ndarray  # [B, Q, N, N] bool
    wall_colors: jnp.ndarray  # [B, Q, N, N, 3] uint8
    origin: jnp.ndarray  # [B, Q, 2] f32 world (x, z) of cell [0, 0]'s corner
    floor_color: jnp.ndarray  # [B, Q, 3] uint8
    ceil_color: jnp.ndarray  # [B, Q, 3] uint8
    goal_field: jnp.ndarray  # [B, Q, N, N] f32
    nearest: jnp.ndarray  # [B, Q, N, N, 2] int32
    d0: jnp.ndarray  # [B, Q] f32
    start_pos: jnp.ndarray  # [B, Q, 3] f32
    start_heading: jnp.ndarray  # [B, Q] f32
    instruction: jnp.ndarray  # [B, Q, L] int32


def _episode_entry(ep) -> Dict[str, np.ndarray]:
    scene = get_scene(ep.scene_id)
    field = None
    for goal in ep.goals:
        g = np.asarray(goal.position, np.float64)
        f = scene.distance_field(scene.world_to_cell(float(g[0]), float(g[-1])))
        field = f if field is None else np.minimum(field, f)
    s = np.asarray(ep.start_position, np.float64)
    si, sj = scene.world_to_cell(float(s[0]), float(s[-1]))
    tokens = ep.instruction.instruction_tokens or []
    instr = np.zeros((MAX_INSTRUCTION_LEN,), np.int32)
    n = min(len(tokens), MAX_INSTRUCTION_LEN)
    instr[:n] = np.asarray(tokens[:n], np.int32)
    return {
        "occupancy": scene.occupancy,
        "wall_colors": scene.wall_colors,
        "origin": np.asarray(scene.origin, np.float32),
        "floor_color": scene.floor_color,
        "ceil_color": scene.ceil_color,
        "goal_field": field.astype(np.float32),
        "nearest": nearest_free_cell_map(ep.scene_id),
        "d0": np.float32(max(float(field[si, sj]), 1e-6)),
        "start_pos": s.astype(np.float32),
        "start_heading": np.float32(
            heading_from_quaternion(np.asarray(ep.start_rotation, np.float64))
        ),
        "instruction": instr,
    }


_GRID_PAD_FILL = {"occupancy": True, "wall_colors": 0, "goal_field": np.inf}


def build_episode_queue(episodes_by_slot: List[List]) -> EpisodeQueue:
    fields = EpisodeQueue._fields
    entries_by_slot = [[_episode_entry(ep) for ep in slot_eps] for slot_eps in episodes_by_slot]
    # mixed-size imported scenes pad to the queue-max grid (blocked / +inf,
    # matching device_sim.build_scene_batch); `nearest` pads by edge-repeat
    # so padded lookups still name an in-scene navigable cell
    n = max(e["occupancy"].shape[0] for slot in entries_by_slot for e in slot)
    for slot in entries_by_slot:
        for e in slot:
            m = e["occupancy"].shape[0]
            if m == n:
                continue
            for f, fill in _GRID_PAD_FILL.items():
                e[f] = _pad_grid(e[f], n, fill)
            e["nearest"] = np.pad(
                e["nearest"], [(0, n - m), (0, n - m), (0, 0)], mode="edge"
            )
    stacked = {f: [] for f in fields}
    for entries in entries_by_slot:
        for f in fields:
            stacked[f].append(np.stack([e[f] for e in entries]))
    # ONE device_put: per-field uploads pay a round trip each on remote chips
    return jax.device_put(EpisodeQueue(**{f: np.stack(stacked[f]) for f in fields}))


def _select_axis1(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """arr [B, Q, ...]; idx [B] int32 -> [B, ...] = arr[b, idx[b]].

    One-hot masked sum instead of a dynamic gather: gathers lower to the TPU
    scalar unit (30 ms for the raycast's lookup batch vs 0.14 ms as one-hot
    contractions, measured on-chip — see device_sim._grid_lookup), while the
    masked sum is a vectorized multiply-add over the small Q/P axis. Exact:
    a single nonzero term per output, so no accumulation error and no uint8
    overflow."""
    q = arr.shape[1]
    sel = jnp.arange(q, dtype=jnp.int32)[None, :] == idx[:, None]  # [B, Q]
    s = sel.reshape(sel.shape + (1,) * (arr.ndim - 2))
    if arr.dtype == jnp.bool_:
        return jnp.any(arr & s, axis=1)
    # where-select, not multiply: the goal_field holds inf at unreachable
    # cells and inf * 0 would poison the sum with NaN (same hazard as
    # device_sim._grid_lookup's float path)
    return jnp.sum(
        jnp.where(s, arr, jnp.zeros((), arr.dtype)), axis=1, dtype=arr.dtype
    )


def _gather_slot(queue: EpisodeQueue, ep_idx: jnp.ndarray) -> EpisodeQueue:
    """Select each slot's active episode: [B, Q, ...] -> [B, ...]."""
    return EpisodeQueue(*(_select_axis1(arr, ep_idx) for arr in queue))


def compute_returns_device(rewards, values, masks_next, next_value, gamma, tau, use_gae):
    """GAE / discounted returns as a reverse scan — the device equivalent of
    ActionDictRolloutStorage.compute_returns (rl/rollout_storage.py:83-101 /
    reference common/rollout_storage.py:127-152). rewards/values/masks_next:
    [T, B, 1]; next_value: [B, 1]."""
    if use_gae:
        def gae_step(gae, x):
            r, v, vn, mn = x
            delta = r + gamma * vn * mn - v
            gae = delta + gamma * tau * mn * gae
            return gae, gae + v

        v_next = jnp.concatenate([values[1:], next_value[None]], axis=0)
        _, returns = jax.lax.scan(
            gae_step, jnp.zeros_like(next_value), (rewards, values, v_next, masks_next),
            reverse=True,
        )
    else:
        def ret_step(nxt, x):
            r, mn = x
            ret = r + gamma * nxt * mn
            return ret, ret

        _, returns = jax.lax.scan(ret_step, next_value, (rewards, masks_next), reverse=True)
    return returns


class DeviceRolloutCollector:
    """Owns the jitted collection scan plus per-slot episode scheduling."""

    def __init__(self, policy, obs_transforms, config, num_envs: int, mesh=None):
        task_cfg = config.TASK_CONFIG
        sim_type = task_cfg.SIMULATOR.TYPE
        if sim_type != "GridWorldSim-v0":
            raise ValueError(
                f"TPU.ON_DEVICE_ROLLOUT requires SIMULATOR.TYPE=GridWorldSim-v0 "
                f"(got {sim_type!r}); host-bound simulators cannot step inside jit"
            )
        if config.ENV_NAME != "VLNCEWaypointEnv":
            raise ValueError(
                f"TPU.ON_DEVICE_ROLLOUT implements VLNCEWaypointEnv reward/done "
                f"semantics (got ENV_NAME={config.ENV_NAME!r})"
            )

        self.policy = policy
        self.transforms = obs_transforms
        self.B = num_envs
        self.T = int(config.RL.PPO.num_steps)
        self.Q = self.T + 1  # worst case: one done per rollout step
        self.max_ep_steps = int(task_cfg.ENVIRONMENT.MAX_EPISODE_STEPS)
        _apply_scene_geometry(task_cfg.SIMULATOR)  # real-scene grids, if configured
        self.specs: List[CameraSpec] = camera_specs_from_config(task_cfg.SIMULATOR)
        self._rotate_agent = bool(task_cfg.TASK.ACTIONS.GO_TOWARD_POINT.rotate_agent)
        self._allow_sliding = bool(task_cfg.SIMULATOR.HABITAT_SIM_V0.ALLOW_SLIDING)
        max_move = float(config.MODEL.WAYPOINT.max_distance_prediction)
        self._max_samples = max(2, int(math.ceil(max_move / (0.25 * _RES))) + 1)
        rm = task_cfg.TASK.WAYPOINT_REWARD_MEASURE
        self._reward_kwargs = dict(
            slack_reward=float(rm.slack_reward),
            use_distance_scaled_slack_reward=bool(rm.use_distance_scaled_slack_reward),
            scale_slack_on_prediction=bool(rm.scale_slack_on_prediction),
            success_reward=float(rm.success_reward),
            distance_scalar=float(rm.distance_scalar),
            success_distance=float(task_cfg.TASK.SUCCESS.SUCCESS_DISTANCE),
        )
        ppo = config.RL.PPO
        self._gae_bits = (
            bool(ppo.use_gae), float(ppo.gamma), float(ppo.tau),
            bool(ppo.use_normalized_advantage),
        )
        num_panos = int(task_cfg.TASK.PANO_ROTATIONS)
        orient = [2 * np.pi / num_panos * i for i in range(num_panos)]
        self._angle_features = jnp.asarray(
            np.stack([np.array([np.sin(o), np.cos(o), 0.0, 1.0]) for o in orient]).astype(np.float32)
        )

        # episode schedule: round-robin over the train split, one stream per
        # slot (the analog of construct_envs' scene splitting + auto-reset)
        dataset = make_dataset(task_cfg.DATASET.TYPE, task_cfg.DATASET)
        eps = list(dataset.episodes)
        if not eps:
            raise ValueError("no episodes in the train split")
        self._slot_streams = [eps[i :: self.B] or eps for i in range(self.B)]
        self._slot_ptr = [0] * self.B

        # device-resident episode bank: per-rollout queue assembly costs one
        # tiny [B, Q] index upload + an on-device take, instead of restacking
        # and re-uploading ~Q*B episode tensors through the host every rollout
        # (measured 278 of 376 ms/rollout on a remote-attached chip)
        bank_cap = int(getattr(config.TPU, "EPISODE_BANK_MAX", 8192))
        self._bank_episodes = eps if len(eps) <= bank_cap else None
        if self._bank_episodes is None:
            logger.info(
                "on-device rollout: split has %d episodes > TPU.EPISODE_BANK_MAX=%d; "
                "falling back to per-rollout episode-queue uploads", len(eps), bank_cap
            )
        self._bank_arrays = None  # uploaded lazily on first collect
        self._bank_pos = (
            {id(ep): i for i, ep in enumerate(eps)} if self._bank_episodes else None
        )

        # data-parallel mesh: the env axis shards over DATA (the collection
        # scan is embarrassingly parallel over slots; only the advantage
        # normalization reduces globally, which GSPMD turns into an ICI
        # all-reduce). Fails loudly on a non-divisible env count — same
        # policy as WDDPPO's padded minibatches, but here padding would
        # corrupt the episode schedule, so we require divisibility instead.
        self.mesh = mesh
        if mesh is not None:
            n_data = mesh.shape[DATA_AXIS]
            if self.B % n_data != 0:
                raise ValueError(
                    f"TPU.ON_DEVICE_ROLLOUT with a {n_data}-way data mesh needs "
                    f"NUM_ENVIRONMENTS divisible by it (got {self.B})"
                )

        self._collect_fn = None  # built lazily (after params exist)
        self._carry = None

    # -- episode scheduling ----------------------------------------------------
    def _slot_episode(self, slot: int, offset: int):
        stream = self._slot_streams[slot]
        return stream[(self._slot_ptr[slot] + offset) % len(stream)]

    def _build_queue(self) -> EpisodeQueue:
        return build_episode_queue(
            [[self._slot_episode(b, q) for q in range(self.Q)] for b in range(self.B)]
        )

    def _rollout_inputs(self) -> Tuple[EpisodeQueue, jnp.ndarray]:
        """(bank [E, ...], slot_map [B, Q]) such that bank[slot_map] is the
        per-slot episode queue. With the device-resident bank only the tiny
        index map crosses the host boundary per rollout; the fallback ships
        the stacked queue itself (bank = flattened queue, identity map)."""
        if self._bank_episodes is not None:
            if self._bank_arrays is None:
                stacked = build_episode_queue([self._bank_episodes])
                self._bank_arrays = EpisodeQueue(*(a[0] for a in stacked))
            slot_map = np.asarray(
                [[self._bank_pos[id(self._slot_episode(b, q))] for q in range(self.Q)]
                 for b in range(self.B)], dtype=np.int32,
            )
            return self._bank_arrays, jnp.asarray(slot_map)
        queue = self._build_queue()
        flat = EpisodeQueue(*(a.reshape((-1,) + a.shape[2:]) for a in queue))
        idx = np.arange(self.B * self.Q, dtype=np.int32).reshape(self.B, self.Q)
        return flat, jnp.asarray(idx)

    # -- obs assembly (shared between scan body and the post-scan render) ------
    def _assemble_obs(self, scene: EpisodeQueue, pos, heading, hist_rgb, hist_depth):
        obs = render_arrays(
            scene.occupancy, scene.wall_colors, scene.floor_color,
            scene.ceil_color, pos, heading, self.specs, origin=scene.origin,
        )
        obs["instruction"] = scene.instruction
        obs["angle_features"] = jnp.broadcast_to(
            self._angle_features[None], (pos.shape[0],) + self._angle_features.shape
        )
        obs["globalgps"] = pos[:, jnp.array([0, 2])].astype(jnp.float32)
        two_pi = 2.0 * math.pi
        obs["heading"] = (((heading + math.pi) % two_pi) - math.pi)[:, None].astype(jnp.float32)
        batch = apply_obs_transforms_batch(obs, self.transforms)
        batch["rgb_history"] = hist_rgb
        batch["depth_history"] = hist_depth
        return batch

    # -- the jitted scan ---------------------------------------------------------
    def _build_collect_fn(self):
        policy = self.policy
        T, B = self.T, self.B
        # filled at trace time: original per-env obs shapes, keyed like the
        # emitted (flattened) obs dict — consumers unflatten inside their own
        # jitted programs (WDDPPO._loss)
        obs_shapes = self.obs_shapes = {}
        max_ep_steps = self.max_ep_steps
        rotate_agent, allow_sliding = self._rotate_agent, self._allow_sliding
        max_samples = self._max_samples
        rkw = self._reward_kwargs
        use_gae, gamma, tau, normalize_adv = self._gae_bits

        def step_env(scene: EpisodeQueue, pos, heading, stop, r, theta):
            def one(occ, nearest, p, h, s, rr, th, og):
                wp, wh = waypoint_step(
                    occ, nearest, p, h, rr, th, rotate_agent, max_samples,
                    allow_sliding, og,
                )
                return jnp.where(s, p, wp), jnp.where(s, h, wh)

            return jax.vmap(one)(
                scene.occupancy, scene.nearest, pos, heading, stop, r, theta,
                scene.origin,
            )

        def collect(params, bank: EpisodeQueue, slot_map, carry, rng):
            # assemble the per-slot episode queue on device: one gather per
            # rollout (amortized over T steps), no per-rollout tensor upload
            queue = EpisodeQueue(*(
                jnp.take(arr, slot_map.reshape(-1), axis=0).reshape(
                    (B, slot_map.shape[1]) + arr.shape[1:]
                )
                for arr in bank
            ))
            def body(c, t):
                (pos, heading, rnn, prev_a, mask, prev_d, ep_idx, step_in_ep,
                 ep_reward, hist_rgb, hist_depth) = c
                scene = _gather_slot(queue, ep_idx)
                batch = self._assemble_obs(scene, pos, heading, hist_rgb, hist_depth)
                out = policy._act_impl(
                    params, batch, rnn, prev_a, mask, jax.random.fold_in(rng, t), False
                )
                stop = out["stop"].reshape(B).astype(bool)
                r = out["r"].reshape(B)
                theta = out["theta"].reshape(B)

                new_pos, new_heading = step_env(scene, pos, heading, stop, r, theta)
                reward, d_new, success = jax.vmap(
                    lambda f, pd, pp, pa, rr, s, og: waypoint_reward(
                        f, pd, pp, pa, rr, s, origin=og, **rkw
                    )
                )(scene.goal_field, prev_d, pos[:, jnp.array([0, 2])], new_pos, r, stop,
                  scene.origin)

                done = stop | (step_in_ep + 1 >= max_ep_steps)
                ep_reward2 = ep_reward + reward[:, None]
                done_f = done.astype(jnp.float32)[:, None]
                stats = {
                    "reward": done_f * ep_reward2,
                    "count": done_f,
                    "success": done_f * success[:, None],
                    "distance_to_goal": done_f * d_new[:, None],
                }

                # auto-reset from the queue (VectorEnv auto-reset analog)
                ep_idx2 = jnp.where(done, jnp.minimum(ep_idx + 1, queue.d0.shape[1] - 1), ep_idx)
                nxt = _gather_slot(queue, ep_idx2)
                pos2 = jnp.where(done[:, None], nxt.start_pos, new_pos)
                heading2 = jnp.where(done, nxt.start_heading, new_heading)
                prev_d2 = jnp.where(done, nxt.d0, d_new)
                step_in_ep2 = jnp.where(done, 0, step_in_ep + 1)
                ep_reward3 = jnp.where(done[:, None], 0.0, ep_reward2)
                mask_next = (~done).astype(jnp.float32)[:, None]

                # history frame: the pano frame the agent moved toward; zeros
                # on STOP (reference ddppo_waypoint_trainer.py:190-200); the
                # new episode after a reset starts with zero history too
                pano = out["action_elements"]["pano"].reshape(B).astype(jnp.int32)
                num_p = batch["rgb"].shape[1]
                blank = (stop | done)[:, None, None, None]
                hist_rgb2 = jnp.where(
                    blank, jnp.zeros_like(hist_rgb),
                    _select_axis1(batch["rgb"], pano % num_p),
                )
                hist_depth2 = jnp.where(
                    blank, jnp.zeros_like(hist_depth),
                    _select_axis1(batch["depth"], pano % num_p),
                )

                prev_a2 = {k: v.astype(jnp.float32) for k, v in out["action_elements"].items()}
                c2 = (pos2, heading2, out["rnn_states"], prev_a2, mask_next, prev_d2,
                      ep_idx2, step_in_ep2, ep_reward3, hist_rgb2, hist_depth2)
                # emit obs flattened to [B, F]: stacking [T, B, ..., H, W, 1|3]
                # across scan steps forces XLA into (8,128)-tiled buffers whose
                # trailing unit/3-channel dims pad up to 128 — measured 26 of
                # the 36 ms/step (72%) of rollout collection. [T, B, F] with F
                # a multiple of 128 tiles cleanly; the PPO loss unflattens
                # in-program where the reshape fuses into the encoder.
                for k, v in batch.items():
                    obs_shapes[k] = tuple(v.shape[1:])
                emit = {
                    "obs": {k: v.reshape((B, -1)) for k, v in batch.items()},
                    "actions": out["action_elements"],
                    "prev_actions": prev_a,  # INPUT prev-actions at this step
                    "masks": mask,  # INPUT mask at this step
                    "old_log_probs": out["action_log_probs"],
                    "value_preds": out["value"],
                    "reward": reward[:, None],
                    "mask_next": mask_next,
                    "stats": stats,
                }
                return c2, emit

            hidden0 = carry[2]
            carry2, seq = jax.lax.scan(body, carry, jnp.arange(T))

            # bootstrap value + GAE entirely in-program (host never sees the
            # big obs tensors; reference computes this on the host from the
            # rollout storage, ddppo_waypoint_trainer.py:283-306)
            final_scene = _gather_slot(queue, carry2[6])
            final_obs = self._assemble_obs(
                final_scene, carry2[0], carry2[1], carry2[9], carry2[10]
            )
            next_value = policy._value_impl(
                params, final_obs, carry2[2], carry2[3], carry2[4]
            )
            values = seq["value_preds"]  # [T, B, 1]
            returns = compute_returns_device(
                seq["reward"], values, seq["mask_next"], next_value, gamma, tau, use_gae
            )
            adv = returns - values
            if normalize_adv:
                adv = (adv - adv.mean()) / (adv.std() + 1e-5)

            batch = {
                "obs": seq["obs"],
                "hidden0": hidden0,
                "rewards": seq["reward"],
                "masks_next": seq["mask_next"],
                "actions": seq["actions"],
                "prev_actions": seq["prev_actions"],
                "value_preds": values,
                "returns": returns,
                "masks": seq["masks"],
                "old_log_probs": seq["old_log_probs"],
                "advantages": adv,
            }
            stats = jax.tree_util.tree_map(lambda x: x.sum(0), seq["stats"])
            return carry2, batch, stats

        if self.mesh is None:
            return jax.jit(collect)

        # pjit over the mesh: params/bank replicated, env-batched args
        # sharded on axis 0; output shardings propagate (batch [T, B, ...]
        # comes out env-sharded on axis 1, exactly what WDDPPO's shard_map
        # update consumes)
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())
        env0 = NamedSharding(self.mesh, P(DATA_AXIS))
        return jax.jit(
            collect,
            in_shardings=(repl, repl, env0, jax.tree_util.tree_map(lambda _: env0, self._carry_structure()), repl),
        )

    def _carry_structure(self):
        """A pytree with the carry's structure (values unused) for building
        prefix shardings; every carry leaf is batch-major."""
        if self._carry is None:
            raise RuntimeError("carry must exist before building the collect fn")
        return self._carry

    # -- public API --------------------------------------------------------------
    def initial_carry_and_obs(self) -> Dict[str, np.ndarray]:
        """Set up slot state at the first episodes. Returns an empty dict:
        the initial obs batch need not be rendered separately — the first
        collect() emits the step-0 obs and writes rollout storage slot 0
        itself (a standalone render program would cost a second large XLA
        compile and eager gathers on remote-attached chips)."""
        firsts = [_episode_entry(self._slot_episode(b, 0)) for b in range(self.B)]
        rgb_spec = next(s for s in self.specs if s.kind == "rgb")
        depth_spec = next(s for s in self.specs if s.kind == "depth")
        self._carry = (
            jnp.asarray(np.stack([e["start_pos"] for e in firsts])),
            jnp.asarray(np.stack([e["start_heading"] for e in firsts])),
            self.policy.initial_rnn_states(self.B),
            {k: jnp.zeros((self.B, 1), jnp.float32) for k in ("pano", "offset", "distance")},
            jnp.zeros((self.B, 1), jnp.float32),  # mask: 0 -> reset recurrence
            jnp.asarray(np.stack([e["d0"] for e in firsts])),
            jnp.zeros((self.B,), jnp.int32),  # ep_idx
            jnp.zeros((self.B,), jnp.int32),  # step_in_ep
            jnp.zeros((self.B, 1), jnp.float32),  # episode reward accumulator
            jnp.zeros((self.B, rgb_spec.height, rgb_spec.width, 3), jnp.uint8),
            jnp.zeros((self.B, depth_spec.height, depth_spec.width, 1), jnp.float32),
        )
        return {}

    def collect_device(self, current_episode_reward, running_episode_stats, rng):
        """One full rollout (T steps) as a single device program. Returns the
        PPO batch as DEVICE arrays — obs/returns/advantages/etc never cross
        the host boundary (feed to WDDPPO.update_device). Only the small
        per-slot episode stats are read back."""
        if self._carry is None:
            raise RuntimeError("call initial_carry_and_obs() before collect_device()")
        if self._collect_fn is None:
            self._collect_fn = self._build_collect_fn()

        bank, slot_map = self._rollout_inputs()
        carry2, batch, stats = self._collect_fn(
            self.policy.params, bank, slot_map, self._carry, rng
        )

        # only the tiny stats/counters come back to the host, in ONE call
        stats_np, ep_idx_final, ep_reward = jax.device_get((stats, carry2[6], carry2[8]))

        # episode accounting: advance each slot's stream by the episodes it
        # finished; the in-flight episode becomes queue entry 0 next rollout
        for b in range(self.B):
            self._slot_ptr[b] = (self._slot_ptr[b] + int(ep_idx_final[b])) % len(self._slot_streams[b])
        self._carry = (
            carry2[0], carry2[1], carry2[2], carry2[3], carry2[4], carry2[5],
            jnp.zeros((self.B,), jnp.int32), carry2[7], carry2[8], carry2[9], carry2[10],
        )

        # device tracked per-episode reward internally; mirror the host
        # bookkeeping arrays for logging parity
        current_episode_reward[:] = ep_reward
        for k, v in stats_np.items():
            if k not in running_episode_stats:
                running_episode_stats[k] = np.zeros((self.B, 1), np.float32)
            running_episode_stats[k] += v
        batch = dict(batch)
        batch["obs_shapes"] = dict(self.obs_shapes)  # host metadata for _loss
        return batch, self.T * self.B
