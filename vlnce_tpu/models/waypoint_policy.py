"""Waypoint policy (ICCV'21 actor-critic agent).

Parity with reference vlnce_baselines/models/waypoint_policy.py:19-347:
pano-stop categorical over 12 panos + STOP; per-pano distance & offset heads
as TruncatedNormal (continuous) or categorical (discrete); joint log-prob =
pano + masked distance/offset; per-component entropies for WDDPPO.

Device/host split (SURVEY.md §7 hard part 5): act() is one jitted program
returning fixed-shape arrays (stop flag, r, theta, log-probs, value, ...);
the env-facing dict actions {"action": "GO_TOWARD_POINT", args} are decoded
host-side by `actions_to_env`.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vlnce_tpu.registry import registry
from vlnce_tpu.config.node import to_static
from vlnce_tpu.models.distributions import Categorical, TruncatedNormal, batched_index_select
from vlnce_tpu.models.policy import observation_space_example
from vlnce_tpu.models.waypoint_predictors import (
    WaypointPredictionNet,
    distance_to_continuous,
    offset_to_continuous,
)


def _gather_pano(x: jnp.ndarray, pano: jnp.ndarray) -> jnp.ndarray:
    """x: [B, P] (or [B, P, K]); pano: [B, 1] -> select per-row pano column."""
    if x.ndim == 2:
        return jnp.take_along_axis(x, pano.astype(jnp.int32), axis=1)
    return batched_index_select(x, 1, pano.squeeze(-1))


@registry.register_policy(name="WaypointPolicy")
class WaypointPolicy:
    def __init__(self, module: WaypointPredictionNet, config, observation_space, num_panos: int):
        self.module = module
        self.config = config
        self.wypt_cfg = config.MODEL.WAYPOINT
        self.observation_space = observation_space
        self.num_panos = num_panos
        self._offset_limit = math.pi / num_panos
        self.params = None
        self._act_fn = jax.jit(self._act_impl, static_argnames=("deterministic",))
        self._eval_fn = jax.jit(self._evaluate_impl, static_argnames=("seq_len",))
        self._value_fn = jax.jit(self._value_impl)

    # -- construction --------------------------------------------------------
    @classmethod
    def from_config(cls, config, observation_space, action_space=None):
        num_panos = int(config.TASK_CONFIG.TASK.PANO_ROTATIONS)
        rgb_hw = observation_space["rgb"].shape[1:3]
        depth_hw = observation_space["depth"].shape[1:3]
        dtype = jnp.bfloat16 if config.TPU.PRECISION.compute_dtype == "bfloat16" else jnp.float32
        module = WaypointPredictionNet(
            model_config=to_static(config.MODEL), num_panos=num_panos,
            rgb_hw=tuple(rgb_hw), depth_hw=tuple(depth_hw), compute_dtype=dtype,
        )
        return cls(module, config, observation_space, num_panos)

    @property
    def num_recurrent_layers(self) -> int:
        return 2 if self.config.MODEL.STATE_ENCODER.rnn_type == "GRU" else 4

    @property
    def hidden_size(self) -> int:
        return int(self.config.MODEL.STATE_ENCODER.hidden_size)

    def initial_rnn_states(self, batch_size: int) -> jnp.ndarray:
        return jnp.zeros((batch_size, self.num_recurrent_layers, self.hidden_size), jnp.float32)

    def initial_prev_actions(self, batch_size: int) -> Dict[str, jnp.ndarray]:
        z = jnp.zeros((batch_size, 1), jnp.float32)
        return {"pano": z, "offset": z, "distance": z}

    def init_params(self, rng, batch_size: int = 1):
        obs = observation_space_example(self.observation_space, batch_size)
        # jit the init: eager flax init dispatches hundreds of ops one by one,
        # which costs minutes on a remote-attached chip (relay latency per op)
        variables = jax.jit(self.module.init)(
            rng, obs, self.initial_rnn_states(batch_size), self.initial_prev_actions(batch_size),
            jnp.zeros((batch_size, 1), jnp.float32),
        )
        self.params = variables["params"]
        return self.params

    def num_params(self) -> int:
        return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(self.params)))

    # -- distribution builders ----------------------------------------------
    def _distance_distribution(self, d1, d2, pano):
        if self.wypt_cfg.continuous_distance:
            return TruncatedNormal(
                loc=_gather_pano(d1, pano), scale=jnp.sqrt(_gather_pano(d2, pano)),
                smin=self.wypt_cfg.min_distance_prediction, smax=self.wypt_cfg.max_distance_prediction,
            )
        return Categorical(_gather_pano(d1, pano))

    def _offset_distribution(self, o1, o2, pano):
        if self.wypt_cfg.continuous_offset:
            return TruncatedNormal(
                loc=_gather_pano(o1, pano), scale=jnp.sqrt(_gather_pano(o2, pano)),
                smin=-self._offset_limit, smax=self._offset_limit,
            )
        return Categorical(_gather_pano(o1, pano))

    # -- act -----------------------------------------------------------------
    def _act_impl(self, params, observations, rnn_states, prev_actions, masks, rng, deterministic: bool):
        out = self.module.apply({"params": params}, observations, rnn_states, prev_actions, masks)
        rng_pano, rng_dist, rng_off = jax.random.split(rng, 3)

        pano_dist = Categorical(out["pano_stop_logits"])
        pano_stop = pano_dist.mode() if deterministic else pano_dist.sample(rng_pano)  # [B, 1]
        stop = (pano_stop == self.num_panos).astype(jnp.int32)
        pano = pano_stop % self.num_panos

        d_dist = self._distance_distribution(out["distance_var1"], out["distance_var2"], pano)
        o_dist = self._offset_distribution(out["offset_var1"], out["offset_var2"], pano)

        if self.wypt_cfg.continuous_distance:
            distance = d_dist.mode() if deterministic else d_dist.sample(rng_dist)
        else:
            distance = d_dist.mode() if deterministic else d_dist.sample(rng_dist)
            distance = distance.astype(jnp.float32)
        distance_log_prob = d_dist.log_prob(distance)
        action_distance = distance_to_continuous(distance, self.wypt_cfg)
        d_var = d_dist.variance if self.wypt_cfg.continuous_distance else jnp.zeros_like(action_distance)
        d_mode = d_dist.mode()

        offset = o_dist.mode() if deterministic else o_dist.sample(rng_off)
        offset = offset.astype(jnp.float32) if not self.wypt_cfg.continuous_offset else offset
        offset_log_prob = o_dist.log_prob(offset)
        action_offset = offset_to_continuous(offset, self.wypt_cfg, self.num_panos)
        o_var = o_dist.variance if self.wypt_cfg.continuous_offset else jnp.zeros_like(action_offset)
        o_mode = o_dist.mode()

        if not self.wypt_cfg.predict_offset:  # ablation (reference:96-103)
            action_offset = jnp.zeros_like(action_offset)
            offset = jnp.zeros_like(offset)
            o_var = jnp.zeros_like(o_var)
        if not self.wypt_cfg.predict_distance:  # ablation (reference:119-125)
            action_distance = jnp.zeros_like(action_distance) + 0.25
            distance = jnp.zeros_like(distance) if not self.wypt_cfg.continuous_distance else jnp.zeros_like(distance) + 0.25
            d_var = jnp.zeros_like(d_var)

        action_log_probs = pano_dist.log_prob(pano_stop)
        pano_mask = (pano_stop != self.num_panos).astype(action_log_probs.dtype)
        if self.wypt_cfg.predict_distance:
            action_log_probs = action_log_probs + pano_mask * distance_log_prob
        if self.wypt_cfg.predict_offset:
            action_log_probs = action_log_probs + pano_mask * offset_log_prob

        radians_per_pano = 2 * math.pi / self.num_panos
        theta = (pano.astype(jnp.float32) * radians_per_pano + action_offset) % (2 * math.pi)

        return {
            "value": out["value"],
            "stop": stop,
            "r": action_distance,
            "theta": theta,
            "action_elements": {"pano": pano_stop.astype(jnp.float32), "offset": offset, "distance": distance},
            "modes": {"offset": o_mode, "distance": d_mode},
            "variances": {"offset": o_var, "distance": d_var},
            "action_log_probs": action_log_probs,
            "rnn_states": out["rnn_states"],
            "pano_stop_logits": out["pano_stop_logits"],
        }

    def act(self, observations, rnn_states, prev_actions, masks, deterministic=False, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self._act_fn(self.params, observations, rnn_states, prev_actions, masks, rng, deterministic)

    @staticmethod
    def actions_to_env(act_out) -> List[Dict[str, Any]]:
        """Decode fixed-shape device outputs into env action dicts
        (reference waypoint_policy.py:191-208)."""
        stop = np.asarray(act_out["stop"]).reshape(-1)
        r = np.asarray(act_out["r"]).reshape(-1)
        theta = np.asarray(act_out["theta"]).reshape(-1)
        actions = []
        for i in range(len(stop)):
            if stop[i]:
                actions.append({"action": "STOP"})
            else:
                actions.append(
                    {"action": {"action": "GO_TOWARD_POINT", "action_args": {"r": float(r[i]), "theta": float(theta[i])}}}
                )
        return actions

    # -- value / evaluate ----------------------------------------------------
    def _value_impl(self, params, observations, rnn_states, prev_actions, masks):
        out = self.module.apply({"params": params}, observations, rnn_states, prev_actions, masks)
        return out["value"]

    def get_value(self, observations, rnn_states, prev_actions, masks):
        return self._value_fn(self.params, observations, rnn_states, prev_actions, masks)

    def _evaluate_impl(self, params, observations, rnn_states, prev_actions, masks, action_components, seq_len=None):
        out = self.module.apply({"params": params}, observations, rnn_states, prev_actions, masks, seq_len=seq_len)
        pano_dist = Categorical(out["pano_stop_logits"])
        pano_stop = action_components["pano"]
        pano_log_probs = pano_dist.log_prob(pano_stop)

        idx = (pano_stop.astype(jnp.int32) % self.num_panos)
        d_dist = self._distance_distribution(out["distance_var1"], out["distance_var2"], idx)
        o_dist = self._offset_distribution(out["offset_var1"], out["offset_var2"], idx)

        pano_mask = (pano_stop != self.num_panos).astype(pano_log_probs.dtype)
        d_mask = pano_mask * float(bool(self.wypt_cfg.predict_distance))
        o_mask = pano_mask * float(bool(self.wypt_cfg.predict_offset))

        distance_log_probs = d_mask * d_dist.log_prob(action_components["distance"])
        offset_log_probs = o_mask * o_dist.log_prob(action_components["offset"])
        action_log_probs = pano_log_probs + distance_log_probs + offset_log_probs

        def _ent2d(e):
            return e if e.ndim == 2 else e[:, None]

        entropy = {
            "pano": pano_dist.entropy(),
            "offset": (o_mask * _ent2d(o_dist.entropy())).squeeze(-1),
            "distance": (d_mask * _ent2d(d_dist.entropy())).squeeze(-1),
        }
        return out["value"], action_log_probs, entropy, out["rnn_states"]

    def evaluate_actions(self, observations, rnn_states, prev_actions, masks, action_components, seq_len=None):
        return self._eval_fn(self.params, observations, rnn_states, prev_actions, masks, action_components, seq_len=seq_len)
