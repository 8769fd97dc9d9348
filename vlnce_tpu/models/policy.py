"""Policy wrappers: host-side handles around pure flax modules.

The reference ILPolicy couples a net with a categorical head and exposes
act()/build_distribution() (reference vlnce_baselines/models/policy.py:10-58).
Here the flax module is pure; this wrapper owns params, PRNG threading, and
jit caches (one compiled program per static sequence length), which is the
TPU-native replacement for torch's eager act loop.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vlnce_tpu.models.distributions import Categorical


def categorical_head(features: jnp.ndarray, num_actions: int, name: str) -> jnp.ndarray:
    """Linear action head with habitat CategoricalNet init (orthogonal
    gain 0.01, zero bias)."""
    return nn.Dense(
        num_actions,
        kernel_init=nn.initializers.orthogonal(0.01),
        bias_init=nn.initializers.zeros,
        name=name,
    )(features.astype(jnp.float32))


def observation_space_example(observation_space, batch_size: int = 1) -> Dict[str, jnp.ndarray]:
    out = {}
    for key, space in observation_space.spaces.items():
        out[key] = jnp.zeros((batch_size,) + tuple(space.shape), dtype=space.dtype)
    return out


class ILPolicy:
    """Discrete-action imitation policy handle (Seq2Seq / CMA)."""

    def __init__(self, module: nn.Module, config, observation_space, num_actions: int):
        self.module = module
        self.config = config
        self.observation_space = observation_space
        self.num_actions = num_actions
        self.params = None
        self._act_fn = jax.jit(self._act_impl, static_argnames=("deterministic",))
        self._logits_fn_cache: Dict[int, Any] = {}

    # -- construction --------------------------------------------------------
    @classmethod
    def build_module(cls, config, observation_space, num_actions: int) -> nn.Module:
        raise NotImplementedError

    @classmethod
    def num_recurrent_layers_from_config(cls, config) -> int:
        raise NotImplementedError

    @classmethod
    def from_config(cls, config, observation_space, action_space):
        num_actions = int(action_space.n)
        module = cls.build_module(config, observation_space, num_actions)
        return cls(module, config, observation_space, num_actions)

    @property
    def num_recurrent_layers(self) -> int:
        return self.num_recurrent_layers_from_config(self.config)

    @property
    def hidden_size(self) -> int:
        return int(self.config.MODEL.STATE_ENCODER.hidden_size)

    def initial_rnn_states(self, batch_size: int) -> jnp.ndarray:
        return jnp.zeros((batch_size, self.num_recurrent_layers, self.hidden_size), jnp.float32)

    def init_params(self, rng, batch_size: int = 1):
        obs = observation_space_example(self.observation_space, batch_size)
        rnn_states = self.initial_rnn_states(batch_size)
        prev_actions = jnp.zeros((batch_size, 1), jnp.int32)
        masks = jnp.zeros((batch_size, 1), jnp.float32)
        # jit the init: eager flax init dispatches hundreds of ops one by one,
        # which costs minutes on a remote-attached chip (relay latency per op)
        variables = jax.jit(self.module.init)(rng, obs, rnn_states, prev_actions, masks)
        self.params = variables["params"]
        return self.params

    def num_params(self) -> int:
        return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(self.params)))

    # -- apply paths ---------------------------------------------------------
    def _act_impl(self, params, observations, rnn_states, prev_actions, masks, rng, deterministic: bool):
        logits, rnn_states_out, _ = self.module.apply(
            {"params": params}, observations, rnn_states, prev_actions, masks
        )
        dist = Categorical(logits)
        action = dist.mode() if deterministic else dist.sample(rng)
        return action, rnn_states_out

    def act(self, observations, rnn_states, prev_actions, masks, deterministic: bool = False, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self._act_fn(self.params, observations, rnn_states, prev_actions, masks, rng, deterministic)

    def _act_features_impl(self, params, observations, rnn_states, prev_actions, masks, rng, deterministic: bool):
        (logits, rnn_states_out, _), mods = self.module.apply(
            {"params": params}, observations, rnn_states, prev_actions, masks,
            mutable=["intermediates"],
        )
        dist = Categorical(logits)
        action = dist.mode() if deterministic else dist.sample(rng)
        feats = {}
        inter = mods.get("intermediates", {}).get("net", {})
        for enc_name, key in (("rgb_encoder", "rgb_features"), ("depth_encoder", "depth_features")):
            entry = inter.get(enc_name, {}).get("cached_features")
            if entry:
                feats[key] = entry[0]
        return action, rnn_states_out, feats

    def act_with_features(self, observations, rnn_states, prev_actions, masks, deterministic: bool = False, rng=None):
        """act() that also returns the frozen-encoder features computed during
        the forward pass — the TPU replacement for the reference's
        forward-hook feature capture (reference dagger_trainer.py:294-314)."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if not hasattr(self, "_act_feat_fn"):
            self._act_feat_fn = jax.jit(self._act_features_impl, static_argnames=("deterministic",))
        return self._act_feat_fn(self.params, observations, rnn_states, prev_actions, masks, rng, deterministic)

    def _logits_fn(self, T: int):
        if T not in self._logits_fn_cache:

            @jax.jit
            def fn(params, observations, rnn_states, prev_actions, masks):
                return self.module.apply(
                    {"params": params}, observations, rnn_states, prev_actions, masks, seq_len=T
                )

            self._logits_fn_cache[T] = fn
        return self._logits_fn_cache[T]

    def build_distribution_logits(self, observations_flat, rnn_states, prev_actions, masks, T: int):
        """observations_flat: [T*N, ...] time-major flattened; returns
        (logits [T*N, A], rnn_states_out, aux)."""
        return self._logits_fn(T)(self.params, observations_flat, rnn_states, prev_actions, masks)
