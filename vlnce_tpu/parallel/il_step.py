"""Data-parallel IL training step over a device mesh.

The single-chip DAgger update (vlnce_tpu/trainers/dagger_trainer.py) shards
over the env/batch axis N here: params and optimizer state are replicated,
per-shard gradients are pmean'd over the DATA axis inside shard_map, and the
(identical) update is applied on every shard. This is the TPU-native
replacement for torch DDP gradient allreduce (SURVEY.md §5.8): collectives
ride ICI, inserted explicitly via lax.pmean.

Inputs are time-major [T, N, ...]; N must divide by the data-axis size.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from vlnce_tpu.parallel.mesh import DATA_AXIS
from vlnce_tpu.models.aux_losses import reduce_aux_losses


def il_loss_fn(module, params, observations_tn, prev_actions, masks, corrected, weights, num_layers: int, hidden: int):
    """observations_tn: dict of [T, n, ...]; returns (loss, (action, aux))."""
    T, n = corrected.shape
    obs_flat = {k: v.reshape((T * n,) + v.shape[2:]) for k, v in observations_tn.items()}
    rnn_states = jnp.zeros((n, num_layers, hidden), jnp.float32)
    logits, _, aux = module.apply(
        {"params": params}, obs_flat, rnn_states,
        prev_actions.reshape(T * n, 1), masks.reshape(T * n, 1), seq_len=T,
    )
    logits = logits.reshape(T, n, -1)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, corrected[..., None], axis=-1).squeeze(-1)
    action_loss = jnp.mean(jnp.sum(weights * nll, axis=0) / jnp.maximum(jnp.sum(weights, axis=0), 1e-8))
    aux_mask = (weights > 0).reshape(-1).astype(jnp.float32)
    aux_loss = reduce_aux_losses(aux, aux_mask)
    return action_loss + aux_loss, (action_loss, aux_loss)


def build_dp_il_train_step(module, optimizer, mesh: Mesh, num_layers: int, hidden: int) -> Callable:
    """Returns jitted fn(params, optim_state, obs_tn, prev[T,N], masks[T,N],
    corrected[T,N], weights[T,N]) -> (params, optim_state, loss, action_loss,
    aux_loss), sharded over N."""

    def local_step(params, optim_state, observations, prev_actions, masks, corrected, weights):
        (loss, (action_loss, aux_loss)), grads = jax.value_and_grad(
            il_loss_fn, argnums=1, has_aux=True
        )(module, params, observations, prev_actions, masks, corrected, weights, num_layers, hidden)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        action_loss = jax.lax.pmean(action_loss, DATA_AXIS)
        aux_loss = jax.lax.pmean(aux_loss, DATA_AXIS)
        updates, optim_state = optimizer.update(grads, optim_state, params)
        params = optax.apply_updates(params, updates)
        return params, optim_state, loss, action_loss, aux_loss

    data_spec = P(None, DATA_AXIS)  # [T, N] sharded on N
    obs_spec = P(None, DATA_AXIS)

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), obs_spec, data_spec, data_spec, data_spec, data_spec),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))
