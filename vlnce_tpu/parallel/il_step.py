"""Data-parallel IL training step over a device mesh.

This module owns the IL update used by BOTH production trainers
(DaggerTrainer and RecollectTrainer, vlnce_tpu/trainers/): params and
optimizer state are replicated, per-shard gradients are psum'd over the DATA
axis inside shard_map, and the (identical) update is applied once outside.
This is the TPU-native replacement for torch DDP gradient allreduce
(SURVEY.md §5.8): collectives ride ICI, inserted explicitly via lax.psum.

Loss bookkeeping is kept in sum/count form so that

- the sharded loss/grads are EXACTLY the single-device loss/grads (global
  denominators via psum, per-shard numerators summed), and
- env-axis padding (needed when N is not a multiple of the data-axis size)
  contributes nothing: padded slots carry all-zero inflection weights.

Inputs are time-major [T, N, ...]; use pad_batch_env_axis to round N up.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from vlnce_tpu.parallel.mesh import DATA_AXIS


def _il_loss_terms(module, params, obs_tn, prev_tn, masks_tn, corrected, weights,
                   num_layers: int, hidden: int, obs_shapes=None):
    """Inflection-weighted CE + aux losses in sum/count form.

    obs_tn: dict of [T, n, ...]; prev/masks/corrected/weights: [T, n].
    Returns (action_num, action_den, aux_num, aux_den) where the final losses
    are num/den with the denominators summed over all shards. Envs whose
    weights are all zero (padding) are excluded from both terms.

    obs_shapes: optional {key: per-step shape} map for FLATTENED obs leaves
    ([T, n, F] on the wire — scan-stacked image emits tile-pad their trailing
    dims up to 128x in HBM, PERFORMANCE.md); the unflatten happens here,
    inside the jit, where the reshape fuses (the same pattern as WDDPPO's
    _obs_shapes, rl/ppo.py:88-95).
    """
    T, n = corrected.shape
    obs_flat = {}
    for k, v in obs_tn.items():
        full = v.reshape((T * n,) + v.shape[2:])
        if obs_shapes and k in obs_shapes:
            full = full.reshape((T * n,) + tuple(obs_shapes[k]))
        obs_flat[k] = full
    rnn_states = jnp.zeros((n, num_layers, hidden), jnp.float32)
    logits, _, aux = module.apply(
        {"params": params}, obs_flat, rnn_states,
        prev_tn.reshape(T * n, 1), masks_tn.reshape(T * n, 1), seq_len=T,
    )
    logits = logits.reshape(T, n, -1)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, corrected[..., None], axis=-1).squeeze(-1)

    w_sum = jnp.sum(weights, axis=0)  # [n]
    per_env = jnp.sum(weights * nll, axis=0) / jnp.maximum(w_sum, 1e-8)
    valid = (w_sum > 0).astype(jnp.float32)
    action_num = jnp.sum(per_env * valid)
    action_den = jnp.sum(valid)

    # sum of alpha-scaled masked means, shared denominator
    # (mirrors _AuxLosses.reduce, reference aux_losses.py:24-32)
    aux_mask = (weights > 0).reshape(-1).astype(jnp.float32)
    aux_num = jnp.zeros((), jnp.float32)
    for _, (loss, alpha) in aux.items():
        aux_num = aux_num + alpha * jnp.sum(loss.reshape(-1) * aux_mask)
    aux_den = jnp.sum(aux_mask)
    return action_num, action_den, aux_num, aux_den


def _make_loss_and_grads(module, num_layers: int, hidden: int, mesh: Optional[Mesh],
                         obs_shapes=None):
    def loss_and_grads(params, obs_tn, prev_tn, masks_tn, corrected, weights):
        def loss_fn(p):
            a_num, a_den, x_num, x_den = _il_loss_terms(
                module, p, obs_tn, prev_tn, masks_tn, corrected, weights, num_layers, hidden,
                obs_shapes=obs_shapes,
            )
            if mesh is not None:
                # global counts so every shard divides by the same denominator
                a_den = jax.lax.psum(a_den, DATA_AXIS)
                x_den = jax.lax.psum(x_den, DATA_AXIS)
            action_loss = a_num / jnp.maximum(a_den, 1.0)
            aux_loss = x_num / jnp.maximum(x_den, 1.0)
            return action_loss + aux_loss, (action_loss, aux_loss)

        (loss, (action_loss, aux_loss)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if mesh is not None:
            grads, loss, action_loss, aux_loss = jax.lax.psum(
                (grads, loss, action_loss, aux_loss), DATA_AXIS
            )
        return grads, loss, action_loss, aux_loss

    if mesh is None:
        return loss_and_grads

    data_spec = P(None, DATA_AXIS)  # [T, N] sharded on N
    return shard_map(
        loss_and_grads,
        mesh=mesh,
        in_specs=(P(), data_spec, data_spec, data_spec, data_spec, data_spec),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )


def build_il_train_step(module, optimizer, num_layers: int, hidden: int,
                        mesh: Optional[Mesh] = None, obs_shapes=None) -> Callable:
    """Returns jitted fn(params, optim_state, obs_tn, prev[T,N], masks[T,N],
    corrected[T,N], weights[T,N]) -> (params, optim_state, loss, action_loss,
    aux_loss). Sharded over N when mesh is given; shape-polymorphic (jit
    recompiles per (T, N)). obs_shapes: in-jit unflatten map for [T, N, F]
    wire-flattened obs leaves (see _il_loss_terms)."""

    loss_and_grads = _make_loss_and_grads(module, num_layers, hidden, mesh, obs_shapes)

    def train_step(params, optim_state, obs_tn, prev_tn, masks_tn, corrected, weights):
        grads, loss, action_loss, aux_loss = loss_and_grads(
            params, obs_tn, prev_tn, masks_tn, corrected, weights
        )
        updates, optim_state = optimizer.update(grads, optim_state, params)
        params = optax.apply_updates(params, updates)
        return params, optim_state, loss, action_loss, aux_loss

    from vlnce_tpu.parallel.distributed import align_collective_step

    return align_collective_step(
        jax.jit(train_step, donate_argnums=(0, 1)), "il_train_step"
    )


def build_il_accum_step(module, optimizer, num_layers: int, hidden: int,
                        apply: bool, mesh: Optional[Mesh] = None,
                        obs_shapes=None) -> Callable:
    """Gradient-accumulation variant (RecollectTrainer): adds grads/accum_scale
    into a device-resident pytree; applies Adam and zeroes it when `apply`."""

    loss_and_grads = _make_loss_and_grads(module, num_layers, hidden, mesh, obs_shapes)

    def accum_step(params, optim_state, accum_grads, accum_scale,
                   obs_tn, prev_tn, masks_tn, corrected, weights):
        grads, loss, action_loss, aux_loss = loss_and_grads(
            params, obs_tn, prev_tn, masks_tn, corrected, weights
        )
        grads = jax.tree_util.tree_map(lambda a, g: a + g / accum_scale, accum_grads, grads)
        if apply:
            updates, optim_state = optimizer.update(grads, optim_state, params)
            params = optax.apply_updates(params, updates)
            grads = jax.tree_util.tree_map(jnp.zeros_like, grads)
        return params, optim_state, grads, loss, action_loss, aux_loss

    from vlnce_tpu.parallel.distributed import align_collective_step

    return align_collective_step(
        jax.jit(accum_step, donate_argnums=(0, 1, 2)), "il_accum_step"
    )


def globalize_batch(mesh: Mesh, obs_tn: Dict[str, jnp.ndarray], prev_tn,
                    masks_tn, corrected, weights) -> Tuple:
    """Multi-process entry into the sharded train steps: assemble GLOBAL
    arrays from per-process local batch shards.

    Under multi-process JAX (jax.distributed on a pod) no process can
    address the full env axis with jnp.asarray — each process contributes
    its own env shard (process p owns global envs [p*N_local, (p+1)*N_local))
    and jax.make_array_from_process_local_data stitches them into one
    globally-sharded array per leaf. Requires every process to supply the
    SAME local shape (pad_batch_env_axis + pad_time_axis guarantee it).
    Single-process: identity. This is the TPU analog of the reference's
    per-rank DistributedSampler shards feeding DDP
    (ddppo_waypoint_trainer.py:310-370)."""
    if jax.process_count() == 1:
        return obs_tn, prev_tn, masks_tn, corrected, weights
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    nproc = jax.process_count()

    def g(x):
        x = np.asarray(x)  # process-local host data (device leaves read back)
        gshape = (x.shape[0], x.shape[1] * nproc) + tuple(x.shape[2:])
        return jax.make_array_from_process_local_data(sharding, x, gshape)

    return (
        {k: g(v) for k, v in obs_tn.items()},
        g(prev_tn), g(masks_tn), g(corrected), g(weights),
    )


_MAX_REDUCE_CACHE: Dict[int, Tuple] = {}


def global_max_time(mesh: Mesh, t_local: int) -> int:
    """Agree the padded time length across processes: every process's batch
    has its own bucketed T (length bucketing is per-process data), but a
    globally-sharded [T, N_global] array needs ONE T. A [D]-element array
    (one slot per data shard, each process filling its local slots with its
    T) reduced with max is the host-side allgather — no separate control
    plane, the same mesh carries it."""
    if jax.process_count() == 1:
        return t_local
    from jax.sharding import NamedSharding

    # per-batch hot path: the jitted reduction (and shardings) are cached per
    # mesh — a fresh jax.jit wrapper per call would re-trace every batch
    key = id(mesh)
    if key not in _MAX_REDUCE_CACHE or _MAX_REDUCE_CACHE[key][0] is not mesh:
        from vlnce_tpu.parallel.distributed import align_collective_step

        _MAX_REDUCE_CACHE.clear()  # one live training mesh at a time
        _MAX_REDUCE_CACHE[key] = (
            mesh,
            NamedSharding(mesh, P(DATA_AXIS)),
            # first collective a training batch dispatches — align it, since
            # the per-rank compiles preceding it (render/transform programs)
            # can skew ranks past the communicator handshake deadline
            align_collective_step(
                jax.jit(jnp.max, out_shardings=NamedSharding(mesh, P())),
                "global_max_time",
            ),
        )
    _, in_sharding, max_fn = _MAX_REDUCE_CACHE[key]
    d = mesh.shape[DATA_AXIS]
    nproc = jax.process_count()
    local = np.full((d // nproc,), t_local, np.int32)
    arr = jax.make_array_from_process_local_data(in_sharding, local, (d,))
    return int(max_fn(arr))


def pad_time_axis(obs_tn: Dict[str, jnp.ndarray], prev_tn, masks_tn,
                  corrected, weights, t_target: int) -> Tuple:
    """Pad the time axis of a [T, N, ...] IL batch up to t_target. Padded
    steps carry zero inflection weight, so they are excluded from the loss
    exactly (same guarantee as collate's tail padding, data/collate.py)."""
    T = corrected.shape[0]
    if t_target == T:
        return obs_tn, prev_tn, masks_tn, corrected, weights
    pad_t = t_target - T

    def pad(a, value=0):
        width = [(0, pad_t)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, width, constant_values=value)

    return (
        {k: pad(v) for k, v in obs_tn.items()},
        pad(prev_tn),
        pad(masks_tn, 1),  # mid-sequence semantics; loss-invisible (w=0)
        pad(corrected),
        pad(weights),
    )


def prepare_global_batch(mesh: Optional[Mesh], obs_tn, prev_tn, masks_tn,
                         corrected, weights) -> Tuple:
    """Everything between a process-local [T, N_local, ...] batch and the
    sharded train step: pad N to the per-process shard multiple, agree T
    across processes, and stitch the global arrays. Single-process +
    mesh=None: identity. This is the one call sites use — DaggerTrainer,
    RecollectTrainer, and the dryrun all go through here, so pod-scale
    correctness is a property of the production path, not of a demo."""
    if mesh is None:
        return obs_tn, prev_tn, masks_tn, corrected, weights
    nproc = jax.process_count()
    multiple = mesh.shape[DATA_AXIS]
    if nproc > 1:
        assert multiple % nproc == 0, (
            f"data axis {multiple} not divisible by {nproc} processes"
        )
        multiple //= nproc
    batch = pad_batch_env_axis(
        obs_tn, prev_tn, masks_tn, corrected, weights, multiple=multiple
    )
    if nproc > 1:
        t_g = global_max_time(mesh, int(batch[3].shape[0]))
        batch = pad_time_axis(*batch, t_target=t_g)
        batch = globalize_batch(mesh, *batch)
    return batch


def pad_batch_env_axis(obs_tn: Dict[str, jnp.ndarray], prev_tn, masks_tn,
                       corrected, weights, multiple: int) -> Tuple:
    """Pad the env axis N of a [T, N, ...] IL batch up to a multiple of the
    data-axis size. Padded slots get zero inflection weights, so they are
    excluded from both loss terms and gradients exactly."""
    T, N = corrected.shape
    target = -(-N // multiple) * multiple
    if target == N:
        return obs_tn, prev_tn, masks_tn, corrected, weights
    pad_n = target - N

    def pad(a):
        width = [(0, 0)] * a.ndim
        width[1] = (0, pad_n)
        return jnp.pad(a, width)

    return (
        {k: pad(v) for k, v in obs_tn.items()},
        pad(prev_tn), pad(masks_tn), pad(corrected), pad(weights),
    )
