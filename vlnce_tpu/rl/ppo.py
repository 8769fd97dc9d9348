"""PPO update for dict-action waypoint policies (WDDPPO).

Loss parity with reference vlnce_baselines/common/ddppo_alg.py:9-149:
clipped surrogate, clipped value loss, 3-component entropy with separate
pano/offset/distance coefficients, and L1 offset regularization.

TPU-native: each minibatch update (sequence forward via lax.scan + all loss
terms + grad clip + Adam) is ONE jitted program per (T, n) shape; the
distributed variant wraps the same local step in shard_map over the env axis
with lax.pmean on gradients — the XLA/ICI replacement for DDPPO's NCCL
allreduce (reference ddppo_alg.py:4,9; SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from vlnce_tpu.parallel.mesh import DATA_AXIS
from vlnce_tpu.models.waypoint_predictors import offset_to_continuous


class WDDPPO:
    def __init__(
        self,
        policy,
        ppo_cfg,
        mesh: Optional[Mesh] = None,
        offset_regularize_coef: float = 0.0,
        pano_entropy_coef: float = 1.0,
        offset_entropy_coef: float = 1.0,
        distance_entropy_coef: float = 1.0,
        num_updates: Optional[int] = None,
    ):
        self.policy = policy
        self.cfg = ppo_cfg
        self.mesh = mesh
        self.offset_regularize_coef = offset_regularize_coef
        self.pano_entropy_coef = pano_entropy_coef
        self.offset_entropy_coef = offset_entropy_coef
        self.distance_entropy_coef = distance_entropy_coef
        # linear lr decay rides an optax schedule over optimizer steps
        # (reference habitat linear_decay + use_linear_lr_decay)
        if getattr(ppo_cfg, "use_linear_lr_decay", False) and num_updates:
            steps_per_update = ppo_cfg.ppo_epoch * ppo_cfg.num_mini_batch
            lr = optax.linear_schedule(
                init_value=ppo_cfg.lr, end_value=0.0,
                transition_steps=num_updates * steps_per_update,
            )
        else:
            lr = ppo_cfg.lr
        # Adam over trainable leaves only (frozen ResNets get no moment
        # buffers/traffic — reference torch-Adam-skips-None-grads semantics);
        # global-norm clip stays over the full tree, where frozen grads are
        # exact zeros (parallel/optim.py)
        from vlnce_tpu.parallel.optim import masked_adam

        model_cfg = getattr(policy, "config", None)
        self.optimizer = masked_adam(
            lr, policy.params, model_cfg.MODEL if model_cfg is not None else None,
            eps=ppo_cfg.eps, max_grad_norm=ppo_cfg.max_grad_norm,
        )
        self.optim_state = self.optimizer.init(policy.params)
        self.num_updates = num_updates
        self._step_cache: Dict[tuple, any] = {}
        # set by update_device from a DeviceRolloutCollector batch: obs arrive
        # flattened [T, n, F] (scan-stacking image shapes triggers padded TPU
        # tile layouts) and are unflattened inside the jitted loss
        self._obs_shapes: Optional[Dict[str, tuple]] = None

    # ------------------------------------------------------------- advantages
    def get_advantages(self, rollouts) -> np.ndarray:
        adv = rollouts.returns[:-1] - rollouts.value_preds[:-1]
        if not self.cfg.use_normalized_advantage:
            return adv
        return (adv - adv.mean()) / (adv.std() + 1e-5)

    # ------------------------------------------------------------- loss core
    def _loss(self, params, sample, valid, clip_param, T: int):
        """All loss terms are masked sum/global-count means over `valid`
        ([n], 1.0 for real env slots, 0.0 for mesh padding), so the sharded
        losses/grads equal the single-device ones exactly even when shards
        carry different numbers of real envs."""
        (
            obs, hidden0, actions, prev_actions, value_preds, returns,
            masks, old_log_probs, adv_targ,
        ) = sample
        n = valid.shape[0]
        if self._obs_shapes:
            # restore image shapes from the collector's flattened emit (a
            # no-op reshape when obs already carry their full shapes)
            obs = {
                k: v.reshape(v.shape[:2] + tuple(self._obs_shapes[k]))
                if k in self._obs_shapes else v
                for k, v in obs.items()
            }

        def flat(v):
            return v.reshape((T * v.shape[1],) + v.shape[2:])

        obs = {k: flat(v) for k, v in obs.items()}
        actions = {k: flat(v) for k, v in actions.items()}
        prev_actions = {k: flat(v) for k, v in prev_actions.items()}
        value_preds, returns, masks, old_log_probs, adv_targ = (
            flat(value_preds), flat(returns), flat(masks), flat(old_log_probs), flat(adv_targ),
        )
        values, action_log_probs, entropy, _ = self.policy._evaluate_impl(
            params, obs, hidden0, prev_actions, masks, actions, seq_len=T
        )

        v = jnp.broadcast_to(valid[None, :, None], (T, n, 1)).reshape(T * n, 1)
        count = jnp.sum(v)
        if self.mesh is not None:
            count = jax.lax.psum(count, DATA_AXIS)
        count = jnp.maximum(count, 1.0)

        def mmean(x):
            return jnp.sum(x.reshape(T * n, -1) * v) / count

        entropy_loss = mmean(
            self.pano_entropy_coef * entropy["pano"]
            + self.offset_entropy_coef * entropy["offset"]
            + self.distance_entropy_coef * entropy["distance"]
        ) * self.cfg.entropy_coef

        ratio = jnp.exp(action_log_probs - old_log_probs)
        surr1 = ratio * adv_targ
        surr2 = jnp.clip(ratio, 1.0 - clip_param, 1.0 + clip_param) * adv_targ
        action_loss = -mmean(jnp.minimum(surr1, surr2))

        if self.cfg.clip_value_loss:
            value_pred_clipped = value_preds + jnp.clip(
                values - value_preds, -clip_param, clip_param
            )
            value_loss = 0.5 * mmean(jnp.maximum(
                (values - returns) ** 2, (value_pred_clipped - returns) ** 2
            ))
        else:
            value_loss = 0.5 * mmean((returns - values) ** 2)
        value_loss = value_loss * self.cfg.value_loss_coef

        offset_loss = 0.0
        if "offset" in actions:
            offsets = offset_to_continuous(actions["offset"], self.policy.wypt_cfg, self.policy.num_panos)
            offset_loss = self.offset_regularize_coef * mmean(jnp.abs(offsets))

        total = value_loss + action_loss + offset_loss - entropy_loss
        stats = {
            "value_loss": value_loss,
            "action_loss": action_loss,
            "entropy_loss": entropy_loss,
            "pano_entropy": mmean(entropy["pano"]),
            "offset_entropy": mmean(entropy["offset"]),
            "distance_entropy": mmean(entropy["distance"]),
        }
        return total, stats

    def _grads_and_stats(self, params, sample, valid, clip_param, T: int):
        """Globally-reduced PPO gradients + stats for one minibatch: the
        value_and_grad + psum core shared by the update step and by the
        sharded-parity tests (which compare gradients ACROSS topologies —
        the proof that catches wrong denominators/missing psums, since a
        first Adam step is scale-invariant and post-update params are not
        sensitive to them)."""
        (_, stats), grads = jax.value_and_grad(self._loss, has_aux=True)(
            params, sample, valid, clip_param, T
        )
        if self.mesh is not None:
            # losses are local-sum / global-count: psum completes the mean
            grads = jax.lax.psum(grads, DATA_AXIS)
            stats = jax.tree_util.tree_map(lambda x: jax.lax.psum(x, DATA_AXIS), stats)
        return grads, stats

    def _step_fn(self, T: int):
        """The unjitted PPO minibatch update (shard_map'd over the data mesh
        when one is active): called under its own jit by _build_step, and
        inside the fused lax.scan by update_device_scan."""

        def local_step(params, optim_state, sample, valid, clip_param):
            grads, stats = self._grads_and_stats(params, sample, valid, clip_param, T)
            updates, optim_state = self.optimizer.update(grads, optim_state, params)
            params = optax.apply_updates(params, updates)
            return params, optim_state, stats

        if self.mesh is None:
            return local_step

        return shard_map(
            local_step,
            mesh=self.mesh,
            in_specs=(P(), P(), self._sample_spec(), P(DATA_AXIS), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )

    def _sample_spec(self):
        """PartitionSpecs for a rollout sample: the env axis of the minibatch
        is sharded over the DATA mesh axis — obs/actions/etc are [T, n, ...]
        (axis 1), hidden0/valid are [n, ...] (axis 0); params/opt state
        replicated; grads psum'd inside the mapped fn."""
        return (
            P(None, DATA_AXIS),  # obs dict leaves
            P(DATA_AXIS),  # hidden0
            P(None, DATA_AXIS),  # actions
            P(None, DATA_AXIS),  # prev_actions
            P(None, DATA_AXIS),  # value_preds
            P(None, DATA_AXIS),  # returns
            P(None, DATA_AXIS),  # masks
            P(None, DATA_AXIS),  # old_log_probs
            P(None, DATA_AXIS),  # adv_targ
        )

    def _build_step(self, T: int, n: int):
        from vlnce_tpu.parallel.distributed import align_collective_step

        return align_collective_step(
            jax.jit(self._step_fn(T), donate_argnums=(0, 1)), f"wddppo_step_T{T}n{n}"
        )

    def _build_grads(self, T: int):
        """Jitted grads-only entry (no optimizer apply), sharded like the
        update step; used by the cross-topology parity tests."""
        if self.mesh is None:
            return jax.jit(
                lambda params, sample, valid, clip_param: self._grads_and_stats(
                    params, sample, valid, clip_param, T
                )
            )
        mapped = shard_map(
            lambda params, sample, valid, clip_param: self._grads_and_stats(
                params, sample, valid, clip_param, T
            ),
            mesh=self.mesh,
            in_specs=(P(), self._sample_spec(), P(DATA_AXIS), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        from vlnce_tpu.parallel.distributed import align_collective_step

        return align_collective_step(jax.jit(mapped), f"wddppo_grads_T{T}")

    # -------------------------------------------------------------- padding
    def _pad_sample(self, dev_sample, n: int):
        """Pad the minibatch env axis up to a multiple of the PER-PROCESS
        shard count (instead of silently falling back to single-device);
        returns the padded sample and the validity mask [n_padded]. Under
        multi-process JAX each process pads its local shard so the stitched
        global env axis divides the full data axis."""
        shards = self.mesh.shape[DATA_AXIS] if self.mesh is not None else 1
        nproc = jax.process_count()
        if nproc > 1:
            assert shards % nproc == 0, (
                f"data axis {shards} not divisible by {nproc} processes"
            )
            shards //= nproc
        target = -(-n // shards) * shards
        valid = jnp.ones((target,), jnp.float32).at[n:].set(0.0) if target != n else jnp.ones((n,), jnp.float32)
        if target == n:
            return dev_sample, valid
        pad_n = target - n

        def pad_axis1(a):
            width = [(0, 0)] * a.ndim
            width[1] = (0, pad_n)
            return jnp.pad(a, width)

        obs, hidden0, actions, prev_actions, value_preds, returns, masks, old_lp, adv = dev_sample
        hidden0 = jnp.pad(hidden0, [(0, pad_n)] + [(0, 0)] * (hidden0.ndim - 1))
        return (
            {k: pad_axis1(v) for k, v in obs.items()},
            hidden0,
            {k: pad_axis1(v) for k, v in actions.items()},
            {k: pad_axis1(v) for k, v in prev_actions.items()},
            pad_axis1(value_preds), pad_axis1(returns), pad_axis1(masks),
            pad_axis1(old_lp), pad_axis1(adv),
        ), valid

    def _globalize_sample(self, dev_sample, valid):
        """Multi-process entry into the sharded PPO step: stitch each
        process's local minibatch shard into globally-sharded arrays (each
        rank minibatches its OWN rollouts, exactly like reference DD-PPO
        ranks feeding DDP, ddppo_waypoint_trainer.py:310-370). T is the
        static rollout length, so only the env axis needs stitching."""
        if jax.process_count() == 1 or self.mesh is None:
            return dev_sample, valid
        from jax.sharding import NamedSharding

        nproc = jax.process_count()
        env_axis1 = NamedSharding(self.mesh, P(None, DATA_AXIS))
        env_axis0 = NamedSharding(self.mesh, P(DATA_AXIS))

        def g(x, axis, sharding):
            x = np.asarray(x)
            gshape = list(x.shape)
            gshape[axis] *= nproc
            return jax.make_array_from_process_local_data(sharding, x, tuple(gshape))

        obs, hidden0, actions, prev_actions, value_preds, returns, masks, old_lp, adv = dev_sample
        sample = (
            {k: g(v, 1, env_axis1) for k, v in obs.items()},
            g(hidden0, 0, env_axis0),
            {k: g(v, 1, env_axis1) for k, v in actions.items()},
            {k: g(v, 1, env_axis1) for k, v in prev_actions.items()},
            g(value_preds, 1, env_axis1), g(returns, 1, env_axis1),
            g(masks, 1, env_axis1), g(old_lp, 1, env_axis1),
            g(adv, 1, env_axis1),
        )
        return sample, g(valid, 0, env_axis0)

    # --------------------------------------------------- update (device batch)
    def _minibatch_plan(self, batch: Dict, rng: np.random.RandomState, update_idx: int):
        """Everything update_device and update_device_scan must agree on —
        the clip-decay value, the per-call obs_shapes contract, the
        env-count validation, and the [K, envs_per_batch] minibatch index
        matrix (ppo_epoch permutation rounds of num_mini_batch slices).
        ONE implementation, so the fused-scan path can never silently
        diverge from the per-minibatch loop on composition."""
        clip_param = self.cfg.clip_param
        if getattr(self.cfg, "use_linear_clip_decay", False) and self.num_updates:
            clip_param *= max(0.0, 1.0 - update_idx / float(self.num_updates))

        # per-call, never sticky: a later update() over full-shape host obs
        # must not inherit a device batch's flattened-obs reshape map
        obs_shapes = batch.get("obs_shapes")
        self._obs_shapes = dict(obs_shapes) if obs_shapes is not None else None

        T, N = batch["value_preds"].shape[:2]
        if N < self.cfg.num_mini_batch:
            raise ValueError(
                f"num_envs ({N}) must be >= RL.PPO.num_mini_batch "
                f"({self.cfg.num_mini_batch}) — same constraint as the host "
                f"recurrent generator"
            )
        envs_per_batch = N // self.cfg.num_mini_batch
        rows = []
        for _ in range(self.cfg.ppo_epoch):
            perm = rng.permutation(N)
            for start in range(0, envs_per_batch * self.cfg.num_mini_batch, envs_per_batch):
                rows.append(perm[start : start + envs_per_batch])
        return T, envs_per_batch, np.asarray(rows, np.int32), clip_param

    def update_device(self, batch: Dict, rng: np.random.RandomState, update_idx: int = 0):
        """PPO update over a DEVICE-resident rollout batch (from
        DeviceRolloutCollector.collect_device): minibatch env selection is a
        device gather, so the big obs/returns tensors never visit the host.
        Same minibatch semantics and the same compiled per-(T, n) step as
        update() — only the indexing medium differs."""
        T, envs_per_batch, idx_rows, clip_param = self._minibatch_plan(
            batch, rng, update_idx
        )
        clip_param = jnp.asarray(clip_param, jnp.float32)
        all_stats = []
        for idx_row in idx_rows:
            idx = jnp.asarray(idx_row)
            n = int(idx.shape[0])
            take1 = lambda v: jnp.take(v, idx, axis=1)
            dev_sample = (
                {k: take1(v) for k, v in batch["obs"].items()},
                jnp.take(batch["hidden0"], idx, axis=0),
                {k: take1(v) for k, v in batch["actions"].items()},
                {k: take1(v) for k, v in batch["prev_actions"].items()},
                take1(batch["value_preds"]),
                take1(batch["returns"]),
                take1(batch["masks"]),
                take1(batch["old_log_probs"]),
                take1(batch["advantages"]),
            )
            dev_sample, valid = self._pad_sample(dev_sample, n)
            dev_sample, valid = self._globalize_sample(dev_sample, valid)
            n_padded = int(valid.shape[0])
            key = (T, n_padded, tuple(sorted((self._obs_shapes or {}).items())))
            if key not in self._step_cache:
                self._step_cache[key] = self._build_step(T, n_padded)
            self.policy.params, self.optim_state, stats = self._step_cache[key](
                self.policy.params, self.optim_state, dev_sample, valid, clip_param
            )
            all_stats.append(stats)

        # ONE batched readback for all minibatch stats (per-call readbacks pay
        # full relay latency on remote-attached chips)
        all_stats = jax.device_get(all_stats)
        n_updates = max(len(all_stats), 1)
        return {
            k: sum(float(s[k]) for s in all_stats) / n_updates
            for k in ("value_loss", "action_loss", "entropy_loss", "pano_entropy", "offset_entropy", "distance_entropy")
        }

    def update_device_scan(self, batch: Dict, rng: np.random.RandomState, update_idx: int = 0):
        """All ppo_epoch x num_mini_batch minibatch updates as ONE jitted
        lax.scan (TPU.PPO_UPDATE_SCAN): per scan step, the minibatch gather
        (device takes over the resident rollout batch), env padding, and the
        production PPO step (the same shard_map closure on a mesh) fuse —
        zero host dispatches between minibatches and one stats readback per
        update call, vs ~10 eager takes + 1 dispatch per minibatch in
        update_device (each a relay round trip on a remote-attached chip).

        Minibatch composition is IDENTICAL to update_device: the same
        rng.permutation stream, host-generated into a [K, n] index matrix
        that ships with the dispatch. Single-process only (per-rank batches
        cannot stitch inside a scan)."""
        assert jax.process_count() == 1, (
            "TPU.PPO_UPDATE_SCAN is single-process; use update_device on pods"
        )
        T, envs_per_batch, idxs, clip_param = self._minibatch_plan(
            batch, rng, update_idx
        )

        key = ("scan", T, envs_per_batch, int(idxs.shape[0]),
               tuple(sorted((self._obs_shapes or {}).items())))
        if key not in self._step_cache:
            step = self._step_fn(T)
            n_mb = envs_per_batch

            def scan_update(params, optim_state, obs, hidden0, actions,
                            prev_actions, value_preds, returns, masks,
                            old_lp, adv, idx_rows, clip):
                def body(carry, idx):
                    params, optim_state = carry
                    take1 = lambda v: jnp.take(v, idx, axis=1)
                    dev_sample = (
                        {k: take1(v) for k, v in obs.items()},
                        jnp.take(hidden0, idx, axis=0),
                        {k: take1(v) for k, v in actions.items()},
                        {k: take1(v) for k, v in prev_actions.items()},
                        take1(value_preds), take1(returns), take1(masks),
                        take1(old_lp), take1(adv),
                    )
                    dev_sample, valid = self._pad_sample(dev_sample, n_mb)
                    params, optim_state, stats = step(
                        params, optim_state, dev_sample, valid, clip
                    )
                    return (params, optim_state), stats

                (params, optim_state), stats = jax.lax.scan(
                    body, (params, optim_state), idx_rows
                )
                return params, optim_state, stats

            from vlnce_tpu.parallel.distributed import align_collective_step

            self._step_cache[key] = align_collective_step(
                jax.jit(scan_update, donate_argnums=(0, 1)), "wddppo_scan_update"
            )

        self.policy.params, self.optim_state, stats = self._step_cache[key](
            self.policy.params, self.optim_state,
            batch["obs"], batch["hidden0"], batch["actions"],
            batch["prev_actions"], batch["value_preds"], batch["returns"],
            batch["masks"], batch["old_log_probs"], batch["advantages"],
            idxs, np.float32(clip_param),
        )
        stats = jax.device_get(stats)  # leaves [K]: one readback total
        return {
            k: float(np.mean(np.asarray(stats[k])))
            for k in ("value_loss", "action_loss", "entropy_loss", "pano_entropy", "offset_entropy", "distance_entropy")
        }

    # ------------------------------------------------------------------ update
    def update(self, rollouts, rng: np.random.RandomState, update_idx: int = 0):
        # host rollouts carry full-shape obs: clear any reshape map a prior
        # update_device() left behind (cross-mode contamination hazard)
        self._obs_shapes = None
        # linear clip decay (reference use_linear_clip_decay semantics)
        clip_param = self.cfg.clip_param
        if getattr(self.cfg, "use_linear_clip_decay", False) and self.num_updates:
            clip_param *= max(0.0, 1.0 - update_idx / float(self.num_updates))
        clip_param = jnp.asarray(clip_param, jnp.float32)
        advantages = self.get_advantages(rollouts)
        agg = {k: 0.0 for k in ("value_loss", "action_loss", "entropy_loss", "pano_entropy", "offset_entropy", "distance_entropy")}

        num_updates = 0
        for _ in range(self.cfg.ppo_epoch):
            for sample in rollouts.recurrent_generator(advantages, self.cfg.num_mini_batch, rng):
                (*tensors, T, n) = sample
                obs, hidden0, actions, prev_actions, value_preds, returns, masks, old_lp, adv = tensors
                dev_sample = (
                    {k: jnp.asarray(v) for k, v in obs.items()},
                    jnp.asarray(hidden0),
                    {k: jnp.asarray(v) for k, v in actions.items()},
                    {k: jnp.asarray(v) for k, v in prev_actions.items()},
                    jnp.asarray(value_preds),
                    jnp.asarray(returns),
                    jnp.asarray(masks),
                    jnp.asarray(old_lp),
                    jnp.asarray(adv),
                )
                dev_sample, valid = self._pad_sample(dev_sample, n)
                dev_sample, valid = self._globalize_sample(dev_sample, valid)
                n_padded = int(valid.shape[0])
                key = (T, n_padded, tuple(sorted((self._obs_shapes or {}).items())))
                if key not in self._step_cache:
                    self._step_cache[key] = self._build_step(T, n_padded)
                self.policy.params, self.optim_state, stats = self._step_cache[key](
                    self.policy.params, self.optim_state, dev_sample, valid, clip_param
                )
                for k in agg:
                    agg[k] += float(stats[k])
                num_updates += 1

        return {k: v / max(num_updates, 1) for k, v in agg.items()}
