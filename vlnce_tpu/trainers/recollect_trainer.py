"""Teacher-forcing trainer via trajectory re-simulation (RxR baseline).

Parity with reference vlnce_baselines/recollect_trainer.py:28-219: no disk
cache — GT trajectories are re-rendered by the sim pool each epoch; gradient
accumulation via effective_batch_size; full-state (optimizer/epoch/step)
checkpoints for requeue.

TPU notes: the IL update is the same jitted program as DAgger's; gradient
accumulation keeps the grad pytree on device and applies the Adam update
every `accumulation` micro-batches.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import tqdm

from vlnce_tpu.registry import registry
from vlnce_tpu.data.recollection import TeacherRecollectionDataset
from vlnce_tpu.models.aux_losses import reduce_aux_losses
from vlnce_tpu.ops.obs_transforms import apply_obs_transforms_batch
from vlnce_tpu.trainers.base_trainer import BaseVLNCETrainer
from vlnce_tpu.utils.logging import logger
from vlnce_tpu.utils.tensorboard import TensorboardWriter


@registry.register_trainer(name="recollect_trainer")
class RecollectTrainer(BaseVLNCETrainer):
    def __init__(self, config):
        super().__init__(config)
        self._step_cache: Dict[Tuple[int, int, bool], any] = {}

    def _build_accum_step(self, T: int, N: int, apply: bool):
        module = self.policy.module
        optimizer = self.optimizer
        num_layers = self.policy.num_recurrent_layers
        hidden = self.policy.hidden_size

        def loss_fn(params, observations, prev_actions, masks, corrected, weights):
            rnn_states = jnp.zeros((N, num_layers, hidden), jnp.float32)
            logits, _, aux = module.apply(
                {"params": params}, observations, rnn_states, prev_actions, masks, seq_len=T
            )
            logits = logits.reshape(T, N, -1)
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(log_probs, corrected[..., None], axis=-1).squeeze(-1)
            action_loss = jnp.mean(jnp.sum(weights * nll, axis=0) / jnp.maximum(jnp.sum(weights, axis=0), 1e-8))
            aux_mask = (weights > 0).reshape(-1).astype(jnp.float32)
            aux_loss = reduce_aux_losses(aux, aux_mask)
            return action_loss + aux_loss, (action_loss, aux_loss)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(params, optim_state, accum_grads, accum_scale, observations, prev_actions, masks, corrected, weights):
            (loss, (action_loss, aux_loss)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, observations, prev_actions, masks, corrected, weights
            )
            grads = jax.tree_util.tree_map(lambda a, g: a + g / accum_scale, accum_grads, grads)
            if apply:
                updates, optim_state = optimizer.update(grads, optim_state, params)
                params = optax.apply_updates(params, updates)
                grads = jax.tree_util.tree_map(jnp.zeros_like, grads)
            return params, optim_state, grads, loss, action_loss, aux_loss

        return step

    def train(self) -> None:
        config = self.config.defrost()
        config.TASK_CONFIG.ENVIRONMENT.ITERATOR_OPTIONS.MAX_SCENE_REPEAT_STEPS = -1
        config.IL.RECOLLECT_TRAINER.gt_path = config.IL.RECOLLECT_TRAINER.gt_file
        config.use_pbar = True
        config.freeze()
        self.config = config

        dataset = TeacherRecollectionDataset(config)
        self.obs_transforms = dataset.obs_transforms
        self._initialize_policy(
            config,
            load_from_ckpt=config.IL.load_from_ckpt,
            observation_space=dataset.observation_space,
            action_space=dataset.action_space,
        )

        effective = config.IL.RECOLLECT_TRAINER.effective_batch_size
        accumulation = 1
        if effective > 0:
            assert effective % config.IL.batch_size == 0
            accumulation = effective // config.IL.batch_size

        accum_grads = jax.tree_util.tree_map(jnp.zeros_like, self.policy.params)
        os.makedirs(config.CHECKPOINT_FOLDER, exist_ok=True)
        batches_per_epoch = int(np.ceil(dataset.length / dataset.batch_size))

        with TensorboardWriter(config.TENSORBOARD_DIR, purge_step=0) as writer:
            for epoch in range(self.start_epoch, config.IL.epochs):
                t_epoch = time.time()
                losses = []
                for batch_idx, batch in enumerate(
                    tqdm.tqdm(dataset.batches(batches_per_epoch), total=batches_per_epoch,
                              desc=f"epoch {epoch}", dynamic_ncols=True)
                ):
                    observations, prev_actions, masks, corrected, weights = batch
                    T, N = corrected.shape
                    apply = accumulation == 1 or (batch_idx + 1) % accumulation == 0
                    key = (T, N, apply)
                    if key not in self._step_cache:
                        self._step_cache[key] = self._build_accum_step(T, N, apply)
                    obs_dev = apply_obs_transforms_batch(
                        {k: jnp.asarray(v) for k, v in observations.items()}, self.obs_transforms
                    )
                    (
                        self.policy.params, self.optim_state, accum_grads,
                        loss, action_loss, aux_loss,
                    ) = self._step_cache[key](
                        self.policy.params, self.optim_state, accum_grads, float(accumulation),
                        obs_dev, jnp.asarray(prev_actions), jnp.asarray(masks),
                        jnp.asarray(corrected), jnp.asarray(weights),
                    )
                    losses.append(float(loss))
                    writer.add_scalar("train_loss", float(loss), self.step_id)
                    writer.add_scalar("train_action_loss", float(action_loss), self.step_id)
                    writer.add_scalar("train_aux_loss", float(aux_loss), self.step_id)
                    self.step_id += 1

                logger.info(
                    f"[recollect epoch {epoch}] mean_loss={np.mean(losses):.4f} took {time.time() - t_epoch:.1f}s"
                )
                self.save_checkpoint(
                    f"ckpt.{epoch}.ckpt",
                    extra_state={"epoch": epoch, "step_id": self.step_id},
                )
        dataset.close_sims()
