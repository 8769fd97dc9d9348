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

import os
import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import tqdm

from vlnce_tpu.registry import registry
from vlnce_tpu.data.recollection import TeacherRecollectionDataset
from vlnce_tpu.ops.obs_transforms import apply_obs_transforms_batch
from vlnce_tpu.trainers.base_trainer import BaseVLNCETrainer
from vlnce_tpu.utils.logging import logger
from vlnce_tpu.utils.tensorboard import TensorboardWriter


@registry.register_trainer(name="recollect_trainer")
class RecollectTrainer(BaseVLNCETrainer):
    def __init__(self, config):
        super().__init__(config)
        self._step_cache: Dict = {}  # apply-flag (host path) or (apply, "resident")

    def _build_accum_step(self, apply: bool, obs_shapes=None):
        """Shared IL accumulation step (parallel/il_step.py): sharded over the
        env/batch axis when a data-parallel mesh is active. obs_shapes:
        in-jit unflatten map for resident batches whose obs arrive
        wire-flattened [T, N, F] (device_recollect render emit)."""
        from vlnce_tpu.parallel.il_step import build_il_accum_step

        return build_il_accum_step(
            self.policy.module, self.optimizer,
            self.policy.num_recurrent_layers, self.policy.hidden_size,
            apply=apply, mesh=self.mesh, obs_shapes=obs_shapes,
        )

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
                # live re-simulation runs in a background thread, overlapping
                # sim stepping with the jitted update (IL.prefetch_batches;
                # the analog of the reference's DataLoader worker,
                # recollect_trainer.py:86)
                from vlnce_tpu.data.prefetch import PrefetchIterator

                batches = PrefetchIterator(
                    dataset.batches(batches_per_epoch), depth=config.IL.prefetch_batches
                )
                for batch_idx, batch in enumerate(
                    tqdm.tqdm(batches, total=batches_per_epoch,
                              desc=f"epoch {epoch}", dynamic_ncols=True)
                ):
                    observations, prev_actions, masks, corrected, weights = batch
                    T, N = corrected.shape
                    apply = accumulation == 1 or (batch_idx + 1) % accumulation == 0
                    if dataset.resident:
                        # device-rendered batch, already time-major with
                        # transforms applied inside the render scan; obs
                        # leaves are wire-flattened [T, N, F] and unflatten
                        # INSIDE the jitted step (no per-leaf eager reshape
                        # dispatches, no tile-padded [T*N, H, W, C] buffers)
                        step_key = (apply, "resident")
                        if step_key not in self._step_cache:
                            self._step_cache[step_key] = self._build_accum_step(
                                apply, obs_shapes=dataset.obs_shapes
                            )
                        dev_batch = (
                            observations,
                            jnp.asarray(prev_actions),
                            jnp.asarray(masks),
                            jnp.asarray(corrected),
                            jnp.asarray(weights),
                        )
                    else:
                        step_key = apply
                        if step_key not in self._step_cache:
                            self._step_cache[step_key] = self._build_accum_step(apply)
                        obs_dev = apply_obs_transforms_batch(
                            {k: jnp.asarray(v) for k, v in observations.items()}, self.obs_transforms
                        )
                        dev_batch = (
                            {k: v.reshape((T, N) + v.shape[1:]) for k, v in obs_dev.items()},
                            jnp.asarray(prev_actions).reshape(T, N),
                            jnp.asarray(masks).reshape(T, N),
                            jnp.asarray(corrected),
                            jnp.asarray(weights),
                        )
                    if self.mesh is not None:
                        from vlnce_tpu.parallel.il_step import prepare_global_batch

                        dev_batch = prepare_global_batch(self.mesh, *dev_batch)
                    (
                        self.policy.params, self.optim_state, accum_grads,
                        loss, action_loss, aux_loss,
                    ) = self._step_cache[step_key](
                        self.policy.params, self.optim_state, accum_grads, float(accumulation),
                        *dev_batch,
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
        # join any in-flight async checkpoint write before returning
        from vlnce_tpu.utils.checkpoints import wait_for_pending

        wait_for_pending()
