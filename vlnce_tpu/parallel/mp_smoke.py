"""Multi-process training smoke: the PRODUCTION DaggerTrainer update across
2 JAX processes.

The reference trains DD-PPO across 8 SLURM nodes (reference
ddppo_waypoint_trainer.py:310-370, sbatch_scripts/waypoint_train.sh); the
TPU analog is one JAX process per host feeding its local data shard into a
global-mesh shard_map step. This module proves the pod path on one machine:
two subprocesses x 4 virtual CPU devices rendezvous via jax.distributed,
each supplies its HALF of a deterministic IL batch to
DaggerTrainer._update_agent (which routes through
parallel/il_step.py:prepare_global_batch -> make_array_from_process_local_data),
and the resulting loss must equal the single-process 8-device run on the
full batch.

Used by tests/test_multiprocess_train.py and by __graft_entry__'s
dryrun_multichip 2-process mode.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from typing import List, Optional, Tuple

import numpy as np

# deterministic tiny workload: T x N_GLOBAL batch, env axis split across
# processes; N_GLOBAL deliberately NOT divisible by the 8-wide data axis so
# padding is exercised on both topologies
T_STEPS = 4
N_GLOBAL = 6
IMG = 32
INSTR = 64


def _cfg_and_space():
    from gymnasium import spaces

    from vlnce_tpu.config import get_config

    cfg = get_config(
        opts=[
            "MODEL.DEPTH_ENCODER.backbone", "resnet18",
            "MODEL.RGB_ENCODER.cnn_type", "TorchVisionResNet18",
            "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False,
            "MODEL.INSTRUCTION_ENCODER.bidirectional", True,
            "MODEL.PROGRESS_MONITOR.use", True,
        ]
    )
    space = spaces.Dict(
        {
            "rgb": spaces.Box(0, 255, (IMG, IMG, 3), np.uint8),
            "depth": spaces.Box(0, 1, (IMG, IMG, 1), np.float32),
            "instruction": spaces.Box(0, 10000, (INSTR,), np.int32),
            "progress": spaces.Box(0, 1, (1,), np.float32),
        }
    )
    return cfg, space


def _global_batch():
    """The full deterministic [T, N_GLOBAL] batch (identical in every
    process and in the single-process reference run)."""
    rng = np.random.RandomState(7)
    obs = {
        "rgb": rng.randint(0, 255, (T_STEPS, N_GLOBAL, IMG, IMG, 3)).astype(np.uint8),
        "depth": rng.rand(T_STEPS, N_GLOBAL, IMG, IMG, 1).astype(np.float32),
        "instruction": np.zeros((T_STEPS, N_GLOBAL, INSTR), np.int32),
        "progress": rng.rand(T_STEPS, N_GLOBAL, 1).astype(np.float32),
    }
    obs["instruction"][:, :, :6] = rng.randint(1, 50, (6,))
    prev = rng.randint(0, 4, (T_STEPS, N_GLOBAL)).astype(np.int64)
    masks = np.ones((T_STEPS, N_GLOBAL), np.float32)
    masks[0] = 0.0
    corrected = rng.randint(0, 4, (T_STEPS, N_GLOBAL)).astype(np.int64)
    weights = rng.rand(T_STEPS, N_GLOBAL).astype(np.float32) + 0.5
    return obs, prev, masks, corrected, weights


def run_update(
    env_lo: int, env_hi: int, expect_devices: Optional[int] = None,
) -> Tuple[float, float, float]:
    """Build the production trainer and run _update_agent on the env slice
    [env_lo, env_hi) of the deterministic global batch. With
    jax.process_count() > 1 each process passes its own slice; single-process
    callers pass the full range. `expect_devices` asserts the trainer's
    auto-resolved mesh spans exactly that many devices (dryrun guard)."""
    from gymnasium import spaces

    from vlnce_tpu.trainers.dagger_trainer import DaggerTrainer

    cfg, space = _cfg_and_space()
    trainer = DaggerTrainer(cfg)
    trainer._initialize_policy(
        cfg, load_from_ckpt=False,
        observation_space=space, action_space=spaces.Discrete(4),
    )
    if expect_devices is not None:
        assert trainer.mesh is not None and trainer.mesh.devices.size == expect_devices, (
            f"expected an auto mesh over {expect_devices} devices, got {trainer.mesh}"
        )
    obs, prev, masks, corrected, weights = _global_batch()
    sl = slice(env_lo, env_hi)
    n = env_hi - env_lo
    obs_flat = {
        k: v[:, sl].reshape((T_STEPS * n,) + v.shape[2:]) for k, v in obs.items()
    }
    return trainer._update_agent(
        obs_flat,
        prev[:, sl].reshape(-1, 1),
        masks[:, sl].reshape(-1, 1),
        corrected[:, sl],
        weights[:, sl],
    )


def _enable_nonzero_rank_cache_writes() -> None:
    """Let every rank persist its compile-cache entries, not just rank 0.

    jax hardcodes "only process 0 writes persistent-cache entries"
    (jax._src.compiler._cache_write) to avoid write contention on shared
    network filesystems like GCS. In this 2-process-on-one-host smoke
    topology the cache dir is a local disk and the ranks' cache keys
    DIFFER (the accelerator_config entry hashes each rank's local device
    topology), so the stock rule means rank 1 recompiles every collective
    program cold on EVERY launch while rank 0 idles at the paired
    collective — measured as the dominant wall-clock of every 2-process
    test (~50-115 s per launch, repeat runs included). The write guard
    reads jax._src.distributed.global_state.process_id at call time; lie
    about it for the duration of the write only. Private-API use is
    exception-guarded: on any jax-internals change the workers keep the
    stock (slow but correct) behavior.
    """
    try:
        from jax._src import compiler as _compiler
        from jax._src import distributed as _distributed

        orig = _compiler._cache_write

        def patched(*args, **kwargs):
            state = _distributed.global_state
            real_pid = state.process_id
            try:
                state.process_id = 0
                return orig(*args, **kwargs)
            finally:
                state.process_id = real_pid

        _compiler._cache_write = patched
    except Exception:  # pragma: no cover - depends on jax internals
        pass


def worker_main() -> None:
    """Entry for the spawned rank processes (see launch_two_process)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from vlnce_tpu.parallel.distributed import init_distributed

    assert init_distributed(), "expected multi-process init from env"
    _enable_nonzero_rank_cache_writes()
    mode = os.environ.get("MP_SMOKE_MODE")
    if mode == "resident_dagger":
        _worker_resident_dagger()
        return
    if mode == "ppo":
        _worker_ppo()
        return
    if mode == "resident_recollect":
        _worker_resident_recollect()
        return
    if mode == "il_ppo":
        # combined mode (driver dryrun AND pytest): BOTH production updates
        # in one rank-pair launch, paying the subprocess imports and the
        # jax.distributed rendezvous once instead of twice
        _worker_il()
        _worker_ppo()
        return
    if mode == "resident_both":
        # combined mode for pytest: both resident full-train() pod smokes in
        # one rank-pair launch (same budget lever as il_ppo)
        _worker_resident_recollect()
        _worker_resident_dagger()
        return
    _worker_il()


def _worker_il() -> None:
    import time

    import jax

    nproc = jax.process_count()
    assert N_GLOBAL % nproc == 0
    per = N_GLOBAL // nproc
    pid = jax.process_index()
    t0 = time.perf_counter()
    loss, action_loss, aux_loss = run_update(pid * per, (pid + 1) * per)
    print(f"MP_TIME {pid} il {time.perf_counter() - t0:.1f}s", flush=True)
    print(f"MP_LOSS {pid} {loss!r} {action_loss!r} {aux_loss!r}", flush=True)


# ----------------------------------------------------------------- PPO mode
# deterministic waypoint rollout batch: same shape family as
# tests/test_multichip_parity's PPO parity test, env axis split over ranks
PPO_T = 2
PPO_N_GLOBAL = 6
PPO_PANOS = 12
PPO_IMG = 8


def _ppo_agent(mesh):
    """WaypointPolicy + WDDPPO at tiny shapes; ppo_epoch=1 x num_mini_batch=1
    so the multi-process update (each rank minibatching its OWN rollouts,
    stitched by _globalize_sample) composes the SAME global full-batch update
    as the single-process run — the only composition where cross-topology
    equality is well-defined."""
    from gymnasium import spaces

    from vlnce_tpu.config import get_config
    from vlnce_tpu.models.waypoint_policy import WaypointPolicy
    from vlnce_tpu.rl.ppo import WDDPPO

    space = spaces.Dict({
        "rgb": spaces.Box(0, 255, (PPO_PANOS, PPO_IMG, PPO_IMG, 3), np.uint8),
        "depth": spaces.Box(0, 1, (PPO_PANOS, PPO_IMG, PPO_IMG, 1), np.float32),
        "rgb_history": spaces.Box(0, 255, (PPO_IMG, PPO_IMG, 3), np.uint8),
        "depth_history": spaces.Box(0, 1, (PPO_IMG, PPO_IMG, 1), np.float32),
        "instruction": spaces.Box(0, 10000, (16,), np.int32),
        "angle_features": spaces.Box(-1, 1, (PPO_PANOS, 4), np.float32),
    })
    cfg = get_config(opts=[
        "MODEL.policy_name", "WaypointPolicy",
        "MODEL.DEPTH_ENCODER.backbone", "resnet18",
        "MODEL.RGB_ENCODER.cnn_type", "TorchVisionResNet18",
        "MODEL.RGB_ENCODER.output_size", 64,
        "MODEL.STATE_ENCODER.hidden_size", 64,
        "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False,
        "MODEL.INSTRUCTION_ENCODER.final_state_only", False,
        "MODEL.INSTRUCTION_ENCODER.bidirectional", True,
        "MODEL.INSTRUCTION_ENCODER.vocab_size", 32,
        "RL.PPO.ppo_epoch", 1,
        "RL.PPO.num_mini_batch", 1,
    ])
    import jax

    policy = WaypointPolicy.from_config(cfg, space)
    policy.init_params(jax.random.PRNGKey(0), batch_size=1)
    return WDDPPO(policy, cfg.RL.PPO, mesh=mesh, offset_regularize_coef=0.1146)


def _ppo_global_batch(agent):
    """The full deterministic device-resident rollout batch [PPO_T,
    PPO_N_GLOBAL] in the update_device layout (identical in every process)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(11)
    T, N, P_, img = PPO_T, PPO_N_GLOBAL, PPO_PANOS, PPO_IMG
    obs = {
        "rgb": jnp.asarray(rng.randint(0, 255, (T, N, P_, img, img, 3), dtype=np.uint8)),
        "depth": jnp.asarray(rng.rand(T, N, P_, img, img, 1).astype(np.float32)),
        "rgb_history": jnp.asarray(rng.randint(0, 255, (T, N, img, img, 3), dtype=np.uint8)),
        "depth_history": jnp.asarray(rng.rand(T, N, img, img, 1).astype(np.float32)),
        "instruction": jnp.asarray(rng.randint(1, 30, (T, N, 16), dtype=np.int32)),
        "angle_features": jnp.asarray(rng.rand(T, N, P_, 4).astype(np.float32)),
    }
    f = lambda lo, hi: jnp.asarray(rng.uniform(lo, hi, (T, N, 1)).astype(np.float32))
    return {
        "obs": obs,
        "hidden0": jnp.zeros(
            (N, agent.policy.num_recurrent_layers, agent.policy.hidden_size), jnp.float32
        ),
        "actions": {
            "pano": jnp.asarray(rng.randint(0, P_, (T, N, 1)).astype(np.float32)),
            "offset": f(-0.1, 0.1),
            "distance": f(0.3, 1.5),
        },
        "prev_actions": {
            "pano": jnp.zeros((T, N, 1), jnp.float32),
            "offset": jnp.zeros((T, N, 1), jnp.float32),
            "distance": jnp.zeros((T, N, 1), jnp.float32),
        },
        "value_preds": f(-0.5, 0.5),
        "returns": f(0.0, 1.5),
        "masks": jnp.ones((T, N, 1), jnp.float32),
        "old_log_probs": f(-4.0, -2.0),
        "advantages": f(-0.5, 0.8),
    }


def _host(x):
    """Read a replicated (out_specs P()) multi-process array: the first
    addressable shard IS the full value. np.asarray on a global array would
    instead start a cross-process Gloo fetch the other rank never joins ->
    deadlock."""
    if hasattr(x, "addressable_shards"):
        return np.asarray(x.addressable_shards[0].data)
    return np.asarray(x)


def run_ppo_update(env_lo: int, env_hi: int, grads_out: Optional[str] = None,
                   update: bool = True):
    """PPO cross-topology probe on the env slice [env_lo, env_hi): compute
    globally-reduced minibatch GRADIENTS through the production chain
    (_pad_sample -> _globalize_sample -> sharded _grads_and_stats), then run
    the production update_device. Returns the stats dict; when grads_out is
    given the (replicated) gradient leaves are saved there as npz — the
    machine-independent cross-topology comparison medium (VERDICT r3 #3).

    update=False (the dryrun's budget mode) skips update_device and returns
    the stats from the grads chain instead — the same _grads_and_stats math
    the update step runs (rl/ppo.py:_step_fn), minus the optimizer-apply
    compile. The 2-process update path itself stays covered by pytest
    (tests/test_multiprocess_train.py runs the combined il_ppo launch with
    ppo_grads_only=False, i.e. update=True)."""
    import jax
    import jax.numpy as jnp

    from vlnce_tpu.parallel.mesh import make_mesh

    agent = _ppo_agent(make_mesh())
    batch = _ppo_global_batch(agent)
    sl = slice(env_lo, env_hi)
    n = env_hi - env_lo
    local = {
        k: ({kk: vv[:, sl] for kk, vv in v.items()} if isinstance(v, dict)
            else (v[sl] if k == "hidden0" else v[:, sl]))
        for k, v in batch.items()
    }

    dev_sample = (
        local["obs"], local["hidden0"], local["actions"], local["prev_actions"],
        local["value_preds"], local["returns"], local["masks"],
        local["old_log_probs"], local["advantages"],
    )
    dev_sample, valid = agent._pad_sample(dev_sample, n)
    dev_sample, valid = agent._globalize_sample(dev_sample, valid)
    grads, gstats = agent._build_grads(PPO_T)(
        agent.policy.params, dev_sample, valid, jnp.float32(0.2)
    )
    if grads_out:
        leaves = [_host(x) for x in jax.tree_util.tree_leaves(grads)]
        np.savez(grads_out, *leaves)

    if not update:
        return {k: float(_host(v)) for k, v in gstats.items()}
    stats = agent.update_device(local, np.random.RandomState(3))
    return stats


def _worker_ppo() -> None:
    import json

    import jax

    pid = jax.process_index()
    nproc = jax.process_count()
    assert PPO_N_GLOBAL % nproc == 0
    per = PPO_N_GLOBAL // nproc
    out_dir = os.environ.get("MP_SMOKE_OUT")
    # BOTH ranks save (and therefore block on) the grads readback: the
    # psum'd grads execution is a paired cross-process collective, so a rank
    # that skipped the readback would run ahead into update_device's
    # minutes-long compile and starve the other rank's Gloo handshake past
    # its 30s deadline. Symmetric readback keeps the ranks in lockstep.
    grads_out = (
        os.path.join(out_dir, f"ppo_grads_mp_rank{pid}.npz") if out_dir else None
    )
    import time

    t0 = time.perf_counter()
    stats = run_ppo_update(
        pid * per, (pid + 1) * per, grads_out=grads_out,
        update=os.environ.get("MP_SMOKE_PPO_GRADS_ONLY") != "1",
    )
    print(f"MP_TIME {pid} ppo {time.perf_counter() - t0:.1f}s", flush=True)
    print(f"MP_PPO {pid} {json.dumps(stats)}", flush=True)


def launch_two_process_ppo(
    out_dir: str, local_devices: int = 4, timeout: float = 600.0,
    repo_root: Optional[str] = None,
) -> Tuple[List[dict], List[str]]:
    """Spawn 2 ranks, run the per-rank-rollouts -> _globalize_sample ->
    sharded WDDPPO update, and return (per-rank stats dicts, per-rank paths
    to the saved global-gradient npz files — replicated, so they must agree
    across ranks)."""
    import json

    outs = _launch_ranks(
        local_devices, timeout, repo_root,
        extra_env={"MP_SMOKE_MODE": "ppo", "MP_SMOKE_OUT": out_dir},
    )
    results: List[dict] = [None, None]  # type: ignore
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MP_PPO"):
                _, rank, payload = line.split(" ", 2)
                results[int(rank)] = json.loads(payload)
    assert all(r is not None for r in results), f"missing MP_PPO lines:\n{outs}"
    return results, [
        os.path.join(out_dir, f"ppo_grads_mp_rank{pid}.npz") for pid in range(2)
    ]


def launch_two_process_il_ppo(
    out_dir: str, local_devices: int = 4, timeout: float = 600.0,
    repo_root: Optional[str] = None, ppo_grads_only: bool = True,
) -> Tuple[List[Tuple[float, float, float]], List[dict], List[str]]:
    """ONE rank-pair launch running BOTH production updates (IL
    DaggerTrainer step, then the WDDPPO grads+update chain): the budget
    lever shared by the driver dryrun and pytest — subprocess
    interpreter+jax imports and the jax.distributed rendezvous are paid
    once instead of per-proof. Returns (per-rank IL (loss, action, aux),
    per-rank PPO stats dicts, per-rank gradient npz paths).

    ppo_grads_only=True (the dryrun default) skips the optimizer-apply
    compile and returns the grads-chain stats; pytest passes False so the
    full update_device stays 2-process-proven."""
    import json

    extra_env = {"MP_SMOKE_MODE": "il_ppo", "MP_SMOKE_OUT": out_dir}
    if ppo_grads_only:
        extra_env["MP_SMOKE_PPO_GRADS_ONLY"] = "1"
    outs = _launch_ranks(local_devices, timeout, repo_root, extra_env=extra_env)
    il: List[Tuple[float, float, float]] = [None, None]  # type: ignore
    ppo: List[dict] = [None, None]  # type: ignore
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MP_LOSS"):
                _, rank, l, a, x = line.split()
                il[int(rank)] = (float(l), float(a), float(x))
            elif line.startswith("MP_PPO"):
                _, rank, payload = line.split(" ", 2)
                ppo[int(rank)] = json.loads(payload)
    assert all(r is not None for r in il), f"missing MP_LOSS lines:\n{outs}"
    assert all(r is not None for r in ppo), f"missing MP_PPO lines:\n{outs}"
    return il, ppo, [
        os.path.join(out_dir, f"ppo_grads_mp_rank{pid}.npz") for pid in range(2)
    ]


# ---------------------------------------------------------- recollect mode
def tiny_resident_recollect_config(tmp: str, n_envs: int, n_episodes: int):
    """Minimal TPU.ON_DEVICE_RECOLLECT + RECOLLECT_RESIDENT config on the
    synthetic dataset. Shared by the pod smoke below and by
    __graft_entry__.dryrun_multichip's resident-recollect segment."""
    import vlnce_tpu.tasks  # noqa: F401
    import vlnce_tpu.models  # noqa: F401
    import vlnce_tpu.trainers  # noqa: F401
    from vlnce_tpu.config import get_config
    from vlnce_tpu.envs import ensure_registered
    from vlnce_tpu.envs import rl_envs  # noqa: F401

    ensure_registered()
    img = 16
    return get_config(opts=[
        "BASE_TASK_CONFIG_PATH", "vlnce_tpu/tasks/config/vlnce_task.yaml",
        "TASK_CONFIG.DATASET.TYPE", "Synthetic-VLN-v0",
        "TASK_CONFIG.DATASET.NUM_EPISODES", n_episodes,
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", 6,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", img,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", img,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", img,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", img,
        "NUM_ENVIRONMENTS", n_envs,
        "TENSORBOARD_DIR", "",
        "CHECKPOINT_FOLDER", f"{tmp}/ckpts",
        "MODEL.DEPTH_ENCODER.backbone", "resnet18",
        "MODEL.RGB_ENCODER.cnn_type", "TorchVisionResNet18",
        "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False,
        "MODEL.INSTRUCTION_ENCODER.vocab_size", 64,
        "IL.epochs", 1,
        "IL.batch_size", 2,
        "IL.RECOLLECT_TRAINER.trajectories_file", f"{tmp}/trajectories.json.gz",
        "IL.RECOLLECT_TRAINER.gt_file", f"{tmp}/missing_gt.json.gz",
        "IL.RECOLLECT_TRAINER.preload_size", 2,
        "TPU.ON_DEVICE_RECOLLECT", True,
        "TPU.RECOLLECT_RESIDENT", True,
    ])


def _worker_resident_recollect() -> None:
    """Pod smoke for resident recollection: each rank re-renders its strided
    episode shard on local devices (recollection.py initialize_device
    rank_slice — executed under REAL jax.process_count()==2, replacing the
    retired monkeypatched test) and the sharded accum update stitches the
    per-rank batches via prepare_global_batch. Prints the mean epoch loss
    and the rank's device-episode ids."""
    import tempfile

    import jax
    import numpy as np  # noqa: F811

    from vlnce_tpu.data.recollection import TeacherRecollectionDataset
    from vlnce_tpu.registry import registry

    pid = jax.process_index()
    with tempfile.TemporaryDirectory() as tmp:
        cfg = tiny_resident_recollect_config(tmp, n_envs=2, n_episodes=4)
        # each rank's strided shard (what train() below re-renders)
        ds = TeacherRecollectionDataset(cfg)
        ids = ",".join(ep.episode_id for ep in ds._device_episodes)
        ds.close_sims()

        trainer = registry.get_trainer("recollect_trainer")(cfg)
        losses = []
        orig = trainer._build_accum_step

        def wrapped(*a, _orig=orig, **kw):
            step = _orig(*a, **kw)

            def recording_step(*sa, **skw):
                out = step(*sa, **skw)
                losses.append(float(out[3]))
                return out

            return recording_step

        trainer._build_accum_step = wrapped
        trainer.train()
        print(f"MP_RECOLLECT {pid} {float(np.mean(losses))!r} {ids}", flush=True)


def launch_two_process_resident_recollect(
    local_devices: int = 4, timeout: float = 600.0,
    repo_root: Optional[str] = None,
) -> List[Tuple[float, List[str]]]:
    """Spawn 2 ranks, run a full resident-recollect train() each, and return
    per-rank (mean_epoch_loss, device_episode_ids)."""
    outs = _launch_ranks(
        local_devices, timeout, repo_root,
        extra_env={"MP_SMOKE_MODE": "resident_recollect"},
    )
    results: List[Tuple[float, List[str]]] = [None, None]  # type: ignore
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MP_RECOLLECT"):
                _, rank, loss, ids = line.split()
                results[int(rank)] = (float(loss), ids.split(","))
    assert all(r is not None for r in results), f"missing MP_RECOLLECT lines:\n{outs}"
    return results


def tiny_resident_dagger_config(tmp: str, n_envs: int, n_episodes: int):
    """Minimal TPU.DAGGER_RESIDENT config on the synthetic dataset (tiny
    shapes keep CPU compiles bounded). Shared by the pod smoke below and by
    __graft_entry__.dryrun_multichip's resident-DAgger segment."""
    import vlnce_tpu.tasks  # noqa: F401
    import vlnce_tpu.models  # noqa: F401
    import vlnce_tpu.trainers  # noqa: F401
    from vlnce_tpu.config import get_config
    from vlnce_tpu.envs import ensure_registered
    from vlnce_tpu.envs import rl_envs  # noqa: F401  (registers VLNCEDaggerEnv)

    ensure_registered()
    img = 16
    return get_config(opts=[
        "BASE_TASK_CONFIG_PATH", "vlnce_tpu/tasks/config/vlnce_task.yaml",
        "TASK_CONFIG.DATASET.TYPE", "Synthetic-VLN-v0",
        "TASK_CONFIG.DATASET.NUM_EPISODES", n_episodes,
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", 6,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", img,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", img,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", img,
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", img,
        "NUM_ENVIRONMENTS", n_envs,
        "TENSORBOARD_DIR", "",
        "CHECKPOINT_FOLDER", f"{tmp}/ckpts",
        "MODEL.DEPTH_ENCODER.backbone", "resnet18",
        "MODEL.RGB_ENCODER.cnn_type", "TorchVisionResNet18",
        "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False,
        "MODEL.INSTRUCTION_ENCODER.vocab_size", 64,
        "IL.epochs", 1,
        "IL.batch_size", 2,
        "IL.DAGGER.iterations", 1,
        "IL.DAGGER.update_size", n_episodes,
        "IL.DAGGER.p", 1.0,
        "IL.DAGGER.lmdb_features_dir", f"{tmp}/traj",
        "TPU.ON_DEVICE_DAGGER", True,
        "TPU.DAGGER_RESIDENT", True,
    ])


def _worker_resident_dagger() -> None:
    """Pod smoke for the fused resident DAgger pipeline: each rank collects
    its strided episode shard locally (DaggerTrainer._collection_plan rank
    split), banks it in HBM, and the sharded production update assembles
    global batches from the per-rank banks (prepare_global_batch). Prints
    the final loss and the rank's bank episode ids."""
    import tempfile

    import jax

    from vlnce_tpu.registry import registry

    pid = jax.process_index()
    with tempfile.TemporaryDirectory() as tmp:
        cfg = tiny_resident_dagger_config(tmp, n_envs=2, n_episodes=4)
        trainer = registry.get_trainer("dagger")(cfg)
        rec = []
        orig = trainer._update_agent

        def wrapped(*a, _orig=orig, **kw):
            out = _orig(*a, **kw)
            rec.append(out)
            return out

        trainer._update_agent = wrapped
        trainer.train()
        episodes, _ = trainer._collection_plan(1)
        ids = ",".join(ep.episode_id for ep in episodes)
        print(f"MP_RESIDENT {pid} {rec[-1][0]!r} {len(trainer._bank)} {ids}", flush=True)


def launch_two_process_resident_dagger(
    local_devices: int = 4, timeout: float = 600.0,
    repo_root: Optional[str] = None,
) -> List[Tuple[float, int, List[str]]]:
    """Spawn 2 ranks, run a full resident-DAgger train() each (rank-sliced
    collection, sharded global update), and return per-rank
    (final_loss, bank_episodes, episode_ids)."""
    outs = _launch_ranks(
        local_devices, timeout, repo_root, extra_env={"MP_SMOKE_MODE": "resident_dagger"}
    )
    results: List[Tuple[float, int, List[str]]] = [None, None]  # type: ignore
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MP_RESIDENT"):
                _, rank, loss, n_eps, ids = line.split()
                results[int(rank)] = (float(loss), int(n_eps), ids.split(","))
    assert all(r is not None for r in results), f"missing MP_RESIDENT lines:\n{outs}"
    return results


def launch_two_process_resident_both(
    local_devices: int = 4, timeout: float = 900.0,
    repo_root: Optional[str] = None,
) -> Tuple[List[Tuple[float, List[str]]], List[Tuple[float, int, List[str]]]]:
    """ONE rank-pair launch running BOTH resident full-train() pod smokes
    (recollect, then DAgger) — imports + rendezvous paid once. Returns
    (recollect per-rank results, dagger per-rank results) with the same
    shapes as the single-mode launchers."""
    outs = _launch_ranks(
        local_devices, timeout, repo_root, extra_env={"MP_SMOKE_MODE": "resident_both"}
    )
    recollect: List[Tuple[float, List[str]]] = [None, None]  # type: ignore
    dagger: List[Tuple[float, int, List[str]]] = [None, None]  # type: ignore
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MP_RECOLLECT"):
                _, rank, loss, ids = line.split()
                recollect[int(rank)] = (float(loss), ids.split(","))
            elif line.startswith("MP_RESIDENT"):
                _, rank, loss, n_eps, ids = line.split()
                dagger[int(rank)] = (float(loss), int(n_eps), ids.split(","))
    assert all(r is not None for r in recollect), f"missing MP_RECOLLECT lines:\n{outs}"
    assert all(r is not None for r in dagger), f"missing MP_RESIDENT lines:\n{outs}"
    return recollect, dagger


def _launch_ranks(
    local_devices: int, timeout: float, repo_root: Optional[str],
    extra_env: Optional[dict] = None,
) -> List[str]:
    """Spawn 2 rank subprocesses x `local_devices` virtual CPU devices each
    and return their combined stdout/stderr (raises on nonzero exit)."""
    port = _free_port()
    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # share the test suite's persistent XLA compile cache with the rank
    # subprocesses: without it every 2-process test pays full cold compiles
    # in BOTH workers, which alone pushed the slow tier past its budget
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(repo_root, "tests", ".jax_cache"),
    )
    # Compile-budget flag for the CPU smoke topology: backend opt level 0
    # cuts cold XLA:CPU compiles ~45% (measured 74 -> 40 s on the IL step).
    # The proofs compare across topologies at rtol 5e-4, far above the
    # ~3e-5 relative drift a different codegen level introduces; the SPMD
    # partitioning and Gloo collectives under test are unchanged. Override
    # with MP_SMOKE_XLA_OPT= (empty disables).
    opt_flag = os.environ.get("MP_SMOKE_XLA_OPT", "--xla_backend_optimization_level=0")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            XLA_FLAGS=(
                f"--xla_force_host_platform_device_count={local_devices} "
                + opt_flag
            ).strip(),
            JAX_PLATFORMS="cpu",
            COORDINATOR_ADDRESS=f"localhost:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
            PYTHONPATH=repo_root + os.pathsep + env.get("PYTHONPATH", ""),
            TF_CPP_MIN_LOG_LEVEL="3",
            JAX_COMPILATION_CACHE_DIR=cache_dir,
            JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.5",
            # both ranks share this host and cache_dir: rank 0 compiles each
            # aligned step alone at full core speed, rank 1 replays it from
            # the persistent cache (parallel/distributed.py leader protocol)
            VLNCE_COMPILE_LEADER="1",
        )
        env.update(extra_env or {})
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "vlnce_tpu.parallel.mp_smoke"],
                env=env, cwd=repo_root,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    outs = [p.communicate(timeout=timeout)[0].decode() for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(f"mp_smoke rank {pid} failed:\n{out}")
    return outs


def launch_two_process(
    local_devices: int = 4, timeout: float = 420.0,
    repo_root: Optional[str] = None,
) -> List[Tuple[float, float, float]]:
    """Spawn 2 ranks x `local_devices` virtual CPU devices each, run the
    sharded production update, and return each rank's (loss, action, aux)."""
    outs = _launch_ranks(local_devices, timeout, repo_root)
    results: List[Tuple[float, float, float]] = [None, None]  # type: ignore
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MP_LOSS"):
                _, rank, l, a, x = line.split()
                results[int(rank)] = (float(l), float(a), float(x))
    assert all(r is not None for r in results), f"missing MP_LOSS lines:\n{outs}"
    return results


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


if __name__ == "__main__":
    worker_main()
