#!/bin/bash
#SBATCH --job-name=waypoint_train
#SBATCH --output=logs/%x.out
#SBATCH --error=logs/%x.err
#SBATCH --nodes 8
#SBATCH --ntasks-per-node 1
#SBATCH --cpus-per-task 96
#SBATCH --time=72:00:00
#SBATCH --signal=USR1@600
#SBATCH --open-mode=append

# ----------------------------------------------------------------------------
# Distributed waypoint DD-PPO training on a multi-host TPU slice.
#
# Topology (TPU analog of the reference's 64-GPU NCCL job,
# sbatch_scripts/waypoint_train.sh): ONE process per host. Each host drives
# its local simulator pool on CPU cores; jax.distributed joins the hosts so
# the data-parallel mesh spans every chip in the slice over ICI/DCN.
# run.py calls vlnce_tpu.parallel.distributed.init_distributed, which reads
# SLURM_JOB_NODELIST / SLURM_PROCID automatically — no torch.distributed,
# no NCCL. SIGUSR1 600 s before the time limit triggers the requeue path
# (interrupted-state save + resume, same protocol as the reference).
# ----------------------------------------------------------------------------

printenv | grep -E "SLURM|TPU" | sort
set -x
srun -u \
python -u run.py \
    --exp-config vlnce_tpu/config/experiments/r2r_waypoint/2-wpn-dc.yaml \
    --run-type train \
    TPU.MESH.DATA -1
