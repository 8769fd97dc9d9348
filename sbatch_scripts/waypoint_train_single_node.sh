#!/bin/bash
#SBATCH --job-name=waypoint_train
#SBATCH --output=logs/%x.out
#SBATCH --error=logs/%x.err
#SBATCH --nodes 1
#SBATCH --ntasks-per-node 1
#SBATCH --cpus-per-task 96
#SBATCH --time=72:00:00
#SBATCH --signal=USR1@600
#SBATCH --open-mode=append

# Single-host variant: one process, all local chips form the data-parallel
# mesh (TPU.MESH.DATA=-1 auto), sims on the host CPUs.

set -x
srun -u \
python -u run.py \
    --exp-config vlnce_tpu/config/experiments/r2r_waypoint/2-wpn-dc.yaml \
    --run-type train \
    TPU.MESH.DATA -1
