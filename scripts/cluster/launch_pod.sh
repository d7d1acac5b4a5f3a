#!/bin/bash
# Launch a training sweep on every host of a TPU pod slice — the analog
# of the reference's SLURM sbatch sweeps (scripts/utils/baselines_scripts/
# run.sh: algs x games x seeds fire-and-forget onto gypsum).
#
# On Cloud TPU the scheduler is `gcloud ... ssh --worker=all`: the same
# command runs on every host, jax.distributed discovers peers from the
# TPU metadata (no coordinator flags needed on TPU VMs), and each process
# owns its local chips + a disjoint env-seed block
# (toybox_tpu.parallel.mesh.process_seed_offset).
#
# Usage:
#   TPU_NAME=my-pod ZONE=us-central2-b bash scripts/cluster/launch_pod.sh \
#     [--alg=ppo] [--env=BreakoutToyboxNoFrameskip-v4] [extra run.py args]
set -euo pipefail

TPU_NAME=${TPU_NAME:?set TPU_NAME to the tpu-vm/pod name}
ZONE=${ZONE:?set ZONE}
VENV=${VENV:-"\$HOME/toybox-tpu-venv"}
REPO=${REPO:-"\$HOME/toybox_tpu"}
OUT=${OUT:-runs/pod}

ARGS=${*:-"--alg=ppo --env=BreakoutToyboxNoFrameskip-v4 --num_timesteps=1e7"}

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone="$ZONE" --worker=all \
  --command="source $VENV/bin/activate && cd $REPO && \
    TOYBOX_LOG_FORMAT=csv,stdout nohup python -m toybox_tpu.run $ARGS \
      --multi_host --log_path=$OUT/\$(hostname) \
      > $OUT/\$(hostname).log 2>&1 &"

echo "launched '$ARGS' on all workers of $TPU_NAME"
echo "collect results with scripts/cron/sync_results.sh"
