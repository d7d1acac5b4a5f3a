#!/bin/bash
# Cron-able results sync — the analog of the reference's
# scripts/cron/copy_files.sh (rsync of experiment output from the compute
# cluster's scratch space to long-term storage).
#
# Pulls runs/ (Monitor CSVs, logger output, checkpoints, saved models)
# from every worker of a TPU pod to a local collection directory, or —
# with DEST set to a gs:// URL — pushes the local runs/ to GCS.
#
# Usage:
#   */30 * * * *  TPU_NAME=my-pod ZONE=us-central2-b \
#                 bash scripts/cron/sync_results.sh [subdir]
#   DEST=gs://bucket/toybox-runs bash scripts/cron/sync_results.sh
set -euo pipefail

SUBDIR=${1:-}
SRC=${SRC:-"runs/$SUBDIR"}
DEST=${DEST:-"results/$SUBDIR"}

if [[ "$DEST" == gs://* ]]; then
  echo "Pushing $SRC -> $DEST..."
  gsutil -m rsync -r "$SRC" "$DEST"
  exit 0
fi

TPU_NAME=${TPU_NAME:?set TPU_NAME (or DEST=gs://... for a local push)}
ZONE=${ZONE:?set ZONE}
mkdir -p "$DEST"
echo "Pulling $SRC from all workers of $TPU_NAME -> $DEST..."
gcloud compute tpus tpu-vm scp --zone="$ZONE" --worker=all --recurse \
  "$TPU_NAME:$SRC" "$DEST/"
