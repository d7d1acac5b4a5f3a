#!/bin/bash
# Per-host environment bootstrap for TPU VMs — the analog of the
# reference's gypsum.sh (module loads + virtualenv + pinned pip installs
# for a CUDA/SLURM cluster). On a TPU pod every host runs this once; it
# is idempotent.
#
# Usage: bash scripts/cluster/setup_host.sh [venv_dir]
set -euo pipefail

VENV=${1:-"$HOME/toybox-tpu-venv"}

if [ ! -d "$VENV" ]; then
  python3 -m venv "$VENV"
fi
# shellcheck disable=SC1091
source "$VENV/bin/activate"

# jax[tpu] pulls libtpu pinned to the jax release; everything else is the
# training-stack surface (flax/optax for RL, pygame only for human_play).
pip install --upgrade pip
pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
pip install flax optax chex einops numpy pytest pygame pillow

# install the framework itself (editable so sweeps track the checkout)
pip install -e "$(cd "$(dirname "$0")/../.." && pwd)"

python - <<'EOF'
import jax
print("devices:", jax.devices())
print("process", jax.process_index(), "of", jax.process_count())
EOF
