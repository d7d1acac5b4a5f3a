"""Opt-in multi-process jax.distributed smoke test (VERDICT item 8).

Runs scripts/distributed_smoke.py: two CPU worker processes joined via
jax.distributed + a single-process reference, asserting the globally
psum-reduced metrics are identical. Opt-in because it spawns three JAX
processes on this box's single core (~2 min):

    TOYBOX_TPU_DISTRIBUTED=1 python -m pytest tests/test_distributed.py -q
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.environ.get("TOYBOX_TPU_DISTRIBUTED"),
                    reason="opt-in: set TOYBOX_TPU_DISTRIBUTED=1 "
                           "(spawns 3 JAX processes)")
def test_two_process_metrics_match_single():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "distributed_smoke.py"),
         "--steps", "96"],
        cwd=REPO, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["ok"] is True
    assert result["distributed"] == result["single_process"]
