"""Two-process ``jax.distributed`` smoke test (VERDICT round 1, item 8).

The reference scales across hosts by re-exec'ing MPI ranks and giving
each rank a disjoint env-seed block (reference
baselines/baselines/common/cmd_util.py:28-33, common/mpi_fork); the
TPU-native replacement is ``jax.distributed.initialize`` process
discovery + per-process seed ranges (``mesh.process_seed_offset``) with
global metrics reduced by XLA collectives. This script proves that path
end-to-end on ONE machine with two CPU processes:

  * launcher mode (default):   picks a free port, spawns 2 worker
    subprocesses + 1 single-process reference subprocess, and asserts
    the globally-reduced return/score sums are identical.
  * worker mode (--worker):    joins the coordinator, steps its local
    shard of envs with a deterministic per-global-env action schedule,
    all-gathers the per-process sums, prints one JSON line.

Exact equality holds because envs are independent and each process owns
the seed block ``base + process_id*envs_per_process`` — the distributed
run partitions exactly the env set the single-process run steps.

Run:  python scripts/distributed_smoke.py            (~2 min on 1 CPU)
CI:   opt-in via TOYBOX_TPU_DISTRIBUTED=1 (tests/test_distributed.py).
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

# runnable as `python scripts/distributed_smoke.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SEED = 1000


def run_worker(coordinator, num_processes, process_id, game,
               envs_per_process, steps):
    import jax

    jax.config.update("jax_platforms", "cpu")
    # initialize BEFORE importing toybox_tpu: the game modules build jnp
    # constants at import time, which would initialize the XLA backend
    # and make jax.distributed.initialize impossible
    if num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)

    import jax.numpy as jnp

    from toybox_tpu.envs.batched import make_batched_env
    from toybox_tpu.parallel.mesh import process_seed_offset

    # auto_reset=False: the auto-reset reseed hash mixes in num_envs, so
    # partitioned and unpartitioned runs would diverge after an episode
    # boundary; without it the env sets are exactly equal by construction
    fns = make_batched_env(game, envs_per_process, obs_mode="none",
                           auto_reset=False)
    seed0 = process_seed_offset(BASE_SEED, envs_per_process)
    seeds = jnp.arange(seed0, seed0 + envs_per_process, dtype=jnp.uint32)
    # global env ids make the action schedule identical no matter how the
    # env set is partitioned across processes
    global_ids = jnp.arange(envs_per_process) + (seed0 - BASE_SEED)

    def rollout(state):
        def body(carry, t):
            state, rew_sum, score_sum = carry
            actions = (t * 7 + global_ids) % fns.num_actions
            state, _, rew, done, info = fns.step(state,
                                                 actions.astype(jnp.int32))
            return (state, rew_sum + rew.sum(),
                    score_sum + jnp.asarray(info["score"]).sum()), None

        init = (state, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32))
        (state, rew_sum, score_sum), _ = jax.lax.scan(
            body, init, jnp.arange(steps))
        return rew_sum, score_sum

    state, _ = jax.jit(fns.reset)(seeds)
    rew_sum, score_sum = jax.jit(rollout)(state)

    # the sync_from_root/mpi_moments analog: reduce local sums globally
    from jax.experimental import multihost_utils

    local = jnp.asarray([float(rew_sum), float(score_sum)])
    gathered = multihost_utils.process_allgather(local)
    global_rew, global_score = [float(x) for x in gathered.sum(axis=0)]
    print(json.dumps({
        "process_id": process_id,
        "num_processes": num_processes,
        "local_envs": envs_per_process,
        "global_reward_sum": round(global_rew, 4),
        "global_score_sum": round(global_score, 4),
    }), flush=True)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(args, extra):
    cmd = [sys.executable, os.path.abspath(__file__), "--worker"] + extra + [
        "--game", args.game, "--steps", str(args.steps)]
    env = dict(os.environ)
    # The axon sitecustomize registers the remote-TPU PJRT plugin at
    # interpreter start, which initializes an XLA backend before
    # jax.distributed.initialize can run; workers are CPU-only, so
    # disarm it and pin the CPU platform.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # drop any inherited virtual-device multiplier (pytest's conftest sets
    # 8): each worker only needs its one CPU device, and 3 processes x 8
    # device thread pools on one core is a flake risk
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    return subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env,
                            cwd=os.path.dirname(os.path.dirname(
                                os.path.abspath(__file__))))


def run_launcher(args):
    port = _free_port()
    coord = f"localhost:{port}"
    epp = args.envs // 2
    workers = [
        _spawn(args, ["--coordinator", coord, "--num_processes", "2",
                      "--process_id", str(i),
                      "--envs_per_process", str(epp)])
        for i in range(2)
    ]
    outs = []
    for w in workers:
        out, _ = w.communicate(timeout=900)
        assert w.returncode == 0, f"worker failed: {out}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert outs[0]["global_reward_sum"] == outs[1]["global_reward_sum"]
    assert outs[0]["global_score_sum"] == outs[1]["global_score_sum"]

    ref = _spawn(args, ["--num_processes", "1", "--process_id", "0",
                        "--envs_per_process", str(args.envs)])
    out, _ = ref.communicate(timeout=900)
    assert ref.returncode == 0, f"reference failed: {out}"
    single = json.loads(out.strip().splitlines()[-1])

    ok = (single["global_reward_sum"] == outs[0]["global_reward_sum"]
          and single["global_score_sum"] == outs[0]["global_score_sum"])
    print(json.dumps({
        "test": "distributed_smoke", "game": args.game,
        "envs": args.envs, "steps": args.steps,
        "distributed": {k: outs[0][k] for k in
                        ("global_reward_sum", "global_score_sum")},
        "single_process": {k: single[k] for k in
                           ("global_reward_sum", "global_score_sum")},
        "ok": ok,
    }))
    if not ok:
        raise SystemExit("distributed != single-process metrics")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num_processes", type=int, default=2)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--game", default="breakout")
    p.add_argument("--envs", type=int, default=8)
    p.add_argument("--envs_per_process", type=int, default=4)
    p.add_argument("--steps", type=int, default=128)
    args = p.parse_args()
    if args.worker:
        run_worker(args.coordinator, args.num_processes, args.process_id,
                   args.game, args.envs_per_process, args.steps)
    else:
        run_launcher(args)


if __name__ == "__main__":
    main()
