"""Two-process ``jax.distributed`` smoke test (VERDICT round 1, item 8;
train-step phase added round 5, VERDICT round 4 item 3).

The reference scales across hosts by re-exec'ing MPI ranks and giving
each rank a disjoint env-seed block (reference
baselines/baselines/common/cmd_util.py:28-33, common/mpi_fork); the
TPU-native replacement is ``jax.distributed.initialize`` process
discovery + per-process seed ranges (``mesh.process_seed_offset``) with
global metrics reduced by XLA collectives. This script proves that path
end-to-end on ONE machine with two CPU processes, in TWO phases:

  * env phase: 2 workers step disjoint env-seed shards with a
    deterministic per-global-env action schedule, all-gather the
    per-process sums, and the launcher asserts the globally-reduced
    return/score sums equal a single-process run of the same env set.
  * train phase (the ``MpiAdamOptimizer.comm.Allreduce`` analog,
    reference baselines/common/mpi_adam_optimizer.py:10-30): 2 workers
    form one GLOBAL 2-device mesh (1 CPU device each), shard the env/
    batch axis of a full PPO train step across the process boundary, and
    run one update — XLA's gradient all-reduce rides the distributed
    backend between the processes. The launcher asserts the resulting
    params are BIT-IDENTICAL (sha256 of the serialized tree) to the
    same mesh program run in a single process with 2 virtual devices.

Exact equality holds because the SPMD program is identical either way —
the only difference is which transport carries the all-reduce.

Run:  python scripts/distributed_smoke.py            (~3 min on 1 CPU)
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


def run_train_worker(coordinator, num_processes, process_id, game,
                     num_envs):
    """One full PPO train step over a GLOBAL mesh spanning the processes;
    prints the sha256 of the updated params. ``num_envs`` is the GLOBAL
    env count — every process traces the same SPMD program over the same
    global batch, each hosting only its devices' shards."""
    import hashlib

    import jax

    jax.config.update("jax_platforms", "cpu")
    if num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)

    import numpy as np
    from flax import serialization
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from toybox_tpu.envs.pipeline import make_rl_env
    from toybox_tpu.rl.ppo import make_ppo

    devices = jax.devices()
    assert len(devices) == 2, f"expected 2 global devices, got {devices}"
    mesh = Mesh(np.asarray(devices), ("env",))
    env_sh = NamedSharding(mesh, P("env"))
    repl = NamedSharding(mesh, P())

    env_fns = make_rl_env(game, num_envs, frame_size=84)
    init_fn, train_step, _ = make_ppo(env_fns, nsteps=4, nminibatches=2,
                                      noptepochs=2, network="cnn_small")

    # init_fn is deterministic, so every process computes the identical
    # full global state locally, then lifts each leaf into a global array
    # (the process only materializes its own devices' shards).
    state = init_fn(0)

    def lift(tree, sharding):
        def leaf(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx])
        return jax.tree_util.tree_map(leaf, tree)

    state = state.replace(
        env_state=lift(state.env_state, env_sh),
        params=lift(state.params, repl),
        opt_state=lift(state.opt_state, repl),
        key=lift(state.key, repl),
        update=lift(state.update, repl),
    )

    with mesh:
        state, metrics = jax.jit(train_step, donate_argnums=(0,))(state)
    jax.block_until_ready(state.params)

    # params come out replicated -> every process can read them whole
    params = jax.device_get(state.params)
    digest = hashlib.sha256(serialization.to_bytes(params)).hexdigest()
    print(json.dumps({
        "process_id": process_id,
        "num_processes": num_processes,
        "global_devices": len(devices),
        "params_sha256": digest,
        "loss": float(jax.device_get(metrics["policy_loss"])),
    }), flush=True)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(args, extra, virtual_devices=None):
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
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    if virtual_devices:  # single-process train reference: 2 local devices
        flags.append(
            f"--xla_force_host_platform_device_count={virtual_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
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

    # ---- train phase: cross-process gradient all-reduce bit-parity ----
    tport = _free_port()
    tcoord = f"localhost:{tport}"
    tworkers = [
        _spawn(args, ["--train", "--coordinator", tcoord,
                      "--num_processes", "2", "--process_id", str(i)])
        for i in range(2)
    ]
    touts = []
    for w in tworkers:
        out, _ = w.communicate(timeout=900)
        assert w.returncode == 0, f"train worker failed: {out}"
        touts.append(json.loads(out.strip().splitlines()[-1]))
    assert touts[0]["params_sha256"] == touts[1]["params_sha256"], (
        "replicated params diverged between the two processes")

    tref = _spawn(args, ["--train", "--num_processes", "1",
                         "--process_id", "0"], virtual_devices=2)
    out, _ = tref.communicate(timeout=900)
    assert tref.returncode == 0, f"train reference failed: {out}"
    tsingle = json.loads(out.strip().splitlines()[-1])

    train_ok = tsingle["params_sha256"] == touts[0]["params_sha256"]
    ok = ok and train_ok
    print(json.dumps({
        "test": "distributed_smoke", "game": args.game,
        "envs": args.envs, "steps": args.steps,
        "distributed": {k: outs[0][k] for k in
                        ("global_reward_sum", "global_score_sum")},
        "single_process": {k: single[k] for k in
                           ("global_reward_sum", "global_score_sum")},
        "train_params_sha256": {"distributed": touts[0]["params_sha256"],
                                "single_process": tsingle["params_sha256"]},
        "train_params_bit_identical": train_ok,
        "ok": ok,
    }))
    if not ok:
        raise SystemExit("distributed != single-process"
                         + ("" if train_ok else " (train-step params)"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--train", action="store_true")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num_processes", type=int, default=2)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--game", default="breakout")
    p.add_argument("--envs", type=int, default=8)
    p.add_argument("--envs_per_process", type=int, default=4)
    p.add_argument("--steps", type=int, default=128)
    args = p.parse_args()
    if args.worker and args.train:
        run_train_worker(args.coordinator, args.num_processes,
                         args.process_id, args.game, args.envs)
    elif args.worker:
        run_worker(args.coordinator, args.num_processes, args.process_id,
                   args.game, args.envs_per_process, args.steps)
    else:
        run_launcher(args)


if __name__ == "__main__":
    main()
