"""Training CLI — reference baselines/run.py surface:

    python -m toybox_tpu.run --alg=ppo --env=BreakoutToyboxNoFrameskip-v4 \
        --num_timesteps=1e6 [--num_envs=64] [--save_path=...] [--play]

Maps the reference's env-id convention onto the batched device envs
(game name extracted from <Game>ToyboxNoFrameskip-v4), resolves per-alg
defaults (reference run.py:158-170), passes --key=value extras through to
learn() (run.py:172-179), and supports --play rollouts after training
(run.py:211-246).
"""

from __future__ import annotations

import argparse
import ast
import re
import sys

GAME_IDS = {
    "breakout": "breakout",
    "amidar": "amidar",
    "spaceinvaders": "space_invaders",
    "space_invaders": "space_invaders",
    "gridworld": "gridworld",
}

ALG_DEFAULTS = {
    # reference ppo2/defaults.py:13-20
    "ppo": dict(nsteps=128, nminibatches=4, lam=0.95, gamma=0.99,
                noptepochs=4, ent_coef=0.01, lr=2.5e-4, cliprange=0.1,
                network="cnn"),
    "ppo2": "ppo",
    # reference a2c defaults
    "a2c": dict(nsteps=5, gamma=0.99, ent_coef=0.01, lr=7e-4,
                network="cnn"),
    # reference deepq/defaults.py:1-17
    "deepq": dict(network="conv_only", lr=1e-4, buffer_size=10000,
                  exploration_fraction=0.1, exploration_final_eps=0.01,
                  train_freq=4, learning_starts=10000, target_network_update_freq=1000,
                  gamma=0.99, prioritized_replay=True, dueling=True),
    "dqn": "deepq",
    # reference trpo_mpi atari defaults use cnn_small
    "trpo": dict(network="cnn_small", nsteps=512, max_kl=0.001,
                 cg_iters=10, cg_damping=0.1, vf_stepsize=3e-4, vf_iters=3),
    "trpo_mpi": "trpo",
    # reference acer defaults (acer/acer.py learn signature)
    "acer": dict(network="cnn_small", nsteps=20, lr=7e-4, q_coef=0.5,
                 ent_coef=0.01, replay_ratio=4, c=10.0, delta=1.0),
    # reference acktr defaults (acktr/acktr_disc.py)
    "acktr": dict(nsteps=20, lr=0.25, ent_coef=0.01, vf_coef=0.5,
                  kfac_clip=0.001),
    # reference ppo1/run_atari.py pposgd defaults
    "ppo1": dict(timesteps_per_actorbatch=256, clip_param=0.2,
                 entcoeff=0.01, optim_epochs=4, optim_stepsize=1e-3,
                 optim_batchsize=64, gamma=0.99, lam=0.95,
                 schedule="linear", network="cnn"),
    # reference gail defaults (TRPO generator; --load_path doubles as
    # the expert model to roll transitions from)
    "gail": dict(network="cnn_small", nsteps=32, generator="trpo",
                 bc_epochs=0),
}


def env_id_to_game(env_id: str) -> str:
    m = re.match(r"([A-Za-z]+?)(Toybox)?(NoFrameskip|Deterministic)?-v\d+",
                 env_id)
    name = (m.group(1) if m else env_id).lower()
    if name in GAME_IDS:
        return GAME_IDS[name]
    raise ValueError(f"unknown env id {env_id!r}")


def common_arg_parser():
    parser = argparse.ArgumentParser(
        description="toybox_tpu RL trainer (baselines.run surface)")
    parser.add_argument("--env", type=str,
                        default="BreakoutToyboxNoFrameskip-v4")
    parser.add_argument("--alg", type=str, default="ppo")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num_timesteps", type=float, default=1e6)
    parser.add_argument("--num_envs", "--num_env", dest="num_envs",
                        type=int, default=64)
    parser.add_argument("--network", type=str, default=None)
    parser.add_argument("--save_path", type=str, default=None)
    parser.add_argument("--load_path", type=str, default=None)
    parser.add_argument("--log_path", type=str, default=None)
    parser.add_argument("--play", action="store_true", default=False)
    parser.add_argument(
        "--multi_host", action="store_true", default=False,
        help="multi-host pod run: jax.distributed.initialize() process "
             "discovery, per-process env-seed blocks, rank-0-only logging "
             "(replaces the reference's mpi_fork/rank plumbing, "
             "run.py:186-191 + cmd_util.py:28-33)")
    return parser


def parse_cmdline_kwargs(args):
    """--key=value passthrough, values parsed as python literals
    (reference run.py:172-179)."""
    def parse(v):
        try:
            return ast.literal_eval(v)
        except (ValueError, SyntaxError):
            return v
    out = {}
    for a in args:
        assert a.startswith("--") and "=" in a, f"bad extra arg {a!r}"
        k, v = a[2:].split("=", 1)
        out[k] = parse(v)
    return out


def get_learn_function(alg):
    spec = ALG_DEFAULTS.get(alg)
    if isinstance(spec, str):
        alg = spec
    if alg in ("ppo", "ppo2"):
        from toybox_tpu.rl.ppo import learn
        return learn, dict(ALG_DEFAULTS["ppo"])
    if alg == "a2c":
        from toybox_tpu.rl.a2c import learn
        return learn, dict(ALG_DEFAULTS["a2c"])
    if alg in ("deepq", "dqn"):
        from toybox_tpu.rl.dqn import learn
        return learn, dict(ALG_DEFAULTS["deepq"])
    if alg in ("trpo", "trpo_mpi"):
        from toybox_tpu.rl.trpo import learn
        return learn, dict(ALG_DEFAULTS["trpo"])
    if alg == "acer":
        from toybox_tpu.rl.acer import learn
        return learn, dict(ALG_DEFAULTS["acer"])
    if alg == "acktr":
        from toybox_tpu.rl.acktr import learn
        return learn, dict(ALG_DEFAULTS["acktr"])
    if alg == "ppo1":
        from toybox_tpu.rl.ppo1 import learn
        return learn, dict(ALG_DEFAULTS["ppo1"])
    if alg == "gail":
        from toybox_tpu.rl.gail import learn
        return learn, dict(ALG_DEFAULTS["gail"])
    if alg in ("her", "ddpg"):
        raise ValueError(
            f"{alg} needs a goal/continuous-action env, not an ALE game "
            f"(same as the reference); use toybox_tpu.rl.{alg}.learn "
            f"directly")
    raise ValueError(f"unknown alg {alg!r}")


def train(args, extra_kwargs):
    seed = args.seed
    rank0 = True
    if args.multi_host:
        # initialize BEFORE importing toybox_tpu: the game modules build
        # jnp constants at import time, which would initialize the XLA
        # backend and make jax.distributed.initialize impossible.
        import jax

        jax.distributed.initialize()   # auto-discovery on TPU VMs
        from toybox_tpu.parallel.mesh import process_seed_offset

        seed = process_seed_offset(seed, args.num_envs)
        rank0 = jax.process_index() == 0

    from toybox_tpu.utils import logger as tb_logger

    game = env_id_to_game(args.env)
    learn, kwargs = get_learn_function(args.alg)
    kwargs.update(extra_kwargs)
    if args.network:
        kwargs["network"] = args.network

    # --weights=[w_toybox, w_ale] mixed-env sampling (reference
    # run.py:73-74,124-125: popped from alg kwargs, routed to env
    # construction). Toybox-only weights are the identity; true mixing
    # needs the ALE twin (SampleEnvs in envs/wrappers.py), which the
    # device-resident training path cannot step — and ale_py is not
    # vendored here. Fail loudly instead of silently ignoring.
    weights = kwargs.pop("weights", None)
    if weights and any(float(w) > 0 for w in list(weights)[1:]):
        raise NotImplementedError(
            "--weights mixing with the ALE twin needs gym-path envs: "
            "build them with toybox_tpu.envs.vec_env.make_vec_env("
            f"{args.env!r}, sample_weights={list(weights)!r}) "
            "(requires ale_py for the complement env); the jitted "
            "device training path steps Toybox engines only")

    # rank-0-only logging (reference run.py:186-191)
    lg = tb_logger.configure(dir=args.log_path if rank0 else None,
                             format_strs=None if rank0 else [])
    state = learn(game=game, num_envs=args.num_envs,
                  total_timesteps=int(args.num_timesteps), seed=seed,
                  save_path=args.save_path if rank0 else None,
                  load_path=args.load_path,
                  logger=tb_logger, **kwargs)
    return state, lg


def play(args, state, n_envs=8, max_chunks=40, chunk=64):
    """Eval rollouts on the batched env (reference run.py:211-246 --play).

    Steps are batched into jitted chunks (a per-step loop over a remote
    device is round-trip-latency-bound); episode returns print as
    episodes finish anywhere in the batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from toybox_tpu.envs.pipeline import make_rl_env
    from toybox_tpu.rl.policies import (RECURRENT_NETWORKS,
                                        build_eval_policy,
                                        build_recurrent_eval_policy)

    game = env_id_to_game(args.env)
    env = make_rl_env(game, n_envs, episodic_life=False, clip_rewards=False)
    _, kwargs = get_learn_function(args.alg)
    network = args.network or kwargs.get("network", "cnn")
    recurrent = network in RECURRENT_NETWORKS
    if recurrent:
        _, p_step, carry_init = build_recurrent_eval_policy(
            env.obs_shape, env.num_actions, network, alg=args.alg)
    else:
        _, p_step = build_eval_policy(args.alg, env.obs_shape,
                                      env.num_actions, network)
    params = state.params

    @jax.jit
    def run_chunk(st, totals, key, hcarry, prev_done):
        def body(carry, _):
            st, totals, key, hcarry, prev_done = carry
            key, akey = jax.random.split(key)
            if recurrent:
                actions, _, _, hcarry = p_step(params, st.frames, akey,
                                               hcarry, prev_done)
            else:
                actions, _, _, _ = p_step(params, st.frames, akey)
            st, _, _, done, info = env.step(st, actions)
            totals = totals + info["raw_reward"]
            finished = jnp.where(done, totals, jnp.nan)
            totals = jnp.where(done, 0.0, totals)
            return (st, totals, key, hcarry, done), finished

        (st, totals, key, hcarry, prev_done), finished = jax.lax.scan(
            body, (st, totals, key, hcarry, prev_done), None, length=chunk)
        return st, totals, key, hcarry, prev_done, finished

    st, _ = jax.jit(env.reset)(jnp.arange(n_envs, dtype=jnp.uint32))
    totals = jnp.zeros(n_envs)
    key = jax.random.PRNGKey(0)
    hcarry = carry_init(n_envs) if recurrent else jnp.zeros(n_envs)
    prev_done = jnp.zeros(n_envs, bool)
    for _ in range(max_chunks):
        st, totals, key, hcarry, prev_done, finished = run_chunk(
            st, totals, key, hcarry, prev_done)
        for r in np.asarray(finished)[~np.isnan(np.asarray(finished))]:
            print(f"episode_rew={float(r)}")


def main(argv=None):
    parser = common_arg_parser()
    args, unknown = parser.parse_known_args(argv)
    extra = parse_cmdline_kwargs(unknown)
    state, lg = train(args, extra)
    if args.play:
        play(args, state)
    return state


if __name__ == "__main__":
    main()
