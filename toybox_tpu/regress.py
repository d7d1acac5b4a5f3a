"""Behavioral regression gate — reference baselines/baselines/regress.py.

Loads a saved model, plays N games, and exits -1 if the average score is
below a threshold (the reference's CI gate: avg >= 50 over 10 games with a
per-game score cap of 500, regress.py:171-174,200-202).

    python -m toybox_tpu.regress --env=BreakoutToyboxNoFrameskip-v4 \
        --load_path=models/breakout.model [--games=10] [--threshold=50]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


SCORE_CAP = 500       # regress.py:173 early-done at score > 500
DEFAULT_THRESHOLD = 50
DEFAULT_GAMES = 10
MAX_FRAMES = 20_000   # per game safety cap


def play_games(game: str, params, network: str, n_games: int,
               score_cap: int = SCORE_CAP, seed: int = 0, chunk: int = 128,
               alg: str = "ppo"):
    """Play games with the trained policy on the batched env; one env per
    game for reference-equivalent (serial-episode) semantics. Stepping is
    batched into jitted scan chunks: a per-step host loop over a remote
    device pays the dispatch-latency floor thousands of times."""
    import jax
    import jax.numpy as jnp

    from toybox_tpu.envs.pipeline import make_rl_env
    from toybox_tpu.rl.policies import (RECURRENT_NETWORKS,
                                        build_eval_policy,
                                        build_recurrent_eval_policy)

    env = make_rl_env(game, n_games, episodic_life=False, clip_rewards=False)
    recurrent = network in RECURRENT_NETWORKS
    if recurrent:
        p_init, p_step, carry_init = build_recurrent_eval_policy(
            env.obs_shape, env.num_actions, network, alg=alg)
    else:
        p_init, p_step = build_eval_policy(alg, env.obs_shape,
                                           env.num_actions, network)
    if params is None:
        params = p_init(jax.random.PRNGKey(seed))

    @jax.jit
    def run_chunk(params, st, totals, finished, key, hcarry, prev_done):
        def body(carry, _):
            st, totals, finished, key, hcarry, prev_done = carry
            key, akey = jax.random.split(key)
            if recurrent:
                actions, _, _, hcarry = p_step(params, st.frames, akey,
                                               hcarry, prev_done)
            else:
                actions, _, _, _ = p_step(params, st.frames, akey)
            st, _, _, done, info = env.step(st, actions)
            totals = jnp.where(finished, totals, totals + info["raw_reward"])
            # early-done at the cap (regress.py:171-174) or game over
            finished = finished | done | (totals > score_cap)
            return (st, totals, finished, key, hcarry, done), None

        (st, totals, finished, key, hcarry, prev_done), _ = jax.lax.scan(
            body, (st, totals, finished, key, hcarry, prev_done), None,
            length=chunk)
        return st, totals, finished, key, hcarry, prev_done

    st, _ = jax.jit(env.reset)(
        jnp.arange(n_games, dtype=jnp.uint32) + jnp.uint32(seed))
    totals = jnp.zeros(n_games)
    finished = jnp.zeros(n_games, bool)
    key = jax.random.PRNGKey(seed)
    hcarry = carry_init(n_games) if recurrent else jnp.zeros(n_games)
    prev_done = jnp.zeros(n_games, bool)
    for _ in range(MAX_FRAMES // 4 // chunk):
        st, totals, finished, key, hcarry, prev_done = run_chunk(
            params, st, totals, finished, key, hcarry, prev_done)
        if bool(jax.device_get(finished).all()):
            break
    return np.asarray(jax.device_get(totals))


def main(argv=None):
    from toybox_tpu.run import env_id_to_game, get_learn_function

    parser = argparse.ArgumentParser()
    parser.add_argument("--env", type=str,
                        default="BreakoutToyboxNoFrameskip-v4")
    parser.add_argument("--alg", type=str, default="ppo")
    parser.add_argument("--load_path", type=str, default=None)
    parser.add_argument("--network", type=str, default=None)
    parser.add_argument("--games", type=int, default=DEFAULT_GAMES)
    parser.add_argument("--threshold", type=float, default=DEFAULT_THRESHOLD)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    game = env_id_to_game(args.env)
    _, defaults = get_learn_function(args.alg)
    network = args.network or defaults.get("network", "cnn")

    params = None
    if args.load_path:
        import jax

        from toybox_tpu.envs.pipeline import make_rl_env
        from toybox_tpu.rl.policies import (RECURRENT_NETWORKS,
                                            build_eval_policy,
                                            build_recurrent_eval_policy)
        from toybox_tpu.rl.ppo import load_params
        env = make_rl_env(game, 1)
        if network in RECURRENT_NETWORKS:
            p_init, _, _ = build_recurrent_eval_policy(
                env.obs_shape, env.num_actions, network, alg=args.alg)
        else:
            p_init, _ = build_eval_policy(args.alg, env.obs_shape,
                                          env.num_actions, network)
        template = p_init(jax.random.PRNGKey(0))
        params = load_params(args.load_path, template)

    scores = play_games(game, params, network, args.games, seed=args.seed,
                        alg=args.alg)
    avg = float(np.mean(scores))
    print(f"scores: {scores.tolist()}")
    print(f"average: {avg:.2f} (threshold {args.threshold})")
    if avg < args.threshold:
        print("REGRESSION: average score below threshold")
        sys.exit(-1)
    print("PASS")


if __name__ == "__main__":
    main()
